"""Structural holes: Burt's constraint (NetworkX parity).

Burt 2004 ("Structural holes and good ideas"): constraint measures how
much a vertex's connections are concentrated in a single closed
cluster — the sibling of effective size (operators/structure.py) on
the brokerage side of the web-graph social-structure toolkit.

Matches ``nx.constraint`` / ``nx.local_constraint`` exactly:

    p(u,v) = mw(u,v) / Σ_w mw(u,w)      (normalized mutual weight;
                                         w over ALL in+out neighbors)
    local_constraint(u,v) = (p(u,v) + Σ_w p(u,w)·p(w,v))²
    constraint(u) = Σ_{v ∈ N(u)} local_constraint(u,v); NaN if N(u)=∅

where mw(u,v) = A(u,v) + A(v,u) (edge weights summed both directions;
1 per direction when unweighted — so an undirected edge has mutual
weight 2, which the normalization cancels).

Plan (the scale story): the p table is the mutual-weight edge list
divided by a broadcast-joined per-vertex scale aggregate; the indirect
term Σ_w p(u,w)p(w,v) is ONE wedge self-join of p at the shared middle
vertex + one (u,v)-keyed partial aggregate — the link-prediction
exchange pattern, Σ deg² budget — then a semi-join keeps only actual
neighbor pairs and one final per-u aggregate collapses the squares.
No iteration, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _p_table(graph: LinkGraph, weight: str | None) -> DataFrame:
    """DataFrame(u, v, p): normalized mutual weights for every
    ordered neighbor pair (both directions present)."""
    if graph.directed:
        e = graph.edges
        if weight is not None and "weight" in e.columns:
            per = e.groupBy("src", "dst").agg(F.max("weight").alias("w"))
        else:
            per = e.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
        # mutual weight mw(u,v) = w(u,v) + w(v,u), keyed both ways
        both = per.unionByName(
            per.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        mw = both.groupBy("src", "dst").agg(F.sum("w").alias("mw"))
    else:
        sym = graph.symmetric_edges()
        if weight is not None and "weight" in sym.columns:
            per = sym.groupBy("src", "dst").agg(F.max("weight").alias("w"))
        else:
            per = sym.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
        # undirected: A(u,v) = A(v,u) = w -> mutual weight 2w
        mw = per.select("src", "dst", (F.col("w") * 2).alias("mw"))
    scale = mw.groupBy(F.col("src").alias("u")).agg(F.sum("mw").alias("scale"))
    return (
        mw.select(F.col("src").alias("u"), F.col("dst").alias("v"), "mw")
        .join(scale, "u")
        .select(
            "u",
            "v",
            F.when(F.col("scale") == 0, F.lit(0.0))
            .otherwise(F.col("mw") / F.col("scale"))
            .alias("p"),
        )
    )


def local_constraints(graph: LinkGraph, weight: str | None = None) -> DataFrame:
    """DataFrame(u, v, local_constraint double) for every ordered
    neighbor pair — ``nx.local_constraint`` over the whole graph."""
    p = _p_table(graph, weight).persist()
    indirect = (
        p.select(F.col("u"), F.col("v").alias("w"), F.col("p").alias("puw"))
        .join(
            p.select(F.col("u").alias("w"), F.col("v"), F.col("p").alias("pwv")),
            "w",
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.col("puw") * F.col("pwv")).alias("ind"))
    )
    out = (
        p.join(indirect, ["u", "v"], "left")
        .select(
            "u",
            "v",
            (
                (F.col("p") + F.coalesce("ind", F.lit(0.0)))
                * (F.col("p") + F.coalesce("ind", F.lit(0.0)))
            ).alias("local_constraint"),
        )
    )
    p.unpersist(blocking=False)
    return out


def constraint(graph: LinkGraph, weight: str | None = None) -> DataFrame:
    """``nx.constraint`` parity: DataFrame(vid, constraint double),
    NULL (nx: NaN) for vertices with no neighbors."""
    per_pair = local_constraints(graph, weight)
    agg = per_pair.groupBy(F.col("u").alias("vid")).agg(
        F.sum("local_constraint").alias("constraint")
    )
    return graph.vertices.select("vid").join(agg, "vid", "left")
