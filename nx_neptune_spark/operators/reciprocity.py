"""Reciprocity of a directed graph (NetworkX parity).

The reference's graph model is directed (Neptune/Gremlin edges;
nx_plugin dispatches DiGraph algorithms) but it exposes no measure of
link symmetry. Reciprocity — the fraction of directed edges whose
reverse also exists (Garlaschelli & Loffredo 2004, "Patterns of link
reciprocity in directed networks") — is THE standard one for web/link
graphs, so it extends the §2.9 directed-analysis surface.

Semantics match ``nx.reciprocity`` / ``nx.overall_reciprocity``:

    overall   = |{(u,v) ∈ E : (v,u) ∈ E}| / |E|
    per-node  = 2·|pred(u) ∩ succ(u)| / (|pred(u)| + |succ(u)|)
                (NaN -> None for isolated nodes, nx raises for them
                 in the single-node form; the adapter mirrors that)

computed on the deduplicated directed edge set with self-loops kept.
NetworkX's two forms treat self-loops INCONSISTENTLY and we match
each exactly: ``overall_reciprocity`` derives its numerator from
``2·(|E| − |undirected(E)|)``, under which a self-loop never
reciprocates (it collapses to one undirected edge), while the
per-node form puts u in both pred(u) and succ(u), under which it
always does.

Plan (the scale story): ONE self-left-semi-join of the deduplicated
edge table on (dst, src) = (src, dst) marks reciprocated rows; both
the scalar and the per-node form are then single map-side-combined
aggregates (per-node: explode each edge to its two endpoint
perspectives first — 2|E| rows, key-partitioned). No windows, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _marked_edges(graph: LinkGraph) -> DataFrame:
    """Deduplicated directed edges with a `recip` 0/1 flag."""
    e = graph.edges.select("src", "dst").distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(
        rev.withColumn("recip", F.lit(1)), ["src", "dst"], "left"
    ).select("src", "dst", F.coalesce("recip", F.lit(0)).alias("recip"))
    return marked


def overall_reciprocity(graph: LinkGraph) -> float:
    """``nx.overall_reciprocity``: reciprocated-edge fraction of the
    whole graph; raises ValueError on an empty graph (nx parity)."""
    row = _marked_edges(graph).agg(
        # numerator excludes self-loops (nx derives it from the
        # undirected collapse); denominator keeps them
        F.sum(
            F.when(F.col("src") != F.col("dst"), F.col("recip")).otherwise(0)
        ).alias("r"),
        F.count("*").alias("m"),
    ).first()
    if row["m"] == 0:
        raise ValueError("Not defined for empty graphs")
    return float(row["r"]) / float(row["m"])


def reciprocity(graph: LinkGraph) -> DataFrame:
    """Per-node reciprocity: DataFrame(vid long, reciprocity double),
    ``nx.reciprocity(G, nodes)`` arithmetic. Nodes with no edges get
    NULL (the adapter translates that to NetworkX's NaN/raise
    behavior)."""
    marked = _marked_edges(graph)
    # each edge contributes to both endpoints' (in+out) totals; its
    # recip flag contributes to both endpoints' overlap numerators
    persp = marked.select(F.col("src").alias("vid"), "recip").unionAll(
        marked.select(F.col("dst").alias("vid"), "recip")
    )
    per = persp.groupBy("vid").agg(
        F.sum("recip").alias("overlap2"),  # = 2·|pred ∩ succ| summed flags
        F.count("*").alias("total"),  # = |pred| + |succ| (dedup'd edges)
    )
    return graph.vertices.select("vid").join(per, "vid", "left").select(
        "vid",
        F.when(
            F.col("total").isNotNull(),
            F.col("overlap2").cast("double") / F.col("total").cast("double"),
        ).alias("reciprocity"),
    )
