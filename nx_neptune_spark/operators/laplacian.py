"""Laplacian centrality (NetworkX parity, undirected).

Qi et al. 2012 ("Laplacian centrality: A new centrality measure for
weighted networks"): the drop in Laplacian energy E = Σ L_ij² when a
vertex is removed. nx materializes the dense Laplacian and re-sums it
per vertex (O(V³)); expanding the energy difference gives the closed
form this module computes in ONE pass:

    cent(i) = d_i² + Σ_{j∈N(i)} ( w_ij² + 2·d_j·w_ij )
    E       = Σ_i d_i² + 2·Σ_{edges} w_ij²      (normalized divides)

with d = weighted degree (strength). Derivation: removing row/col i
deletes d_i² and the 2·Σ w_ij² off-diagonal terms and shrinks each
neighbor's diagonal from d_j² to (d_j − w_ij)². Agrees with
``nx.laplacian_centrality`` to float precision (differential-tested).

Digraphs raise: nx's directed form is the random-walk (PageRank)
Laplacian via scipy — a different object entirely.

Plan: one weighted-degree aggregate + ONE key-partitioned join tagging
each symmetric edge with its far-end degree + one per-vertex partial
aggregate; the normalization constant folds in as a broadcast 1-row
cross-join. No iteration, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def laplacian_centrality(
    graph: LinkGraph, normalized: bool = True, weight: str | None = "weight"
) -> DataFrame:
    """``nx.laplacian_centrality`` parity (undirected):
    DataFrame(vid, laplacian double). Raises on the null graph and,
    when ``normalized``, on edgeless graphs — exactly like nx."""
    if graph.directed:
        raise NotImplementedError(
            "directed laplacian centrality (random-walk Laplacian) is not "
            "implemented"
        )
    sym = graph.symmetric_edges()
    if weight is not None and "weight" in sym.columns:
        per = sym.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    else:
        per = sym.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    if graph.num_vertices() == 0:
        raise ValueError("null graph has no centrality defined")
    if per.isEmpty():
        if normalized:
            raise ZeroDivisionError("graph with no edges has zero full energy")
        return graph.vertices.select(
            "vid", F.lit(0.0).alias("laplacian")
        )
    deg = per.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("d"))
    # tag each symmetric edge with the far end's strength
    tagged = per.join(
        deg.select(F.col("vid").alias("dst"), F.col("d").alias("dj")), "dst"
    )
    nbr = tagged.groupBy(F.col("src").alias("vid")).agg(
        F.sum(
            F.col("w") * F.col("w") + F.lit(2.0) * F.col("dj") * F.col("w")
        ).alias("nsum")
    )
    cent = (
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .join(nbr, "vid", "left")
        .select(
            "vid",
            (
                F.coalesce(F.col("d") * F.col("d"), F.lit(0.0))
                + F.coalesce("nsum", F.lit(0.0))
            ).alias("laplacian"),
        )
    )
    if not normalized:
        return cent
    energy = deg.agg(
        (F.sum(F.col("d") * F.col("d"))).alias("dsq")
    ).crossJoin(per.agg(F.sum(F.col("w") * F.col("w")).alias("wsq"))).select(
        (F.col("dsq") + F.col("wsq")).alias("e")
    )
    return cent.crossJoin(energy).select(
        "vid", (F.col("laplacian") / F.col("e")).alias("laplacian")
    )
