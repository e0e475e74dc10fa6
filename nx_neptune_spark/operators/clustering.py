"""Clustering coefficients and transitivity (NetworkX parity).

The reference dispatches triangle COUNTING to Neptune Analytics
(/root/reference/nx_neptune/algorithms/cluster.py) but exposes neither
the per-vertex clustering coefficient nor global transitivity — the
two standard normalizations of that count (Watts & Strogatz 1998;
Newman 2003 "The structure and function of complex networks" §8.6).
This module completes the triangle surface:

    clustering(v)  = 2·T(v) / (d(v)·(d(v)−1))      (0 when d(v) < 2)
    transitivity   = 3·#triangles / #wedges,  #wedges = Σ_v C(d(v), 2)
    average_clustering = mean_v clustering(v)

over the undirected simple projection — the same convention the
triangle operator itself uses (operators/triangles.py), so T(v) and
d(v) come from one shared degree-oriented plan.

Plan (the scale story): per-vertex degrees are ONE map-side-combined
aggregate over the deduplicated undirected edge set; triangle counts
reuse the degree-oriented edge-iterator (out-degree bounded by
O(sqrt(m)) even on power-law graphs — the orientation IS the skew
handling). The join of the two V-row tables is key-partitioned; the
scalar reductions (transitivity, average) are single partial-agg
collapses of V-row frames. No driver-side state at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .triangles import triangle_count


def _simple_degrees(graph: LinkGraph) -> DataFrame:
    """DataFrame(vid, deg) over the undirected simple projection
    (self-loops dropped, duplicate/reverse edges collapsed) — the
    degree notion nx.clustering uses on a Graph."""
    und = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    return (
        und.select(F.col("a").alias("vid"))
        .unionAll(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )


def clustering(graph: LinkGraph) -> DataFrame:
    """Per-vertex clustering coefficient:
    DataFrame(vid long, clustering double), ``nx.clustering`` parity
    on the undirected simple projection (degree-<2 vertices -> 0.0,
    isolated vertices included via graph.vertices)."""
    tri = triangle_count(graph)
    deg = _simple_degrees(graph)
    joined = graph.vertices.select("vid").join(tri, "vid", "left").join(
        deg, "vid", "left"
    )
    d = F.coalesce(F.col("deg"), F.lit(0)).cast("double")
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("double")
    return joined.select(
        "vid",
        F.when(d >= 2, F.lit(2.0) * t / (d * (d - F.lit(1.0))))
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def clustering_stats(graph: LinkGraph) -> DataFrame:
    """Per-vertex (vid, triangles, deg, clustering) in one frame —
    the contract-query shape (per-key rows give the oracle a
    distributed-correctness check per vertex, not one scalar)."""
    tri = triangle_count(graph)
    deg = _simple_degrees(graph)
    joined = graph.vertices.select("vid").join(tri, "vid", "left").join(
        deg, "vid", "left"
    )
    d = F.coalesce(F.col("deg"), F.lit(0))
    t = F.coalesce(F.col("triangles"), F.lit(0))
    dd = d.cast("double")
    return joined.select(
        "vid",
        t.alias("triangles"),
        d.alias("deg"),
        F.when(d >= 2, F.lit(2.0) * t.cast("double") / (dd * (dd - F.lit(1.0))))
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def transitivity(graph: LinkGraph) -> float:
    """Global transitivity 3·T/#wedges (``nx.transitivity``); 0.0 for
    wedge-free graphs. One V-row aggregate after the shared plan."""
    row = (
        clustering_stats(graph)
        .agg(
            F.sum("triangles").alias("t3"),  # Σ per-vertex = 3·#triangles
            F.sum(
                (F.col("deg") * (F.col("deg") - F.lit(1)) / F.lit(2.0))
            ).alias("wedges"),
        )
        .first()
    )
    if row["wedges"] is None or row["wedges"] == 0:
        return 0.0
    return float(row["t3"]) / float(row["wedges"])


def average_clustering(graph: LinkGraph, count_zeros: bool = True) -> float:
    """``nx.average_clustering`` parity: mean per-vertex coefficient;
    ``count_zeros=False`` averages only over vertices with a nonzero
    coefficient (NetworkX keyword)."""
    c = clustering(graph)
    if not count_zeros:
        c = c.where(F.col("clustering") > 0)
    row = c.agg(F.avg("clustering").alias("m")).first()
    return float(row["m"]) if row["m"] is not None else 0.0


def directed_clustering(graph: LinkGraph) -> DataFrame:
    """``nx.clustering`` on a DiGraph (Fagiolo 2007, "Clustering in
    complex directed networks", Phys. Rev. E 76): with
    b(u,v) = [u→v] + [v→u] ∈ {1,2},

        W(i) = Σ_{triangles {i,j,k}} b_ij · b_ik · b_jk
        c(i) = W(i) / (d_tot(i)·(d_tot(i)−1) − 2·d_bi(i)),  0 when W=0

    which equals nx's ``_directed_triangles_and_degree_iter`` value
    t/2 over denominator (t counts each triangle's two (j,k)
    orderings). Self-loops excluded throughout, exactly nx.

    Plan: the b-table is ONE (least,greatest) pair aggregate of the
    deduplicated edge set; triangles reuse the degree-oriented
    enumeration (the orientation IS the skew bound); three
    key-partitioned joins attach the b's, one corner explode + one
    partial agg gives W; degrees are one endpoint-explode aggregate."""
    pairs = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(F.count("*").alias("bw"))
    )
    from .triangles import triangle_list

    tris = triangle_list(graph)  # canonical x < y < z over the projection
    wtri = (
        tris.join(
            pairs.select(
                F.col("a").alias("x"), F.col("b").alias("y"), F.col("bw").alias("bxy")
            ),
            ["x", "y"],
        )
        .join(
            pairs.select(
                F.col("a").alias("x"), F.col("b").alias("z"), F.col("bw").alias("bxz")
            ),
            ["x", "z"],
        )
        .join(
            pairs.select(
                F.col("a").alias("y"), F.col("b").alias("z"), F.col("bw").alias("byz")
            ),
            ["y", "z"],
        )
        .select(
            "x", "y", "z", (F.col("bxy") * F.col("bxz") * F.col("byz")).alias("p")
        )
    )
    corners = (
        wtri.select(F.col("x").alias("vid"), "p")
        .unionAll(wtri.select(F.col("y").alias("vid"), "p"))
        .unionAll(wtri.select(F.col("z").alias("vid"), "p"))
    )
    w = corners.groupBy("vid").agg(F.sum("p").alias("w"))
    degs = (
        pairs.select(F.col("a").alias("vid"), "bw")
        .unionAll(pairs.select(F.col("b").alias("vid"), "bw"))
        .groupBy("vid")
        .agg(
            F.sum("bw").alias("dt"),
            F.sum(F.when(F.col("bw") == 2, 1).otherwise(0)).alias("db"),
        )
    )
    joined = (
        graph.vertices.select("vid")
        .join(w, "vid", "left")
        .join(degs, "vid", "left")
    )
    ww = F.coalesce(F.col("w"), F.lit(0)).cast("double")
    dt = F.coalesce(F.col("dt"), F.lit(0)).cast("double")
    db = F.coalesce(F.col("db"), F.lit(0)).cast("double")
    return joined.select(
        "vid",
        F.when(ww > 0, ww / (dt * (dt - 1) - 2.0 * db))
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
