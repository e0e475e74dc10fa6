"""Degree centrality (+in/out variants).

Parity with /root/reference/nx_neptune/algorithms/centrality/
degree_centrality.py:41-194: the remote call returns raw degrees and
the client normalizes by (n-1) (degree_centrality.py:189-193); in/out
variants set traversalDirection (:88-95, :119-126). Here: a single
groupBy-count per direction; for undirected graphs both endpoints
count (reference double-insert semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def degree(graph: LinkGraph, direction: str = "both") -> DataFrame:
    """Raw degrees: DataFrame(vid long, degree long).

    direction: 'both' (undirected/total), 'in', 'out'
    (maps to the reference's traversalDirection param).
    For undirected graphs 'both' counts each incident edge once per
    endpoint (NetworkX G.degree parity, self-loops counted twice).
    """
    e = graph.edges.select("src", "dst")
    if direction == "out":
        ends = e.select(F.col("src").alias("vid"))
    elif direction == "in":
        ends = e.select(F.col("dst").alias("vid"))
    elif direction == "both":
        ends = e.select(F.col("src").alias("vid")).unionAll(
            e.select(F.col("dst").alias("vid"))
        )
    else:
        raise ValueError(f"direction must be both|in|out, got {direction!r}")
    counts = ends.groupBy("vid").agg(F.count("*").alias("degree"))
    return (
        graph.vertices.select("vid")
        .join(counts, "vid", "left")
        .select("vid", F.coalesce("degree", F.lit(0)).alias("degree"))
    )


def degree_centrality(graph: LinkGraph, direction: str = "both") -> DataFrame:
    """Degrees normalized by (n-1), client-side like the reference
    (degree_centrality.py:192). DataFrame(vid long, centrality double)."""
    n = graph.num_vertices()
    denom = float(n - 1) if n > 1 else 1.0
    return degree(graph, direction).select(
        "vid", (F.col("degree") / F.lit(denom)).alias("centrality")
    )
