"""Harmonic centrality via multi-source BFS (NetworkX parity).

Companion to closeness (operators/closeness.py, the reference's
closeness dispatch /root/reference/nx_neptune/algorithms/centrality/
closeness.py): harmonic centrality (Boldi & Vigna 2014, "Axioms for
centrality") replaces the reciprocal-of-sum with a sum-of-reciprocals

    harmonic(u) = Σ_{v ≠ u, d(v,u) < ∞} 1 / d(v,u)

which is finite on DISCONNECTED graphs — the reason Common-Crawl-scale
link ranking (e.g. the public host-level CC rankings) prefers it to
closeness. Distances are *incoming* like NetworkX's: on digraphs we
BFS over reversed edges from each target u.

``nbunch`` restricts the vertices scored (fewer BFS roots — the cheap
axis); ``sources`` restricts the v's summed over (one post-BFS
semi-join). Unweighted hop distances (``distance=None``); the
weighted form belongs to the SSSP machinery.

Plan (the scale story): identical to closeness — ALL roots batched in
one (source, vid)-keyed frontier, each level ONE key-partitioned join
+ distinct + anti-join against visited, per-level lineage truncation
via CheckpointManager. Exact mode is O(V·E); the same loud
ResourceWarning as closeness fires past 100k vertices — at web scale
pass nbunch (the reference's num_sources sampling pattern).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager
from .closeness import EXACT_MODE_WARN_VERTICES


def harmonic_centrality(
    graph: LinkGraph,
    nbunch: list[int] | None = None,
    sources: list[int] | None = None,
) -> DataFrame:
    """DataFrame(vid long, harmonic double), ``nx.harmonic_centrality``
    parity (incoming hop distances; unreachable pairs contribute 0)."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="harmonic")
    vertices = graph.vertices.select("vid")

    if graph.directed:
        # incoming distances: walk edges backwards from each target
        edges = graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    else:
        edges = graph.symmetric_edges().select("src", "dst")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    if nbunch is not None:
        roots_df = spark.createDataFrame([(int(v),) for v in nbunch], "vid long")
        roots = vertices.join(roots_df, "vid", "left_semi")
    else:
        roots = vertices
        n = vertices.count()
        if n > EXACT_MODE_WARN_VERTICES:
            import warnings

            warnings.warn(
                f"harmonic_centrality exact mode on {n:,} vertices is "
                "O(V*E) (one BFS per vertex); pass nbunch=[...] at this "
                "scale",
                ResourceWarning,
                stacklevel=2,
            )

    frontier = roots.select(F.col("vid").alias("source"), F.col("vid").alias("vid"))
    visited = cp.truncate(frontier.withColumn("dist", F.lit(0)))
    frontier = cp.truncate(frontier)
    d = 0
    while True:
        nxt = (
            edges.join(frontier, edges.src == frontier.vid)
            .select("source", F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("source", "vid"), ["source", "vid"], "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        d += 1
        visited = cp.truncate(
            visited.unionByName(nxt.withColumn("dist", F.lit(d)))
        )
        frontier = nxt
    edges.unpersist()

    reached = visited.where(F.col("dist") > 0)
    if sources is not None:
        src_df = spark.createDataFrame([(int(v),) for v in sources], "vid long")
        reached = reached.join(src_df, "vid", "left_semi")
    agg = reached.groupBy("source").agg(
        F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic")
    )
    base = roots if nbunch is not None else vertices
    return (
        base.select("vid")
        .join(agg.withColumnRenamed("source", "vid"), "vid", "left")
        .select("vid", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"))
    )
