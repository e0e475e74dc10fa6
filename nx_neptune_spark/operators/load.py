"""Load centrality (Newman 2001 / Goh-Kahng-Kim 2001): batched
multi-source equal-split flow accumulation.

The reference's centrality surface is degree + closeness
(/root/reference/nx_neptune/algorithms/centrality/); load centrality
is betweenness's historical sibling (``nx.load_centrality`` /
``newman_betweenness_centrality``) — a unit of load starts at every
reached vertex and flows back toward the source, split EQUALLY among
the BFS-DAG predecessors at each hop (not σ-proportionally, the one
semantic difference from Brandes betweenness).

Semantics match NetworkX exactly, including its quirks: the split
denominator is the DAG in-degree; flow into the source is dropped
(nx's ``if x == source: break`` — which only ever fires for
distance-1 vertices, whose sole predecessor IS the source, so the
apparent order-dependence is vacuous); every vertex's own initial
unit is subtracted at the end, which collapses to "load = what a
vertex RECEIVES from deeper levels"; ``normalized`` divides by
(n−1)(n−2) when n > 2; ``cutoff`` bounds the BFS depth. ``weight`` is
warn-and-ignored (unweighted paths), ``sources`` samples pivots —
both the betweenness.py contracts.

Plan: the forward sweep IS betweenness.py's ``_forward_levels``
(shared code — its per-level aggregate already counts the DAG
in-degree alongside σ); the backward sweep is one DAG join per level
accumulating (1 + received(w)) / npred(w) into the previous level,
stopping before the source level. Identical exchange budget to
betweenness.
"""

from __future__ import annotations

import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import release_local_checkpoint
from .betweenness import _forward_levels
from .bfs import _traversal_edges


def load_centrality(
    graph: LinkGraph,
    sources: list[int] | None = None,
    normalized: bool = True,
    weight: str | None = None,
    cutoff: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, load double) over ALL vertices (zeros
    included, NetworkX dict parity)."""
    if weight is not None:
        warnings.warn(
            "Parameter `weight` is not supported by load_centrality and "
            "will be ignored (unweighted shortest paths).",
            stacklevel=2,
        )
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    edges = _traversal_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)

    if sources is not None:
        pivots = spark.createDataFrame(
            [(int(s),) for s in sources], "s long"
        ).distinct()
        n_pivots = len(set(int(s) for s in sources))
    else:
        pivots = vertices.select(F.col("vid").alias("s"))
        n_pivots = n
        if n > 200_000:
            warnings.warn(
                f"exact load centrality on {n:,} vertices is O(V*E); pass "
                "sources=[...] to sample pivots",
                stacklevel=2,
            )

    levels, level_rows, depth = _forward_levels(edges, pivots, n_pivots, cutoff)

    parts: list[DataFrame] = []
    received: DataFrame | None = None  # (s, vid, r) at level l+1
    for lvl in range(depth - 1, 0, -1):
        upper = levels[lvl + 1].select(
            F.col("s").alias("us"),
            F.col("vid").alias("w"),
            F.col("npred").alias("npred_w"),
        )
        if received is not None:
            upper = upper.join(
                received.select(
                    F.col("s").alias("us"),
                    F.col("vid").alias("w"),
                    F.col("r").alias("r_w"),
                ),
                ["us", "w"],
                "left",
            ).select(
                "us", "w", "npred_w", F.coalesce("r_w", F.lit(0.0)).alias("r_w")
            )
        else:
            upper = upper.select("us", "w", "npred_w", F.lit(0.0).alias("r_w"))
        cur = levels[lvl]
        contrib = (
            cur.join(edges, cur.vid == edges.src)
            .join(
                upper,
                (F.col("us") == cur.s) & (F.col("w") == edges.dst),
            )
            .groupBy(cur.s, cur.vid)
            .agg(
                F.sum((1.0 + F.col("r_w")) / F.col("npred_w")).alias("r")
            )
        )
        received = contrib.localCheckpoint(eager=True)
        parts.append(received.select("vid", F.col("r").alias("load")))
        release_local_checkpoint(levels[lvl + 1])
        levels[lvl + 1] = None
    for rest in levels:
        if rest is not None:
            release_local_checkpoint(rest)
    edges.unpersist()
    if stats is not None:
        stats["levels"] = depth
        stats["pivots"] = n_pivots

    scale = (
        1.0 / ((n - 1) * (n - 2)) if (normalized and n > 2) else 1.0
    )
    if not parts:
        return vertices.select("vid", F.lit(0.0).alias("load"))
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    summed = acc.groupBy("vid").agg(F.sum("load").alias("l"))
    return vertices.join(summed, "vid", "left").select(
        "vid",
        (F.coalesce("l", F.lit(0.0)) * F.lit(float(scale))).alias("load"),
    )
