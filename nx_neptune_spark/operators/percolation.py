"""Percolation centrality: batched Brandes with per-source percolation
weights.

The reference's centrality surface is degree + closeness
(/root/reference/nx_neptune/algorithms/centrality/); percolation
centrality (Piraveenan, Prokopenko & Hossain, PLoS ONE 2013;
``nx.percolation_centrality``) extends Brandes betweenness with a
node-state weighting — the standard "how central is this page to the
spread" measure when vertices carry an infection/adoption state x ∈
[0,1] (for a crawl graph: spam scores, freshness, compromise flags).

Semantics match NetworkX exactly: per source s the Brandes dependency
δ_s(w) is accumulated with weight x_s / (Σx − x_w), and the result is
scaled by 1/(n−2). Unweighted shortest paths (nx's ``weight=None``
default; same warn-and-ignore contract as betweenness.py for
``weight``). ``sources`` selects deterministic pivots exactly like
betweenness.py (engine extension; nx computes all sources — the
dispatch path does too).

Plan: the forward sweep IS betweenness.py's ``_forward_levels``
(shared code, one batched (s, vid) state); the backward sweep is the
same per-level join chain, keeping the source key in the accumulation
parts so ONE final join pair against the (vid, x) states table applies
x_s/(Σx − x_w) — the states table joins by key (broadcast-able when
small), and Σx is one scalar aggregate. Nothing new shuffles versus
betweenness beyond the two state joins at the very end.
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


def percolation_centrality(
    graph: LinkGraph,
    states: DataFrame,
    sources: list[int] | None = None,
    weight: str | None = None,
    max_depth: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, percolation double) over ALL vertices
    (zeros included, NetworkX dict parity).

    ``states``: DataFrame(vid long, x double) — the percolation state
    of every vertex (nx's node attribute / ``states`` mapping)."""
    if weight is not None:
        warnings.warn(
            "Parameter `weight` is not supported by percolation_centrality "
            "and will be ignored (unweighted shortest paths).",
            stacklevel=2,
        )
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    if n <= 2:
        raise ZeroDivisionError(
            "percolation_centrality needs more than two vertices (nx's "
            "1/(n-2) rescale)"
        )
    edges = _traversal_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    states = states.select("vid", F.col("x").cast("double").alias("x")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sum_x = float(states.agg(F.sum("x")).collect()[0][0])

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
                f"exact percolation centrality on {n:,} vertices is O(V*E); "
                "pass sources=[...] to sample pivots",
                stacklevel=2,
            )

    levels, level_rows, depth = _forward_levels(edges, pivots, n_pivots, max_depth)

    parts: list[DataFrame] = []
    delta: DataFrame | None = None
    for lvl in range(depth - 1, -1, -1):
        upper = levels[lvl + 1].select(
            F.col("s").alias("us"),
            F.col("vid").alias("w"),
            F.col("sigma").alias("sigma_w"),
        )
        if delta is not None:
            upper = upper.join(
                delta.select(
                    F.col("s").alias("us"),
                    F.col("vid").alias("w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["us", "w"],
                "left",
            ).select(
                "us", "w", "sigma_w",
                F.coalesce("delta_w", F.lit(0.0)).alias("delta_w"),
            )
        else:
            upper = upper.select("us", "w", "sigma_w", F.lit(0.0).alias("delta_w"))
        cur = levels[lvl]
        contrib = (
            cur.join(edges, cur.vid == edges.src)
            .join(
                upper,
                (F.col("us") == cur.s) & (F.col("w") == edges.dst),
            )
            .groupBy(cur.s, cur.vid)
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("delta")
            )
        )
        delta = contrib.localCheckpoint(eager=True)
        # keep the source key: the percolation factor x_s/(Σx - x_w)
        # applies per (s, w) pair at accumulation time
        parts.append(
            delta.where(F.col("vid") != F.col("s")).select("s", "vid", "delta")
        )
        release_local_checkpoint(levels[lvl + 1])
        levels[lvl + 1] = None
    for rest in levels:
        if rest is not None:
            release_local_checkpoint(rest)

    if stats is not None:
        stats["levels"] = depth
        stats["pivots"] = n_pivots
    if not parts:
        edges.unpersist()
        states.unpersist()
        return vertices.select("vid", F.lit(0.0).alias("percolation"))
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    weighted = (
        acc.join(
            states.select(F.col("vid").alias("s"), F.col("x").alias("x_s")), "s"
        )
        .join(states.select("vid", F.col("x").alias("x_w")), "vid")
        .groupBy("vid")
        .agg(
            F.sum(
                F.col("delta") * F.col("x_s") / (F.lit(sum_x) - F.col("x_w"))
            ).alias("p")
        )
    )
    out = (
        vertices.join(weighted, "vid", "left")
        .select(
            "vid",
            (F.coalesce("p", F.lit(0.0)) / F.lit(float(n - 2))).alias(
                "percolation"
            ),
        )
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    states.unpersist()
    return out
