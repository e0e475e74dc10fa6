"""Topological generations / sort of a DAG (NetworkX parity).

On a link graph the natural DAG is the condensation (see
``operators/condensation.py``) or a host-level crawl-depth graph;
layering it answers "how deep is the web from the seed frontier" —
generation(v) = 1 + max(generation of predecessors), i.e. the longest
path from any source, exactly ``nx.topological_generations``.
``nx.topological_sort`` order falls out by generation (ties broken by
vid, a deterministic refinement of NetworkX's unspecified in-layer
order).

Algorithm: **bulk Kahn peeling**. Per round the current in-degree-0
set (one anti-join of the active vertices against the active edge
destinations) becomes generation k; the peeled vertices and their
out-edges anti-join away, with eager lineage cuts per round (the
ktruss lesson: without them Catalyst re-analysis grows geometrically).
Round count = DAG depth — short on condensations of web graphs (the
bowtie collapses the giant SCC to one node). If peeling stalls while
vertices remain, the remainder contains a cycle: raise
``ValueError("Graph contains a cycle...")`` like NetworkX's
NetworkXUnfeasible (the dispatch layer translates).

Plan per round (the scale story): two distinct-projections + three
anti-joins — all key-partitioned on vid, no closure work, no driver
state beyond the round counter and one emptiness probe.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def topological_generations(
    graph: LinkGraph, max_rounds: int = 100_000, stats: dict | None = None
) -> DataFrame:
    """DataFrame(vid long, generation long); raises ValueError if the
    graph contains a cycle (``nx.topological_generations`` parity)."""
    if not graph.directed:
        raise ValueError("topological generations require a directed graph")
    active_v = graph.vertices.select("vid").persist(StorageLevel.MEMORY_AND_DISK)
    active_e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    parts: list[DataFrame] = []
    gen = 0
    while gen < max_rounds:
        has_in = active_e.select(F.col("dst").alias("vid")).distinct()
        layer = (
            active_v.join(has_in, "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        if layer.isEmpty():
            break
        parts.append(layer.select("vid", F.lit(gen).cast("long").alias("generation")))
        new_v = (
            active_v.join(layer, "vid", "left_anti")
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_e = (
            active_e.join(layer.select(F.col("vid").alias("src")), "src", "left_anti")
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        active_v.unpersist()
        active_e.unpersist()
        active_v, active_e = new_v, new_e
        gen += 1
    leftover = not active_v.isEmpty()
    active_v.unpersist()
    active_e.unpersist()
    if leftover:
        raise ValueError(
            "Graph contains a cycle or graph changed during iteration"
        )
    if stats is not None:
        stats.update(depth=gen)
    spark = graph.spark
    if not parts:
        return spark.createDataFrame([], "vid long, generation long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def topological_sort(graph: LinkGraph, **kw) -> DataFrame:
    """DataFrame(vid, generation) ordered by (generation, vid) — a
    deterministic valid topological order (``nx.topological_sort``
    refinement)."""
    return topological_generations(graph, **kw).orderBy("generation", "vid")
