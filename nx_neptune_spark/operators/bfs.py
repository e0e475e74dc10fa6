"""BFS family: parents / levels / layers / descendants_at_distance.

Parity with /root/reference/nx_neptune/algorithms/traversal/bfs.py:
  * bfs_edges -> (parent, child) pairs, source self-edge skipped
    (bfs.py:127-129); direction from graph type + reverse flag
    (na_graph.py:115-122: undirected -> both, reverse -> inbound).
  * descendants_at_distance -> nodes at exactly level d (bfs.py:133-185).
  * bfs_layers -> per-level vertex lists, min level per vertex
    (bfs.py:188-236; query shape opencypher_builder.py:603-653:
    min(level) then collect per level, ordered).

Implementation: frontier-expansion loop. Each level is one join of the
(small) frontier against the edge table + one anti-join against the
visited set; the frontier is localCheckpoint'ed so plans stay flat.
At web scale the visited set is vertex-sized -- kept as a DataFrame,
anti-joined with AQE deciding broadcast vs shuffle per level.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager


def _traversal_edges(graph: LinkGraph, reverse: bool = False) -> DataFrame:
    if not graph.directed:
        return graph.symmetric_edges().select("src", "dst")
    e = graph.edges.select("src", "dst")
    return e.select(F.col("dst").alias("src"), F.col("src").alias("dst")) if reverse else e


def bfs_levels(
    graph: LinkGraph,
    sources: list[int],
    max_depth: int | None = None,
    reverse: bool = False,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """DataFrame(vid long, level int): minimum BFS level from any source.
    Sources are level 0. Unreached vertices are absent."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="bfs")
    edges = _traversal_edges(graph, reverse).persist(StorageLevel.MEMORY_AND_DISK)
    frontier = spark.createDataFrame([(int(s),) for s in sources], "vid long").distinct()
    visited = frontier.select("vid", F.lit(0).alias("level"))
    visited = cp.truncate(visited)
    level = 0
    while True:
        if max_depth is not None and level >= max_depth:
            break
        nxt = (
            edges.join(frontier, edges.src == frontier.vid)
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        level += 1
        visited = cp.truncate(
            visited.unionByName(nxt.select("vid", F.lit(level).alias("level")))
        )
        frontier = nxt
    edges.unpersist()
    return visited


def bfs_parents(
    graph: LinkGraph,
    source: int,
    depth_limit: int | None = None,
    reverse: bool = False,
) -> DataFrame:
    """DataFrame(parent long, child long): BFS tree edges, deterministic
    (minimum-vid parent per child), source self-edge excluded
    (reference behavior bfs.py:127-129)."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="bfs_parents")
    edges = _traversal_edges(graph, reverse).persist(StorageLevel.MEMORY_AND_DISK)
    frontier = spark.createDataFrame([(int(source),)], "vid long")
    visited = frontier
    out: DataFrame | None = None
    depth = 0
    while True:
        if depth_limit is not None and depth >= depth_limit:
            break
        step = (
            edges.join(frontier, edges.src == frontier.vid)
            .join(visited.select(F.col("vid").alias("dst")), "dst", "left_anti")
            .groupBy("dst")
            .agg(F.min("src").alias("parent"))
            .select("parent", F.col("dst").alias("child"))
        )
        step = cp.truncate(step)
        if step.isEmpty():
            break
        depth += 1
        out = step if out is None else cp.truncate(out.unionByName(step))
        frontier = step.select(F.col("child").alias("vid"))
        visited = cp.truncate(visited.unionByName(frontier))
    edges.unpersist()
    if out is None:
        return spark.createDataFrame([], "parent long, child long")
    return out


def descendants_at_distance(
    graph: LinkGraph, source: int, distance: int, reverse: bool = False
) -> DataFrame:
    """Vertices at exactly `distance` (reference bfs.py:133-185)."""
    lv = bfs_levels(graph, [source], max_depth=distance, reverse=reverse)
    return lv.where(F.col("level") == distance).select("vid")


def descendants(graph: LinkGraph, source: int) -> DataFrame:
    """DataFrame(vid): all vertices reachable FROM source, source
    itself excluded (``nx.descendants`` = bfs_tree minus the root —
    the root never re-enters even on a cycle, matching the visited-set
    exclusion here). Full closure: the BFS frontier loop runs to
    emptiness, one join + distinct + anti-join per level."""
    return (
        bfs_levels(graph, [source])
        .where(F.col("vid") != int(source))
        .select("vid")
    )


def ancestors(graph: LinkGraph, source: int) -> DataFrame:
    """DataFrame(vid): all vertices that can REACH source
    (``nx.ancestors``): the same closure over reversed edges."""
    return (
        bfs_levels(graph, [source], reverse=True)
        .where(F.col("vid") != int(source))
        .select("vid")
    )


def has_path(graph: LinkGraph, source: int, target: int) -> bool:
    """True iff target is reachable from source (``nx.has_path``).
    The frontier loop early-exits the round the target enters the
    frontier, so work is bounded by the target's BFS level, not the
    full reachability closure."""
    source, target = int(source), int(target)
    if source == target:
        return True
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="has_path")
    edges = _traversal_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    frontier = spark.createDataFrame([(source,)], "vid long")
    visited = frontier
    found = False
    while True:
        nxt = (
            edges.join(frontier, edges.src == frontier.vid)
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        if not nxt.where(F.col("vid") == target).isEmpty():
            found = True
            break
        visited = cp.truncate(visited.unionByName(nxt))
        frontier = nxt
    edges.unpersist()
    return found


def bfs_layers(
    graph: LinkGraph, sources: list[int], reverse: bool = False
) -> DataFrame:
    """DataFrame(level int, members array<long>) ordered by level
    (reference result shape bfs.py:235-236 / builder :603-653)."""
    lv = bfs_levels(graph, sources, reverse=reverse)
    return (
        lv.groupBy("level")
        .agg(F.sort_array(F.collect_list("vid")).alias("members"))
        .orderBy("level")
    )
