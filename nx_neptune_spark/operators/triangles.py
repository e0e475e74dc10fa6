"""Triangle counting via degree-ordered edge joins (exact,
NetworkX-`triangles` parity; north-rule required, SURVEY.md §2.9).

Classic MapReduce formulation (Suri & Vassilvitskii, "Counting
triangles and the curse of the last reducer", WWW'11): orient each
undirected edge from the lower-(degree, id) endpoint to the higher one.
Every vertex then has out-degree O(sqrt(m)), so the wedge join
e1(u→v) ⨝ e2(v→w) is bounded even on power-law graphs -- this ordering
IS the skew handling (a hub's edges point *into* it, so the hub never
fans out wedges).

Closure test = edge-iterator with neighbor arrays instead of a wedge
self-join: collect each vertex's oriented out-neighbors once
(``collect_list``, bounded by the O(sqrt(m)) orientation), then for
every oriented edge (u,v) the triangles through it are
``array_intersect(N+(u), N+(v))`` -- the wedge table (sum of outdeg^2
rows) is never materialized or shuffled, only |E| rows carrying two
bounded arrays. ~2x faster than the wedge join on the 4.5M-edge bench
graph and strictly less shuffle volume at scale; per-vertex counts come
from exploding each triangle's three corners.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..session import adaptive_disabled


def _oriented_edges(graph: LinkGraph) -> DataFrame:
    """Canonical undirected edge set oriented by (degree, vid)."""
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("vid"))
        .unionAll(edges.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .count()
        .withColumnRenamed("count", "deg")
    )
    e = (
        edges.join(deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")
    )
    # orient from lower (deg, vid) to higher (deg, vid)
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def triangle_list(graph: LinkGraph, oriented: DataFrame | None = None) -> DataFrame:
    """DataFrame(x long, y long, z long): each triangle once (x<y<z)."""
    o = oriented
    if o is None:
        o = _oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    adj = o.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    tris = (
        o.join(adj.select(F.col("u").alias("u"), F.col("nbrs").alias("nu")), "u")
        .join(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select("u", "v", F.explode(F.array_intersect("nu", "nv")).alias("w"))
    )
    out = tris.select(
        F.least("u", "v", "w").alias("x"),
        F.greatest(
            F.least("u", "v"), F.least(F.greatest("u", "v"), F.col("w"))
        ).alias("y"),
        F.greatest("u", "v", "w").alias("z"),
    )
    return out


def triangle_count(graph: LinkGraph, disable_adaptive: bool = True) -> DataFrame:
    """Per-vertex triangle counts: DataFrame(vid long, triangles long).
    Matches ``nx.triangles`` (vertices in no triangle -> 0).

    Runs with AQE off by default (session.adaptive_disabled: the plan
    is two co-bounded joins whose skew is already killed by the degree
    orientation, so AQE re-planning is pure stage latency — measured
    ~2x on the bench graph). The per-vertex result is materialized
    inside the scope (same V-row localCheckpoint barrier PageRank uses
    for its final state), which also lets the oriented-edge cache be
    released before return."""
    with adaptive_disabled(graph.spark, disable_adaptive):
        o = _oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            tris = triangle_list(graph, oriented=o)
            corners = (
                tris.select(F.col("x").alias("vid"))
                .unionAll(tris.select(F.col("y").alias("vid")))
                .unionAll(tris.select(F.col("z").alias("vid")))
            )
            counts = corners.groupBy("vid").agg(F.count("*").alias("triangles"))
            return (
                graph.vertices.select("vid")
                .join(counts, "vid", "left")
                .select("vid", F.coalesce("triangles", F.lit(0)).alias("triangles"))
                .localCheckpoint(eager=True)
            )
        finally:
            o.unpersist()


def total_triangles(graph: LinkGraph, disable_adaptive: bool = True) -> int:
    with adaptive_disabled(graph.spark, disable_adaptive):
        o = _oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return triangle_list(graph, oriented=o).count()
        finally:
            o.unpersist()
