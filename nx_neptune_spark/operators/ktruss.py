"""k-truss decomposition: iterative edge peeling on triangle support.

The reference has no truss surface (its algorithm set is
pagerank/centrality/community/traversal); k-truss is the edge-peeling
companion of k-core (SURVEY §2.9 extension class) and the standard
dense-subgraph miner on link graphs (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis"). Semantics match
``nx.k_truss``: the maximal subgraph in which every edge participates
in at least k−2 triangles *of that subgraph*.

Algorithm: repeat { count triangles of the current edge set
(degree-oriented edge-iterator, the triangle_count machinery —
operators/triangles.py); drop edges with support < k−2 } until no edge
drops. Dropping an edge can only lower other edges' support, so the
peel cascades; the fixpoint is exactly the k-truss.

Plan per round (the scale story): one triangle enumeration over a
MONOTONICALLY SHRINKING edge set — the O(m^{3/2}) degree-oriented
bound applies to each round's remaining edges, not the original graph
— then one explode(3 corners)+partial-agg for per-edge supports and
one join to filter. Round count = peeling depth (small on real
graphs: each round removes every edge below threshold at once, the
"bulk deletion" variant of truss decomposition used by every
distributed implementation).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager
from ..session import adaptive_disabled
from .triangles import _oriented_edges, triangle_list


def k_truss(
    graph: LinkGraph,
    k: int,
    max_rounds: int = 1000,
    disable_adaptive: bool = True,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(u long, v long): the edges of the k-truss,
    canonical u < v (``nx.k_truss`` edge-set parity; the truss's
    vertex set is the endpoints). k must be >= 2; k=2 returns every
    non-self-loop edge (every edge is trivially in >= 0 triangles).

    ``stats`` receives ``rounds`` (peel rounds incl. the final no-op
    confirmation) and ``converged``.
    """
    if k < 2:
        raise ValueError("k_truss: k must be >= 2 (NetworkX parity)")
    spark = graph.spark
    min_support = k - 2
    cp = checkpoint or CheckpointManager(spark, algorithm="k_truss")
    # Per-round lineage truncation is load-bearing, not hygiene: each
    # round's plan references the previous round's edge set ~5x
    # (oriented view, adjacency, two triangle corners, the keep-join),
    # so without a cut Catalyst re-analysis grows ~5^rounds — measured
    # 4s for round 1 and >400s for round 2 on a 1k-edge fixture before
    # the cut. truncate() roots each round at the materialized blocks
    # (same device as core_number/sssp).
    edges = cp.truncate(
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    n_edges = edges.count()
    rounds, converged = 0, False
    with adaptive_disabled(spark, disable_adaptive):
        while rounds < max_rounds:
            rounds += 1
            if min_support == 0:
                converged = True
                break
            cur = LinkGraph(
                edges.select(F.col("u").alias("src"), F.col("v").alias("dst")),
                graph.vertices,
                directed=False,
            )
            # persist the oriented view for the round and release it
            # after the kept-set is materialized (triangle_count's
            # cache discipline; the bare triangle_list call would leak
            # its internal persist across rounds)
            oriented = _oriented_edges(cur).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                tris = triangle_list(cur, oriented=oriented)
                support = (
                    tris.select(F.col("x").alias("u"), F.col("y").alias("v"))
                    .unionAll(
                        tris.select(F.col("x").alias("u"), F.col("z").alias("v"))
                    )
                    .unionAll(
                        tris.select(F.col("y").alias("u"), F.col("z").alias("v"))
                    )
                    .groupBy("u", "v")
                    .agg(F.count("*").alias("sup"))
                )
                kept = cp.truncate(
                    edges.join(support, ["u", "v"], "left")
                    .where(F.coalesce("sup", F.lit(0)) >= min_support)
                    .select("u", "v")
                )
                n_kept = kept.count()
            finally:
                oriented.unpersist()
            edges = kept
            if n_kept == n_edges:
                converged = True
                break
            n_edges = n_kept
    if stats is not None:
        stats.update(rounds=rounds, converged=converged)
    return edges


def edge_triangle_support(graph: LinkGraph) -> DataFrame:
    """DataFrame(u, v, sup): per canonical edge (u < v), the number of
    triangles it participates in (support 0 edges included) — the
    k-truss round's support aggregate exposed as a one-shot operator."""
    from pyspark import StorageLevel

    from .triangles import _oriented_edges, triangle_list

    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    cur = LinkGraph(
        canon.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        graph.vertices,
        directed=False,
    )
    oriented = _oriented_edges(cur).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        tris = triangle_list(cur, oriented=oriented)
        support = (
            tris.select(F.col("x").alias("u"), F.col("y").alias("v"))
            .unionAll(tris.select(F.col("x").alias("u"), F.col("z").alias("v")))
            .unionAll(tris.select(F.col("y").alias("u"), F.col("z").alias("v")))
            .groupBy("u", "v")
            .agg(F.count("*").alias("sup"))
        )
        out = (
            canon.join(support, ["u", "v"], "left")
            .select("u", "v", F.coalesce("sup", F.lit(0)).alias("sup"))
            .localCheckpoint(eager=True)
        )
    finally:
        oriented.unpersist()
    return out


def generalized_degree(graph: LinkGraph) -> DataFrame:
    """DataFrame(vid, t, cnt): for each vertex, how many of its
    incident edges participate in exactly t triangles
    (``nx.generalized_degree`` Counter parity; vertices with no edges
    have no rows — the adapter re-adds empty Counters). One explode of
    the support table to both endpoints + one (vid, t) aggregate on
    top of the triangle-support pass."""
    sup = edge_triangle_support(graph)
    both = sup.select(F.col("u").alias("vid"), F.col("sup").alias("t")).unionAll(
        sup.select(F.col("v").alias("vid"), F.col("sup").alias("t"))
    )
    return both.groupBy("vid", "t").agg(F.count("*").alias("cnt"))
