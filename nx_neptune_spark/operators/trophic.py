"""Trophic levels / differences / incoherence (NetworkX parity).

Levine 1980; Johnson et al. PNAS 2014 ("Trophic coherence determines
food-web stability"): s_i = 1 + Σ_j p_ij·s_j with p the in-weight-
normalized adjacency and s = 1 at basal (in-degree-0) nodes. On a web
graph this is the "how many hops of derivation above the seed set"
hierarchy — the same quantity crawl-frontier analyses compute over
redirect/aggregation DAGs — and the incoherence parameter (std of
per-edge level differences) is the one-number DAG-ness measure.

Matches ``nx.trophic_levels`` exactly, including both error cases (no
basal nodes; nodes unreachable from every basal node — nx detects the
latter via a singular matrix, HERE via one explicit BFS from the basal
set, same message). nx solves the dense linear system (I−P)⁻¹ with
numpy (O(V³)); this module runs the Jacobi/Neumann iteration
s ← 1 + P·s, which converges whenever nx's inverse exists (spectral
radius of P < 1), is EXACT after depth(DAG) rounds on acyclic inputs,
and stops on an L1 tolerance like the PageRank loop.

Plan (the scale story): P is one in-strength aggregate + one division
(edge-table projection, persisted); each Jacobi round is ONE
key-partitioned P⨝s join + one partial agg — the PageRank exchange
budget — with per-round lineage cuts. Differences are one edge⨝levels
join; incoherence one stddev_pop aggregate. The basal-reachability
guard reuses the sparse multi-source BFS frontier loop.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager


def trophic_levels(
    graph: LinkGraph,
    weight: str | None = "weight",
    tol: float = 1.0e-12,
    max_iter: int = 200,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """``nx.trophic_levels`` parity: DataFrame(vid, level double).
    ``fixed_iterations`` runs exactly that many lazy Jacobi rounds
    (the unrolled-oracle mode; exact on DAGs whose depth it covers)."""
    if not graph.directed:
        raise ValueError("trophic levels are defined for directed graphs")
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="trophic")
    e = graph.edges
    if weight is not None and "weight" in e.columns:
        per = e.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    else:
        per = e.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    instr = per.groupBy(F.col("dst").alias("vid")).agg(F.sum("w").alias("insum"))
    vertices = graph.vertices.select("vid")
    basal = vertices.join(
        instr.select("vid"), "vid", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if basal.isEmpty():
        raise ValueError(
            "This graph has no basal nodes (nodes with no incoming edges)."
            "Trophic levels are not defined without at least one basal node."
        )
    # reachability guard (nx detects this as a singular I-P)
    sym_fwd = per.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    frontier = cp.truncate(basal.select("vid"))
    reached = frontier
    while True:
        nxt = (
            sym_fwd.join(frontier, sym_fwd.src == frontier.vid)
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(reached, "vid", "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        reached = cp.truncate(reached.unionByName(nxt))
        frontier = nxt
    if not vertices.join(reached, "vid", "left_anti").isEmpty():
        sym_fwd.unpersist()
        basal.unpersist()
        raise ValueError(
            "Trophic levels are only defined for graphs where every node "
            "has a path from a basal node (basal nodes are nodes with no "
            "incoming edges)."
        )
    # p(dst <- src) = w / insum(dst): the Jacobi operator
    p = (
        per.join(instr.withColumnRenamed("vid", "dst"), "dst")
        .select("src", "dst", (F.col("w") / F.col("insum")).alias("p"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    levels = cp.truncate(vertices.select("vid", F.lit(1.0).alias("level")))

    def step(cur: DataFrame) -> DataFrame:
        contrib = (
            p.join(cur.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("p") * F.col("level")).alias("c"))
        )
        return vertices.join(contrib, "vid", "left").select(
            "vid",
            (F.lit(1.0) + F.coalesce("c", F.lit(0.0))).alias("level"),
        )

    if fixed_iterations is not None:
        for _ in range(fixed_iterations):
            levels = cp.truncate(step(levels))
    else:
        for _ in range(max_iter):
            nxt_levels = cp.truncate(step(levels))
            delta = (
                nxt_levels.join(
                    levels.withColumnRenamed("level", "old"), "vid"
                )
                .agg(F.sum(F.abs(F.col("level") - F.col("old"))).alias("d"))
                .first()["d"]
            )
            levels = nxt_levels
            if delta is not None and delta < tol:
                break
    p.unpersist(blocking=False)
    sym_fwd.unpersist(blocking=False)
    basal.unpersist(blocking=False)
    return levels


def trophic_differences(
    graph: LinkGraph, weight: str | None = "weight", **kw
) -> DataFrame:
    """``nx.trophic_differences`` parity: DataFrame(src, dst,
    diff double) with diff = level(dst) − level(src) per edge."""
    levels = trophic_levels(graph, weight=weight, **kw)
    e = graph.edges.select("src", "dst").distinct()
    return (
        e.join(
            levels.select(F.col("vid").alias("src"), F.col("level").alias("ls")),
            "src",
        )
        .join(
            levels.select(F.col("vid").alias("dst"), F.col("level").alias("ld")),
            "dst",
        )
        .select("src", "dst", (F.col("ld") - F.col("ls")).alias("diff"))
    )


def trophic_incoherence_parameter(
    graph: LinkGraph,
    weight: str | None = "weight",
    cannibalism: bool = False,
    **kw,
) -> float:
    """``nx.trophic_incoherence_parameter`` parity: population std of
    the per-edge trophic differences (self-loops dropped unless
    ``cannibalism``, exactly like nx)."""
    g = graph
    if not cannibalism:
        g = LinkGraph(
            graph.edges.where(F.col("src") != F.col("dst")),
            graph.vertices,
            directed=True,
        )
    diffs = trophic_differences(g, weight=weight, **kw)
    row = diffs.agg(F.stddev_pop("diff").alias("s")).first()
    return float(row["s"]) if row["s"] is not None else 0.0
