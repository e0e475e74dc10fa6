"""Eigenvector centrality (power iteration on A+I), NetworkX semantics.

The reference exposes only the Neptune Analytics algorithm set (no
eigenvector centrality: /root/reference/nx_neptune/algorithms has
pagerank/centrality/community/traversal only); included as a core
link-graph extension alongside HITS — it is the undamped companion of
PageRank (same gather-scatter matvec, no teleport).

Exact update rule (NetworkX ``eigenvector.py``):

    x_0   = nstart / Σnstart          (default nstart: all ones → 1/n)
    r_k   = x_{k-1} + Aᵀ x_{k-1}      (iterating with A+I avoids the
                                       period-2 oscillation of bipartite
                                       components)
    x_k   = r_k / ‖r_k‖₂
    stop when Σ_v |x_k(v) − x_{k-1}(v)| < n·tol

For directed graphs the gather runs along IN-edges (NetworkX iterates
``G[n]`` successors and adds into ``x[nbr]``), i.e. "left" eigenvector
of the adjacency matrix; ``weight`` names an edge-weight column.

Plan shape (the scale story): per iteration one key-partitioned
shuffle-hash join (edges ⨝ x on src) + one partial-agg exchange
(groupBy dst) — exactly PageRank's exchange budget — then the L2
normalization as a 1-row cross-joined aggregate folded INTO the lazy
plan (the same device as HITS' max-normalization), so
``fixed_iterations`` mode runs the whole loop with zero driver
actions; tolerance mode pays one combined L1-delta action per
iteration. The state stays dense (n rows) and hash-partitioned on vid
across iterations.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import strip_plan_stats
from ..session import adaptive_disabled
from .pagerank import PowerIterationFailedConvergence, _hinted


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-6,
    nstart: dict | None = None,
    weight: str | None = None,
    fixed_iterations: int | None = None,
    disable_adaptive: bool = True,
    join_hint: str | None = "shuffle_hash",
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(vid long, centrality double).

    ``fixed_iterations`` disables the tolerance check and runs exactly
    that many iterations fully lazily (used for SQL-oracle comparison
    where the oracle unrolls the same depth). ``stats`` receives
    ``iterations``, ``delta``, ``converged``.
    """
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _eigen_impl(
            graph, max_iter, tol, nstart, weight, fixed_iterations, join_hint, stats
        )


def _eigen_impl(
    graph: LinkGraph,
    max_iter: int,
    tol: float,
    nstart: dict | None,
    weight: str | None,
    fixed_iterations: int | None,
    join_hint: str | None,
    stats: dict | None,
) -> DataFrame:
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    if n == 0:
        raise ValueError("eigenvector_centrality: null graph (NetworkX parity)")
    edges = graph.symmetric_edges()
    if weight is not None and weight in edges.columns:
        links = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        links = edges.select("src", "dst", F.lit(1.0).alias("w"))
    # pre-partitioned on src: the per-iteration matvec joins on src, so
    # one up-front shuffle replaces one per iteration (guide §2.4)
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    links = links.repartition(npart, "src").persist(StorageLevel.MEMORY_AND_DISK)

    if nstart is not None:
        if all(v == 0 for v in nstart.values()):
            raise ValueError("nstart sums to 0 (NetworkX parity)")
        s = float(sum(nstart.values()))
        x = spark.createDataFrame(
            [(int(k), float(v) / s) for k, v in nstart.items()], "vid long, s double"
        )
        # NetworkX requires nstart to cover every node; missing = error
        # is detected lazily via the dense join below staying dense
        x = vertices.join(x, "vid", "left").select(
            "vid", F.coalesce("s", F.lit(0.0)).alias("s")
        )
    else:
        x = vertices.select("vid", F.lit(1.0 / n).alias("s"))

    def step(x: DataFrame) -> DataFrame:
        """One (A+I)-matvec + in-plan L2 normalization, fully lazy."""
        contrib = (
            links.join(_hinted(x, join_hint), links.src == x.vid)
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("s") * F.col("w")).alias("c"))
        )
        # raw is consumed TWICE (the norm aggregate and the normalized
        # output). Cut its lineage with a LAZY localCheckpoint so one
        # materialization at job time serves both consumers — without
        # the cut every iteration executes the matvec join+agg twice
        # (PageRank's contribs device, pagerank.py step()). Broadcast
        # the 1-row norm so the fold-back is a broadcast nested loop,
        # not a cartesian against the full state.
        raw = (
            x.join(contrib, "vid", "left")
            .select("vid", (F.col("s") + F.coalesce("c", F.lit(0.0))).alias("r"))
            .localCheckpoint(eager=False)
        )
        norm = raw.agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("m"))
        return raw.crossJoin(F.broadcast(norm)).select(
            "vid",
            (F.col("r") / F.when(F.col("m") == 0.0, 1.0).otherwise(F.col("m"))).alias(
                "s"
            ),
        )

    converged = False
    delta = None
    if fixed_iterations is not None:
        if fixed_iterations < 1:
            raise ValueError("fixed_iterations must be >= 1")
        for i in range(fixed_iterations):
            x = step(x).localCheckpoint(eager=False)
            # periodic stats reset: each step references x TWICE, which
            # squares the propagated sizeInBytes estimate per iteration
            # (see plans.checkpoint.strip_plan_stats); stripping every
            # 8th state bounds it while keeping the vid partitioning on
            # the other 7
            if (i + 1) % 8 == 0:
                x = strip_plan_stats(x)
        converged = True
        iterations = fixed_iterations
    else:
        iterations = 0
        for it in range(max_iter):
            new_x = step(x).localCheckpoint(eager=False)
            if (it + 1) % 8 == 0:
                new_x = strip_plan_stats(new_x)
            delta_row = (
                new_x.select("vid", F.col("s").alias("ns"))
                .join(x.select("vid", F.col("s").alias("os")), "vid")
                .agg(F.sum(F.abs(F.col("ns") - F.col("os"))).alias("d"))
                .first()
            )
            delta = float(delta_row["d"])
            x = new_x
            iterations = it + 1
            if delta < n * tol:
                converged = True
                break
        if not converged:
            links.unpersist()
            raise PowerIterationFailedConvergence(
                f"eigenvector_centrality failed to converge in {max_iter} iterations"
            )

    out = x.select("vid", F.col("s").alias("centrality"))
    links.unpersist()
    if stats is not None:
        stats.update(iterations=iterations, delta=delta, converged=converged)
    return out
