"""Katz centrality (NetworkX parity).

Katz (1953) is the classic attenuation-sum link centrality — the
third of the canonical power-iteration family next to PageRank and
eigenvector centrality (both in this package), and the one with a
β-seed instead of a teleport: x = α·Aᵀx + β counts all walks into a
node, damped by length. The reference exposes only the Neptune
algorithm set (no Katz); included as a core link-graph extension.

Exact update rule (NetworkX ``katz.py``):

    x_0   = nstart (default zeros)
    x_k   = α · Aᵀ x_{k-1} + β        (gather along IN-edges for
                                       digraphs; both directions when
                                       undirected)
    stop when Σ_v |x_k(v) − x_{k-1}(v)| < n·tol
    if normalized: x *= 1 / ‖x‖₂      (ONE final normalization)

β may be a scalar or a per-node dict (nx raises if a dict misses
nodes; mirrored). Convergence requires α < 1/λ_max; past max_iter we
raise ``PowerIterationFailedConvergence`` (nx parity).

Plan shape (the scale story): per iteration ONE key-partitioned
shuffle-hash join (links ⨝ x on src) + ONE partial-agg exchange
(groupBy dst) + a dense left join back onto the vertex set — exactly
PageRank's exchange budget, and cheaper than eigenvector's loop (no
per-iteration norm). ``fixed_iterations`` mode is fully lazy (zero
driver actions inside the loop); the optional final L2 norm folds in
as a broadcast 1-row join.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..session import adaptive_disabled
from .pagerank import PowerIterationFailedConvergence, _hinted


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float | dict = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    nstart: dict | None = None,
    normalized: bool = True,
    weight: str | None = None,
    fixed_iterations: int | None = None,
    disable_adaptive: bool = True,
    join_hint: str | None = "shuffle_hash",
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(vid long, centrality double).

    ``fixed_iterations`` disables the tolerance check and runs exactly
    that many iterations fully lazily (used for SQL-oracle comparison
    where the oracle unrolls the same depth)."""
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _katz_impl(
            graph, alpha, beta, max_iter, tol, nstart, normalized, weight,
            fixed_iterations, join_hint, stats,
        )


def _katz_impl(
    graph, alpha, beta, max_iter, tol, nstart, normalized, weight,
    fixed_iterations, join_hint, stats,
):
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    if n == 0:
        raise ValueError("katz_centrality: null graph (NetworkX parity)")
    edges = graph.symmetric_edges()
    if weight is not None and weight in edges.columns:
        links = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        links = edges.select("src", "dst", F.lit(1.0).alias("w"))
    links = links.persist(StorageLevel.MEMORY_AND_DISK)

    if isinstance(beta, dict):
        b = spark.createDataFrame(
            [(int(k), float(v)) for k, v in beta.items()], "vid long, b double"
        )
        base = vertices.join(b, "vid", "left")
        if base.where(F.col("b").isNull()).limit(1).count() > 0:
            links.unpersist()
            raise ValueError("beta dictionary must have a value for every node")
        base = base.select("vid", "b")
    else:
        base = vertices.select("vid", F.lit(float(beta)).alias("b"))
    base = base.persist(StorageLevel.MEMORY_AND_DISK)

    if nstart is not None:
        x = spark.createDataFrame(
            [(int(k), float(v)) for k, v in nstart.items()], "vid long, s double"
        )
        x = vertices.join(x, "vid", "left").select(
            "vid", F.coalesce("s", F.lit(0.0)).alias("s")
        )
    else:
        x = vertices.select("vid", F.lit(0.0).alias("s"))

    a = float(alpha)

    def step(x: DataFrame) -> DataFrame:
        """x' = α·Aᵀx + β, fully lazy."""
        contrib = (
            links.join(_hinted(x, join_hint), links.src == x.vid)
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("s") * F.col("w")).alias("c"))
        )
        return base.join(contrib, "vid", "left").select(
            "vid",
            (F.lit(a) * F.coalesce("c", F.lit(0.0)) + F.col("b")).alias("s"),
        )

    converged = False
    delta = None
    if fixed_iterations is not None:
        if fixed_iterations < 1:
            raise ValueError("fixed_iterations must be >= 1")
        for _ in range(fixed_iterations):
            x = step(x).localCheckpoint(eager=False)
        converged = True
        iterations = fixed_iterations
    else:
        iterations = 0
        for it in range(max_iter):
            new_x = step(x).localCheckpoint(eager=False)
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
            base.unpersist()
            raise PowerIterationFailedConvergence(
                f"katz_centrality failed to converge in {max_iter} iterations"
            )

    if normalized:
        norm = x.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("m"))
        out = x.crossJoin(F.broadcast(norm)).select(
            "vid",
            (
                F.col("s")
                * F.when(F.col("m") == 0.0, 1.0).otherwise(1.0 / F.col("m"))
            ).alias("centrality"),
        )
    else:
        out = x.select("vid", F.col("s").alias("centrality"))
    links.unpersist()
    base.unpersist()
    if stats is not None:
        stats.update(iterations=iterations, delta=delta, converged=converged)
    return out
