"""HITS hubs & authorities (Kleinberg 1999), NetworkX semantics.

The reference exposes only the Neptune Analytics algorithm set (no
HITS: /root/reference/nx_neptune/algorithms has pagerank/centrality/
community/traversal only); HITS is included as a core link-graph
extension in the same class as connected components / triangle count
(SURVEY.md §2.9) — on a web graph hubs/authorities is the canonical
companion analysis to PageRank.

Exact update rule (NetworkX ``hits_alg.py``; the scipy implementation
and the historical pure-Python one agree):

    a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)·w(u,v)       (from NORMALIZED h)
    h_k(u) = Σ_{(u,v)∈E} a_k(v)·w(u,v)           (from RAW a_k)
    h_k /= max(h_k);  a_k /= max(a_k)
    stop when Σ_v |h_k(v) − h_{k-1}(v)| < tol
    if normalized: finally h /= Σh, a /= Σa

Plan shape (the scale story): the edge table is persisted ONCE and
joined per half-step on ``src`` (authority gather) then ``dst`` (hub
gather) — two key-partitioned shuffle-hash joins + two partial-agg
exchanges per iteration, exactly PageRank's exchange budget ×2 because
HITS is two coupled matvecs. The per-iteration max/sum normalizations
are 1-row cross-joined aggregates (the same fold used for PageRank's
sentinel dangling mass), so ``fixed_iterations`` mode builds the whole
multi-iteration plan LAZILY with zero driver actions inside the loop;
tolerance mode pays one combined L1-delta action per iteration.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..session import adaptive_disabled
from .pagerank import PowerIterationFailedConvergence, _hinted


def hits(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
    nstart: dict | None = None,
    normalized: bool = True,
    weight: str | None = None,
    fixed_iterations: int | None = None,
    disable_adaptive: bool = True,
    join_hint: str | None = "shuffle_hash",
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(vid long, hub double, authority double).

    ``fixed_iterations`` disables the tolerance check and runs exactly
    that many iterations fully lazily (used for SQL-oracle comparison
    where the oracle unrolls the same depth). ``weight`` names an edge
    weight column (NetworkX uses the adjacency weights); None = 1.0.
    ``stats`` receives ``iterations``, ``delta``, ``converged``.
    """
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _hits_impl(
            graph, max_iter, tol, nstart, normalized, weight,
            fixed_iterations, join_hint, stats,
        )


def _hits_impl(
    graph: LinkGraph,
    max_iter: int,
    tol: float,
    nstart: dict | None,
    normalized: bool,
    weight: str | None,
    fixed_iterations: int | None,
    join_hint: str | None,
    stats: dict | None,
) -> DataFrame:
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    edges = graph.symmetric_edges()
    if weight is not None and weight in edges.columns:
        links = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        links = edges.select("src", "dst", F.lit(1.0).alias("w"))
    if links.isEmpty():
        # NetworkX returns empty dicts for the null graph; vertex-only
        # graphs get all-zero scores (max-normalization is undefined,
        # matching nx's ZeroDivision-free special case of no edges)
        if stats is not None:
            stats.update(iterations=0, delta=0.0, converged=True)
        return vertices.select(
            "vid", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    # TWO pre-partitioned persisted copies: the authority gather joins
    # on src, the hub gather on dst — bucketing each copy on its join
    # key removes both per-iteration edge-table exchanges (guide §2.4;
    # the storage cost is the standard bucket-both-sides trade)
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    links_by_src = links.repartition(npart, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    links_by_dst = links.repartition(npart, "dst").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    links = links_by_src

    if nstart is not None:
        s = sum(nstart.values())
        h = spark.createDataFrame(
            [(int(k), float(v) / s) for k, v in nstart.items()], "vid long, s double"
        )
    else:
        n = graph.num_vertices()
        h = vertices.select("vid", F.lit(1.0 / n).alias("s"))

    def half_steps(h: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(a_k, h_k), both max-normalized, built lazily. h stays
        sparse over out-degree>0 vertices (absent = 0, which the next
        gather treats correctly by omission); zero-fill happens once at
        output time."""
        # a_raw is consumed THREE times (the h-gather join, its own max
        # aggregate, the normalized output) and h_raw twice; LAZY
        # localCheckpoints make one job-time materialization serve all
        # consumers instead of re-executing the matvec join+agg per
        # consumer (PageRank's contribs device). The 1-row max rows are
        # broadcast so each fold-back is a broadcast nested loop.
        a_raw = (
            links_by_src.join(_hinted(h, join_hint), links_by_src.src == h.vid)
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("s") * F.col("w")).alias("raw"))
            .localCheckpoint(eager=False)
        )
        h_raw = (
            links_by_dst.join(
                _hinted(a_raw, join_hint), links_by_dst.dst == a_raw.vid
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum(F.col("raw") * F.col("w")).alias("raw2"))
            .localCheckpoint(eager=False)
        )
        a_k = (
            a_raw.crossJoin(F.broadcast(a_raw.agg(F.max("raw").alias("mx"))))
            .select("vid", (F.col("raw") / F.col("mx")).alias("s"))
        )
        h_k = (
            h_raw.crossJoin(F.broadcast(h_raw.agg(F.max("raw2").alias("mx"))))
            .select("vid", (F.col("raw2") / F.col("mx")).alias("s"))
        )
        return a_k, h_k

    converged = False
    delta = None
    if fixed_iterations is not None:
        if fixed_iterations < 1:
            raise ValueError("fixed_iterations must be >= 1")
        limit = fixed_iterations
        a = None
        for it in range(limit):
            a, h = half_steps(h)
            # lineage cut: 4 joins/aggregates per iteration would stack
            # into an exponential-analysis plan; same lazy device as
            # the PageRank fixed-depth loop
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)
        converged = True
        iterations = limit
    else:
        iterations = 0
        for it in range(max_iter):
            a, new_h = half_steps(h)
            a = a.localCheckpoint(eager=False)
            new_h = new_h.localCheckpoint(eager=False)
            # one combined action: L1 delta over the (sparse) union of
            # supports; absent vertices are exact zeros on both sides
            delta_row = (
                new_h.select("vid", F.col("s").alias("ns"))
                .join(h.select("vid", F.col("s").alias("os")), "vid", "full_outer")
                .agg(
                    F.coalesce(
                        F.sum(
                            F.abs(
                                F.coalesce(F.col("ns"), F.lit(0.0))
                                - F.coalesce(F.col("os"), F.lit(0.0))
                            )
                        ),
                        F.lit(0.0),
                    ).alias("d")
                )
                .first()
            )
            delta = float(delta_row["d"])
            h = new_h
            iterations = it + 1
            if delta < tol:
                converged = True
                break
        if not converged:
            links_by_src.unpersist()
            links_by_dst.unpersist()
            raise PowerIterationFailedConvergence(
                f"HITS failed to converge in {max_iter} iterations"
            )

    if normalized:
        h = h.crossJoin(F.broadcast(h.agg(F.sum("s").alias("t")))).select(
            "vid", (F.col("s") / F.col("t")).alias("s")
        )
        a = a.crossJoin(F.broadcast(a.agg(F.sum("s").alias("t")))).select(
            "vid", (F.col("s") / F.col("t")).alias("s")
        )
    out = (
        vertices.join(h.select("vid", F.col("s").alias("hub")), "vid", "left")
        .join(a.select("vid", F.col("s").alias("authority")), "vid", "left")
        .select(
            "vid",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    links_by_src.unpersist()
    links_by_dst.unpersist()
    if stats is not None:
        stats.update(iterations=iterations, delta=delta, converged=converged)
    return out
