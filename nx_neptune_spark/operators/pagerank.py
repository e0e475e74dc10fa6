"""PageRank: damped power iteration as a join-aggregate loop.

NetworkX-semantics parity (the reference's oracle -- its integration
tests compare backend="neptune" against plain NetworkX,
/root/reference/integ_test/graph_operations/test_algo_page_rank.py):

  * x0 = 1/N (or normalized ``nstart``)
  * p  = 1/N (or normalized ``personalization``)
  * dangling mass redistributed by ``dangling`` weights (default: p)
  * x' = alpha * (contribs + danglesum * dangling_w) + (1-alpha) * p
  * converge when  sum(|x' - x|) < N * tol   (NetworkX's stop rule)

Parameter surface mirrors the reference wrapper
(/root/reference/nx_neptune/algorithms/link_analysis/pagerank.py:50-194):
alpha (dampingFactor, default 0.85, pagerank.py:105-106), max_iter
(numOfIterations; Neptune default 20 vs NX 100, pagerank.py:108-110),
tol (tolerance 1e-6, pagerank.py:112-113), weight / edge weights
(pagerank.py:136-142), personalization -> sourceNodes/sourceWeights
(pagerank.py:144-162). ``nstart``/``dangling`` are *supported* here
(the reference warns-and-ignores them, pagerank.py:164-170; we follow
NetworkX instead because NetworkX is the correctness oracle).

Physical plan per iteration (one shuffle, north rule):
  contribs = links ⨝ ranks on src   (links pre-partitioned+persisted
             on src; ranks checkpointed preserving its partitioning)
           -> groupBy(dst).sum      (map-side partial agg; optional
             two-phase salted combine for 10^12-edge hub keys)
  new rank  = broadcast-free projection over vertex_meta ⨝ contribs
  delta+danglesum computed in ONE action per iteration by joining
  new/old state (sum |x'-x|, sum x' over dangling vertices).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from ..graph import LinkGraph
from ..plans.checkpoint import (
    CheckpointManager,
    IterationMetrics,
    release_local_checkpoint,
)
from ..plans.skew import salted_sum
from ..session import adaptive_disabled


class PowerIterationFailedConvergence(RuntimeError):
    pass


# Join-skew hub-split thresholds ("auto" mode): a src key only gets hub
# treatment when its edge count exceeds BOTH an absolute floor (below
# ~10k rows a task finishes in milliseconds regardless) and
# HUB_IDEAL_MULTIPLE x the ideal rows-per-partition (|E|/npart). The
# multiple is calibrated from the measured A/B in PLANS.md §17
# (scripts/hub_skew_bench.py): at local[32]/~4.5M edges the split's
# per-iteration BroadcastExchange latency beats the straggler savings
# at 3.2x ideal (0.81x) and 3.6x (0.89x) and only breaks even at 16x
# (1.06x), so auto engages exactly where the straggler unambiguously
# dominates; on a real cluster the fixed latency amortizes and the
# constant is conservative. Key count is capped so the hub vid list
# stays a small codegen'd literal and the per-iteration broadcast stays
# tiny; by construction at most |E|/HUB_MIN_DEGREE keys can qualify.
HUB_MIN_DEGREE = 10_000
HUB_IDEAL_MULTIPLE = 16
HUB_MAX_KEYS = 256

# Lineage-truncation cadence of the lazy FIXED-DEPTH loop: every k
# iterations the ranks frame gets an EAGER localCheckpoint bounding the
# analyzed plan depth. (The blocked tol loop instead lazy-checkpoints
# every iteration with serialized storage + explicit release — measured
# 2.6x there; the same cadence in the fixed loop traded a ~2 s gain at
# 1M vertices for ~15% at the 27M-edge weak-scaling pair and heap OOMs
# at local[32], so the fixed loop keeps the eager cadence. Round-6
# A/Bs, BENCH/BASELINE.md.) Env-tunable for the probe harness
# (scripts/serial_fraction_ab.py).
TRUNCATE_EVERY = int(os.environ.get("NXS_PR_TRUNCATE_EVERY", "5"))


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    personalization: Mapping[int, float] | None = None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: Mapping[int, float] | None = None,
    weight: str | None = "weight",
    dangling: Mapping[int, float] | None = None,
    salt_buckets: int = 0,
    checkpoint: CheckpointManager | None = None,
    fixed_iterations: int | None = None,
    raise_on_no_convergence: bool = True,
    join_hint: str | None = "shuffle_hash",
    disable_adaptive: bool = True,
    check_every: int = 1,
    stats: dict | None = None,
    hub_split: str | int | None = "auto",
) -> DataFrame:
    """Return DataFrame(vid long, rank double).

    ``stats``: pass a dict to receive run metadata without a durable
    checkpoint: ``iterations`` (updates performed), ``delta`` (last
    measured L1 delta; None on the fixed-depth lazy path, which never
    computes one), ``converged``, ``hub_split_keys``.

    ``hub_split``: join-skew remedy for out-degree hub srcs (see the
    hub-split block in ``_pagerank_impl``). ``"auto"`` (default)
    engages when some src's edge count exceeds
    max(HUB_MIN_DEGREE, HUB_IDEAL_MULTIPLE*|E|/shuffle_partitions); an
    int forces that degree threshold; None/0 disables.

    ``fixed_iterations`` disables the tolerance check and runs exactly
    that many iterations (used for SQL-oracle comparison where the
    oracle is an unrolled fixed-depth query).

    ``check_every`` batches the convergence test: run k iterations as
    one lazy multi-stage plan, then pay ONE driver action computing the
    L1 delta between the block's last two states. The run stops at the
    first block boundary where ``L1(x_t - x_{t-1}) < n * tol`` -- i.e.
    at the first multiple of k at-or-past NetworkX's stopping
    iteration, so the result is deterministic and at least as converged
    as NetworkX's (consecutive-iteration L1 deltas of the damped power
    iteration contract by ~alpha per step). With the default 1 the
    behavior is exactly NetworkX's stop rule. Durable checkpoints (a
    ``checkpoint`` with a directory) are written at block granularity.

    ``disable_adaptive`` turns AQE off for the duration of the call
    (see session.adaptive_disabled: the loop's shape is static and
    skew is handled explicitly, so AQE re-planning is pure per-stage
    latency here — ~2x wall-clock on the bench graph). Every action of
    the run happens inside the scope; the returned DataFrame is
    materialized state, so the caller's session setting is restored
    before return.
    """
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _pagerank_impl(
            graph,
            alpha=alpha,
            personalization=personalization,
            max_iter=max_iter,
            tol=tol,
            nstart=nstart,
            weight=weight,
            dangling=dangling,
            salt_buckets=salt_buckets,
            checkpoint=checkpoint,
            fixed_iterations=fixed_iterations,
            raise_on_no_convergence=raise_on_no_convergence,
            join_hint=join_hint,
            check_every=check_every,
            stats=stats,
            hub_split=hub_split,
        )


def _pagerank_impl(
    graph: LinkGraph,
    alpha: float,
    personalization: Mapping[int, float] | None,
    max_iter: int,
    tol: float,
    nstart: Mapping[int, float] | None,
    weight: str | None,
    dangling: Mapping[int, float] | None,
    salt_buckets: int,
    checkpoint: CheckpointManager | None,
    fixed_iterations: int | None,
    raise_on_no_convergence: bool,
    join_hint: str | None,
    check_every: int = 1,
    stats: dict | None = None,
    hub_split: str | int | None = "auto",
) -> DataFrame:
    spark = graph.spark
    edges = graph.symmetric_edges()
    if weight is not None and weight in edges.columns:
        edges = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        edges = edges.select("src", "dst", F.lit(1.0).alias("w"))

    vertices = graph.vertices.select("vid")
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, rank double")

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # --- static per-vertex metadata: p (teleport), dangling weight, x0 ---
    meta = vertices
    meta = _attach_dist(meta, personalization, "p", default=1.0 / n, normalize=True)
    meta = _attach_dist(meta, dangling, "dw", default=None, normalize=True)
    if dangling is None:
        meta = meta.withColumn("dw", F.col("p"))
    meta = _attach_dist(meta, nstart, "x0", default=1.0 / n, normalize=True)

    # --- static link table: share = w / out_weight_sum(src) --------------
    # out_w doubles as the non-dangling vertex set (its keys are exactly
    # the vertices with outgoing edges), so one persisted aggregate
    # serves both the share normalization and dangling detection -- no
    # second scan+distinct over the edge table. deg (edge count per
    # src) rides along for free and feeds the join-skew hub detector.
    out_w = (
        edges.groupBy("src")
        .agg(F.sum("w").alias("out_w"), F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    raw_links = edges.join(out_w.select("src", "out_w"), "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
    )

    # --- join-skew hub split (plans/skew.py rationale) -------------------
    # The per-iteration links ⨝ ranks join co-partitions links on src;
    # an out-degree hub therefore concentrates its edge rows in ONE
    # task, and that straggler bounds the stage (aggregation skew on
    # dst is already neutralized by map-side partial sums -- PLANS §13).
    # Hub srcs get the classic split treatment: their edge rows live in
    # a round-robin-partitioned side table joined against a BROADCAST
    # of the (few) hub rank rows, so the hot key's work spreads across
    # every core; tail edges keep the co-partitioned SHJ. Detection
    # costs one tiny aggregate on the cached out_w table (V rows, and
    # the materialization is reused by every iteration's share lookup).
    hub_vids: list[int] = []
    hub_links = None
    if hub_split == "auto" or (isinstance(hub_split, int) and hub_split > 0):
        if hub_split == "auto":
            deg_row = out_w.agg(
                F.max("deg").alias("mx"), F.sum("deg").alias("m")
            ).first()
            max_deg, m_edges = int(deg_row["mx"] or 0), int(deg_row["m"] or 0)
            thr = max(
                HUB_MIN_DEGREE, (HUB_IDEAL_MULTIPLE * m_edges) // max(npart, 1)
            )
        else:
            thr = int(hub_split)
            max_deg = thr  # force the probe below
        if max_deg >= thr:
            hub_vids = [
                int(r["src"])
                for r in out_w.where(F.col("deg") >= thr)
                .orderBy(F.desc("deg"))
                .limit(HUB_MAX_KEYS)
                .collect()
            ]
    if hub_vids:
        hub_links = (
            raw_links.where(F.col("src").isin(hub_vids))
            .repartition(npart)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        raw_links = raw_links.where(~F.col("src").isin(hub_vids))
    if stats is not None:
        stats["hub_split_keys"] = len(hub_vids)

    def _join_contribs(links_df: DataFrame, ranks: DataFrame) -> DataFrame:
        """(src, dst, c=rank*share) rows: co-partitioned SHJ for the
        tail, broadcast join of the hub ranks against the round-robin
        hub edge table (no hot partition)."""
        out = links_df.join(
            _hinted(ranks, join_hint), links_df.src == ranks.vid
        ).select("src", "dst", (F.col("rank") * F.col("share")).alias("c"))
        if hub_links is not None:
            hubr = ranks.where(F.col("vid").isin(hub_vids))
            out = out.unionByName(
                hub_links.join(
                    F.broadcast(hubr), hub_links.src == hubr.vid
                ).select("src", "dst", (F.col("rank") * F.col("share")).alias("c"))
            )
        return out
    dangling_vids = vertices.join(
        out_w, vertices.vid == F.col("src"), "left_anti"
    ).select("vid")
    meta = (
        meta.join(dangling_vids.withColumn("is_dangling", F.lit(True)), "vid", "left")
        .withColumn("is_dangling", F.coalesce("is_dangling", F.lit(False)))
        .repartition(npart, "vid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # --- init / resume ----------------------------------------------------
    start_iter = 0
    ranks = meta.select("vid", F.col("x0").alias("rank"))
    if checkpoint is not None:
        resumed = checkpoint.resume()
        if resumed is not None:
            state, manifest = resumed
            ranks = state.select("vid", "rank")
            start_iter = int(manifest["metrics"]["iteration"]) + 1
            if manifest.get("complete"):
                return ranks
    cp = checkpoint or CheckpointManager(spark, algorithm="pagerank")

    limit = fixed_iterations if fixed_iterations is not None else max_iter
    converged = fixed_iterations is not None

    # Fast path: fixed depth + no durable checkpoints -> build the whole
    # multi-iteration plan lazily (each iteration is one shuffle stage)
    # with lineage truncation every few iterations. Zero per-iteration
    # driver actions; Spark schedules the stages back-to-back in a
    # single job. Dangling mass is handled WITHOUT a per-iteration
    # action via a SENTINEL EDGE: every dangling vertex gets a link to
    # dst = -1 with share 1.0, so the regular contribs aggregate also
    # produces danglesum as the contrib of key -1 -- the exact direct
    # sum over dangling ranks (same arithmetic as the eager path), in
    # the SAME single exchange. The 1-row filter on that key folds back
    # in with a broadcast cross join (AQE's shuffle-stage cache serves
    # both consumers from one materialized exchange).
    lazy_ok = fixed_iterations is not None and (
        checkpoint is None or checkpoint.checkpoint_dir is None
    )
    # Blocked convergence mode: same sentinel-edge lazy iteration body,
    # but tol-driven -- one L1-delta action per ``check_every``-iteration
    # block instead of one per iteration (see pagerank() docstring).
    blocked = fixed_iterations is None and check_every > 1
    if lazy_ok or blocked:
        # ONE pre-loop driver action: an emptiness probe over the
        # persisted meta table decides whether the graph has dangling
        # vertices at all. When it does NOT (the common case for link
        # graphs whose vertex set is the crawled pages -- every page
        # links out), the per-iteration danglesum machinery (one extra
        # key-less aggregate stage + one scalar BroadcastExchange, i.e.
        # one blocking driver round-trip per iteration) is provably
        # dead: D_t == 0 every iteration, and alpha*(contrib + 0*dw)
        # == alpha*contrib bit-exactly. The serial-fraction probe
        # (scripts/serial_fraction_ab.py) measures that round-trip at
        # ~0.2s/iteration on this sandbox -- 10x the one-off probe cost
        # for a 10-iteration run -- and on a real cluster each scalar
        # broadcast is still a full stage barrier + driver collect.
        # When dangling vertices exist, the SENTINEL-EDGE plan below is
        # used: every dangling vertex gets a link to dst = -1 with
        # share 1.0, so the regular contribs aggregate also produces
        # danglesum as the contrib of key -1 -- the exact direct sum
        # over dangling ranks (same arithmetic as the eager path), in
        # the SAME single exchange; the 1-row filter on that key folds
        # back in with a broadcast cross join.
        has_dangling = not meta.where(F.col("is_dangling")).isEmpty()
        if graph.vids_non_negative:
            sentinel_dst = -1
        else:
            # hand-built graph: one cheap aggregate to find a safe key
            sentinel_dst = min(
                -1, int(meta.agg(F.min("vid")).first()[0]) - 1
            )
        sentinel = dangling_vids.select(
            F.col("vid").alias("src"),
            F.lit(sentinel_dst).cast("long").alias("dst"),
            F.lit(1.0).alias("share"),
        )
        lz_links = (
            (raw_links.unionByName(sentinel) if has_dangling else raw_links)
            .repartition(npart, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        def step(ranks: DataFrame) -> DataFrame:
            contribs = salted_sum(
                _join_contribs(lz_links, ranks),
                key="dst",
                value=F.col("c"),
                out="contrib",
                salt_buckets=salt_buckets,
                salt_from="src",
            )
            if not has_dangling:
                # D_t == 0 bit-exactly: the rank update collapses to
                # alpha*contrib + (1-alpha)*p -- no danglesum aggregate,
                # no scalar broadcast, no second consumer of contribs
                # (so no lineage fork to checkpoint; the loop's
                # per-iteration lazy checkpoint bounds analyzed depth).
                return (
                    meta.join(contribs, meta.vid == contribs.dst, "left")
                    .select(
                        "vid",
                        (
                            F.lit(alpha)
                            * F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.lit(1.0 - alpha) * F.col("p")
                        ).alias("rank"),
                    )
                )
            # contribs is consumed twice (rank update + danglesum row).
            # Cut its lineage with a LAZY localCheckpoint: no driver
            # action now, one materialization at job time serving both
            # consumers, and the logical plan stays linear in
            # iterations instead of doubling per iteration.
            contribs = contribs.localCheckpoint(eager=False)
            dsum = (
                contribs.where(F.col("dst") == sentinel_dst)
                .agg(F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("__danglesum"))
            )
            return (
                meta.join(contribs, meta.vid == contribs.dst, "left")
                .crossJoin(F.broadcast(dsum))
                .select(
                    "vid",
                    (
                        F.lit(alpha)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.col("__danglesum") * F.col("dw")
                        )
                        + F.lit(1.0 - alpha) * F.col("p")
                    ).alias("rank"),
                )
            )

        if lazy_ok:
            # Fixed-depth mode keeps the round-5 shape: raw lazy chains
            # with an eager truncate every TRUNCATE_EVERY iterations and
            # NO per-iteration state caching. A round-6 A/B of
            # per-iteration lazy checkpoints here won ~2 s per 10
            # iterations at 1M vertices but cost ~15% at the
            # memory-bandwidth-bound 27M-edge weak-scaling pair (extra
            # serialization + cache traffic; deserialized variants OOM'd
            # the 8g heap outright at local[32]) — the blocked tol loop
            # below, where the same cadence wins 2.6x, keeps it with
            # serialized, explicitly released intermediates instead.
            for it in range(start_iter, limit):
                ranks = step(ranks)
                if (it + 1) % TRUNCATE_EVERY == 0 and it != limit - 1:
                    ranks = cp.truncate(ranks)
            out = ranks.select("vid", "rank").localCheckpoint(eager=True)
            lz_links.unpersist()
            out_w.unpersist()
            meta.unpersist()
            if hub_links is not None:
                hub_links.unpersist()
            if stats is not None:
                stats.update(iterations=limit, delta=None, converged=True)
            return out

        # blocked tol-driven loop: k lazy iterations, then one action
        # computing L1(x_t - x_{t-1}) over the block's last two states.
        # The lazy localCheckpoint on the new state is materialized BY
        # that same delta action, so the next block roots at cached
        # state -- exactly one driver action per block.
        it = start_iter
        last_it = start_iter
        delta = None
        while it < max_iter and not converged:
            block_end = min(it + check_every, max_iter)
            # Per-iteration LAZY checkpoint (round-6 A/B: 40.7 -> 14-18 s
            # on the 20-iteration tol run at 1M pages, bit-identical
            # delta/rank sums): the plan roots at a LogicalRDD
            # immediately so analysis stays O(1) per iteration, with one
            # materialization job per block. SERIALIZED storage keeps a
            # block's live frames compact (deserialized intermediates
            # OOM'd an 8g heap at 6M vertices), and ``carried`` (the
            # state the block started from) plus the block's
            # intermediates are explicitly released once the delta
            # action has materialized everything — only the block's
            # final state stays cached for the next block.
            carried = ranks
            prev = ranks
            pending = []
            for i in range(it, block_end):
                prev = ranks
                ranks = step(ranks).localCheckpoint(
                    eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
                )
                pending.append(ranks)
            delta = float(
                ranks.join(prev.select("vid", F.col("rank").alias("__old")), "vid")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))).alias("delta"))
                .first()["delta"]
            )
            for f in pending[:-1]:
                release_local_checkpoint(f)
            if it > start_iter:
                release_local_checkpoint(carried)
            last_it = block_end - 1
            metrics = IterationMetrics(iteration=last_it, delta=delta)
            metrics.extra["check_every"] = check_every
            if cp.checkpoint_dir is not None:
                ranks = cp.checkpoint(ranks.select("vid", "rank"), metrics)
                cp.update_metrics(metrics)
            it = block_end
            if delta < n * tol:
                converged = True
                cp.finalize(last_it, metrics, state=ranks.select("vid", "rank"))
        out = ranks.select("vid", "rank")
        lz_links.unpersist()
        out_w.unpersist()
        meta.unpersist()
        if hub_links is not None:
            hub_links.unpersist()
        if not converged and raise_on_no_convergence:
            raise PowerIterationFailedConvergence(
                f"pagerank failed to converge in {max_iter} iterations"
            )
        if stats is not None:
            stats.update(iterations=last_it + 1, delta=delta, converged=converged)
        return out

    # --- eager path: links table cached on its own. One action
    # materializes meta (and out_w beneath it) and returns the dangling
    # flag + count; the first iteration additionally needs the danglesum
    # over the CURRENT ranks (closed form dc/n for the fresh uniform
    # init, join-aggregate when nstart was given or the run resumed
    # mid-iteration).
    links = (
        raw_links.repartition(npart, "src").persist(StorageLevel.MEMORY_AND_DISK)
    )
    flags = meta.agg(
        F.max(F.when(F.col("is_dangling"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)).alias("dc"),
    ).first()
    has_dangling = bool(flags["d"])
    danglesum = 0.0
    if has_dangling:
        if nstart is None and start_iter == 0:
            danglesum = float(flags["dc"]) / n
        else:
            danglesum = (
                meta.join(ranks, "vid")
                .where(F.col("is_dangling"))
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )

    it = start_iter - 1
    last_delta = None
    for it in range(start_iter, limit):
        contribs = salted_sum(
            _join_contribs(links, ranks),
            key="dst",
            value=F.col("c"),
            out="contrib",
            salt_buckets=salt_buckets,
            salt_from="src",
        )
        new_ranks = (
            meta.join(contribs, meta.vid == contribs.dst, "left")
            .select(
                "vid",
                "p",
                "dw",
                "is_dangling",
                (
                    F.lit(alpha)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(danglesum) * F.col("dw"))
                    + F.lit(1.0 - alpha) * F.col("p")
                ).alias("rank"),
            )
        )
        metrics = IterationMetrics(iteration=it)
        new_state = cp.checkpoint(new_ranks.select("vid", "rank"), metrics)
        if fixed_iterations is not None and not has_dangling:
            # fixed-depth, dangling-free: no convergence check needed --
            # the eager checkpoint is the only action this iteration
            ranks = new_state
            continue
        # ONE action: L1 delta + next iteration's dangling mass together.
        row = (
            new_state.alias("n")
            .join(ranks.select("vid", F.col("rank").alias("old")), "vid")
            .join(meta.select("vid", "is_dangling"), "vid")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling"), F.col("rank"))), F.lit(0.0)
                ).alias("dsum"),
            )
            .first()
        )
        delta, danglesum = float(row["delta"]), float(row["dsum"])
        last_delta = delta
        metrics.delta = delta
        cp.update_metrics(metrics)
        ranks = new_state
        if fixed_iterations is None and delta < n * tol:
            converged = True
            cp.finalize(it, metrics, state=new_state)
            break
    links.unpersist()
    out_w.unpersist()
    meta.unpersist()
    if hub_links is not None:
        hub_links.unpersist()
    if not converged and raise_on_no_convergence:
        raise PowerIterationFailedConvergence(
            f"pagerank failed to converge in {limit} iterations"
        )
    if stats is not None:
        stats.update(
            iterations=it + 1, delta=last_delta, converged=converged
        )
    return ranks.select("vid", "rank")


def _attach_dist(
    meta: DataFrame,
    dist: Mapping[int, float] | None,
    col: str,
    default: float | None,
    normalize: bool,
) -> DataFrame:
    """Attach a (possibly sparse) vertex-keyed distribution as a column."""
    spark = meta.sparkSession
    if dist is None:
        if default is None:
            return meta.withColumn(col, F.lit(None).cast("double"))
        return meta.withColumn(col, F.lit(default))
    total = float(sum(dist.values()))
    if total <= 0:
        raise ZeroDivisionError(f"{col} distribution sums to zero")
    rows = [(int(k), float(v) / total) for k, v in dist.items()]
    ddf = spark.createDataFrame(rows, f"vid long, {col} double")
    return meta.join(F.broadcast(ddf), "vid", "left").withColumn(
        col, F.coalesce(F.col(col), F.lit(0.0))
    )

def _hinted(df: DataFrame, join_hint: str | None) -> DataFrame:
    """Join-strategy hint for the per-iteration links ⨝ ranks join.

    Default shuffle_hash: both sides are already hash-partitioned on the
    key, so SHJ needs no per-iteration sort of the E-row links side (SMJ
    would re-sort it every iteration) and no driver-side broadcast build
    (BHJ serializes the whole rank state through one driver thread,
    which anti-scales with executor count)."""
    return df.hint(join_hint) if join_hint else df
