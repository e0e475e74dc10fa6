"""Connected components (exact, NetworkX-`connected_components` parity).

Required by the north rule as a canonical extension of the reference's
dispatch surface (SURVEY.md §2.9); the reference delegates no explicit
CC operator, so NetworkX semantics are the oracle.

Two algorithms, both pure DataFrame joins/aggregates:

  * ``two-phase`` (default): alternating **large-star / small-star**
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -- converges in O(log^2 n) rounds regardless of component
    diameter, the right choice for web graphs whose largest component
    spans billions of vertices. Each round is two self-join-free
    group-by-min passes over the (deduplicated) edge set. Once the
    remaining violations are SPARSE (measured: after 2 rounds on a 1M-
    page web graph only ~4.6k of 1M vertices violate star-forest-ness,
    yet each further star round re-shuffles everything), a bounded
    **broadcast finisher** repairs them with a driver-resolved map over
    violating vertices + one map-side broadcast relabel -- zero
    shuffles of the edge set -- falling back to star rounds past the
    cap (FIX_MAX_VIOLATIONS) so the worst case is unchanged.

  * ``minlabel``: classic min-label propagation (labels' = min(label,
    min over neighbors)), O(diameter) rounds; simpler plan per round,
    useful as a cross-check and for low-diameter graphs.

Returns DataFrame(vid long, component long) where component is the
minimum vid in each component (deterministic representative).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import (
    CheckpointManager,
    IterationMetrics,
    strip_plan_stats,
)

# Broadcast-finisher bounds (see _star_contraction.broadcast_fix): the
# violation map collected to the driver is over VIOLATING VERTICES
# (never edges); 100k longs is ~a few MB broadcast -- the same class of
# bounded collect as the IVF training sample. The streak cap forces a
# star round after this many consecutive fix rounds so the O(log^2 n)
# star-contraction bound is retained even on adversarial chain shapes.
FIX_MAX_VIOLATIONS = 100_000
FIX_MAX_STREAK = 8


def connected_components(
    graph: LinkGraph,
    algorithm: str = "two-phase",
    max_iter: int = 200,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Exact connected components of the *undirected* view of the graph
    (weakly connected components for digraphs, matching
    ``nx.connected_components`` on ``g.to_undirected()``).

    ``stats``: pass a dict to receive ``rounds`` — a list of
    ``{iteration, kind, n_edges, secs}`` per round (kind is ``star``
    for a full contraction round, ``fix`` for a broadcast-finisher
    round; n_edges is None for the elided round-0 check; after a fix
    round it counts rows including tolerated duplicates) — without a
    durable checkpoint.
    """
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    # undirected view regardless of graph.directed (WCC semantics)
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
    )
    cp = checkpoint or CheckpointManager(spark, algorithm="connected_components")
    if algorithm == "two-phase":
        # NO input .distinct(): round 0's min-aggregates are
        # dup-insensitive and the round ends in a distinct, so the
        # up-front dedup would be a pure extra exchange over the
        # RAW edge table -- the largest shuffle of the whole run at
        # web scale (measured ~9% total wall-clock at 200k pages,
        # min-of-3; grows with |E|/memory-bandwidth at cluster scale)
        labels = _star_contraction(edges, cp, max_iter, stats)
    elif algorithm == "minlabel":
        # minlabel rejoins the same edge set every round: dedup once
        labels = _min_label_propagation(vertices, edges.distinct(), cp, max_iter)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # attach isolated vertices (their own component)
    return (
        vertices.join(labels, "vid", "left")
        .select("vid", F.coalesce("component", F.col("vid")).alias("component"))
    )


def _star_contraction(
    edges: DataFrame,
    cp: CheckpointManager,
    max_iter: int,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star until the edge set is a stable
    star forest; then every non-root points at its component minimum.

    large-star: for each u, hang every neighbor v > u onto
                m = min(N(u) ∪ {u}).
    small-star: orient edges (hi -> lo); for each hi-node u, hang u and
                all its lo-neighbors onto m = min(N_lo(u) ∪ {u}).
    """
    spark = edges.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame([], "vid long, component long")
    e = edges.localCheckpoint(eager=False)
    # resume from a durable checkpoint (the state IS the contracted edge
    # set; a completed manifest means e is already the star forest)
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        e = state.select("u", "v").localCheckpoint(eager=False)
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))

    # Convergence = the edge set IS a star forest (every edge root->leaf
    # with u<v, no vertex both parent and child, every child unique) --
    # the exact fixpoint of the alternating contraction. Checking the
    # structural property directly instead of fingerprint-comparing
    # consecutive edge sets saves BOTH the pre-loop fingerprint scan and
    # the final confirm round (the fixpoint is recognized the moment it
    # is produced, not one contraction later). The per-vid structural
    # frame is lazily localCheckpointed so the counts action
    # materializes it once and the violation extraction for the
    # broadcast finisher is a cache scan, not a recompute.
    #
    # multi-parent detection is min(par) != max(par), NOT a row count:
    # the broadcast-fix rounds below skip the dedup exchange and
    # tolerate duplicate edge rows (the final mapping is a
    # dup-insensitive group-min), so the convergence check must be
    # dup-insensitive too.
    def round_check(df):
        tagged = df.select(
            F.col("u").alias("vid"),
            F.lit(1).alias("pp"),
            F.lit(0).alias("cc"),
            F.lit(None).cast("long").alias("par"),
        ).unionAll(
            df.select(
                F.col("v").alias("vid"),
                F.lit(0).alias("pp"),
                F.lit(1).alias("cc"),
                F.col("u").alias("par"),
            )
        )
        per_vid = (
            tagged.groupBy("vid")
            .agg(
                F.max("pp").alias("p"),
                F.max("cc").alias("c"),
                F.sum("cc").alias("nc"),
                F.min("par").alias("lo_par"),
                F.max("par").alias("hi_par"),
            )
            .localCheckpoint(eager=False)
        )
        row = per_vid.agg(
            F.count(F.when((F.col("p") == 1) & (F.col("c") == 1), 1)).alias("both"),
            F.count(F.when(F.col("lo_par") != F.col("hi_par"), 1)).alias("multi"),
            F.coalesce(F.sum("nc"), F.lit(0)).cast("long").alias("n_edges"),
        ).first()
        return row, per_vid

    def broadcast_fix(e, per_vid):
        """Bounded finisher for the sparse-violation tail. Late star
        rounds re-shuffle the whole ~|V|-row edge set to repair a
        handful of violations (measured at 1M pages: rounds 2-3 are
        full 3-4s rounds fixing both=4098/multi=536, then both=1).
        When every violating vertex fits a broadcast map, repair them
        directly: map each chain vertex (parent that is itself a
        child) and each non-min parent of a multi-parent child to its
        resolved minimum, transitively min-resolve that SMALL map on
        the driver (bounded by FIX_MAX_VIOLATIONS -- this is a map
        over violating vertices, never the edge set), and relabel the
        parent side of the big edge set with one broadcast join: a
        map-side pass, ZERO shuffle of the edge table. (relabeled_key,
        old_key) rows keep relabeled pure-root keys connected; the
        resulting duplicates are tolerated (see round_check).

        Returns the repaired edge frame, or None when the violation
        set exceeds the cap (caller falls back to a star round).
        """
        viol = (
            per_vid.where(
                ((F.col("p") == 1) & (F.col("c") == 1))
                | (F.col("lo_par") != F.col("hi_par"))
            )
            .select(
                "vid",
                "lo_par",
                ((F.col("p") == 1) & (F.col("c") == 1)).alias("is_both"),
                (F.col("lo_par") != F.col("hi_par")).alias("is_multi"),
            )
            .limit(FIX_MAX_VIOLATIONS + 1)
            .collect()
        )
        if len(viol) > FIX_MAX_VIOLATIONS:
            return None
        pmap: dict[int, int] = {}

        def _add(k: int, v: int) -> None:
            if v < pmap.get(k, k):
                pmap[k] = v

        for r in viol:
            if r["is_both"]:
                _add(int(r["vid"]), int(r["lo_par"]))
        multi_rows = [(int(r["vid"]), int(r["lo_par"])) for r in viol if r["is_multi"]]
        if multi_rows:
            mdf = spark.createDataFrame(multi_rows, "mvid long, mpar long")
            others = (
                e.join(F.broadcast(mdf), e.v == mdf.mvid)
                .where(F.col("u") != F.col("mpar"))
                .select("u", "mpar")
                .distinct()
                .limit(FIX_MAX_VIOLATIONS + 1)
                .collect()
            )
            if len(others) > FIX_MAX_VIOLATIONS:
                return None
            for r in others:
                _add(int(r["u"]), int(r["mpar"]))
        # transitive min-resolve with path compression; acyclic because
        # every value is strictly smaller than its key (parents < children)
        resolved: dict[int, int] = {}
        for k in pmap:
            path = []
            v = k
            while v in pmap and v not in resolved:
                path.append(v)
                v = pmap[v]
            root = resolved.get(v, v)
            for p in path:
                resolved[p] = root
        rdf = spark.createDataFrame(list(resolved.items()), "k long, t long")
        relabeled = e.join(F.broadcast(rdf), e.u == F.col("k"), "left").select(
            F.coalesce("t", F.col("u")).alias("u"), "v"
        )
        preserve = rdf.select(F.col("t").alias("u"), F.col("k").alias("v"))
        return relabeled.unionAll(preserve)

    rounds: list[dict] = []
    if stats is not None:
        stats["rounds"] = rounds
    import time as _time

    # previous round's (counts_row, per_vid frame): drives the
    # star-vs-broadcast-fix decision for the NEXT round. FIX_MAX_STREAK
    # caps consecutive fix rounds: each fix strictly shrinks every
    # touched vertex's parent, but its per-round progress bound is
    # structural, so a star round is forced periodically to retain the
    # O(log^2 n) worst-case guarantee.
    pending = None
    fix_streak = 0
    for it in range(start_iter, 0 if already_done else max_iter):
        _t0 = _time.time()
        kind = "star"
        fixed = None
        if pending is not None and fix_streak < FIX_MAX_STREAK:
            prow, per_vid = pending
            if prow["both"] + prow["multi"] > 0:
                fixed = broadcast_fix(e, per_vid)
                if fixed is not None:
                    kind = "fix"
        if kind == "fix":
            small = fixed
            fix_streak += 1
        else:
            fix_streak = 0
            # ---- large-star ----
            sym = e.select("u", "v").unionAll(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
            # NOTE: no intermediate distinct -- duplicates are harmless
            # to small-star (its min-aggregate is dup-insensitive and
            # the round ends in a distinct anyway) and the row count is
            # bounded by 2|e|; dropping the exchange is ~25% off the
            # round wall-clock.
            large = (
                sym.join(m, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("a"), F.col("m").alias("b"))
                .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
                .where(F.col("u") != F.col("v"))
            )
            # ---- small-star ----
            lo = large.select(F.col("v").alias("hi"), F.col("u").alias("lo"))
            m2 = lo.groupBy("hi").agg(F.min("lo").alias("m"))
            small = (
                lo.join(m2, "hi")
                .select(
                    F.col("lo").alias("a"), F.col("m").alias("b")
                )  # hang lo-neighbors on m
                .unionAll(
                    m2.select(F.col("hi").alias("a"), F.col("m").alias("b"))
                )  # hang hi on m
                .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct()
            )
        metrics = IterationMetrics(iteration=it)
        # stats-stripped: each round references e three times (the two
        # sym legs + round_check), which grows the propagated
        # sizeInBytes estimate ~3x per round into megabit BigIntegers —
        # see plans.checkpoint.strip_plan_stats
        new_e = strip_plan_stats(cp.checkpoint(small, metrics, lazy=True))
        e = new_e
        if it == start_iter == 0 and max_iter > 1:
            # a multi-edge graph never contracts to a star forest in
            # one round, so round 0's check is a wasted 2|E|-row
            # exchange over the LARGEST intermediate of the run --
            # skip it and let round 1's single action materialize
            # both rounds in one job. (A graph that WAS already a
            # star forest pays one extra cheap no-op round; round 0's
            # manifest carries no n_edges metric -- round 1's does.)
            # max_iter == 1 means this is the ONLY round: check and
            # finalize normally so a converged single-round run does
            # not leave an incomplete manifest.
            rounds.append(
                {"iteration": it, "kind": kind, "n_edges": None,
                 "secs": _time.time() - _t0}
            )
            continue
        row, per_vid = round_check(new_e)
        metrics.extra["n_edges"] = int(row["n_edges"])
        cp.update_metrics(metrics)
        rounds.append(
            {
                "iteration": it,
                "kind": kind,
                "n_edges": int(row["n_edges"]),
                "secs": _time.time() - _t0,
            }
        )
        if row["both"] == 0 and row["multi"] == 0:
            cp.finalize(it, metrics, state=new_e)
            break
        pending = (row, per_vid)
    # star forest: v (child) -> u (root/min); roots map to themselves
    child = e.select(F.col("v").alias("vid"), F.col("u").alias("component"))
    root = e.select(F.col("u").alias("vid"), F.col("u").alias("component")).distinct()
    return child.unionAll(root).groupBy("vid").agg(F.min("component").alias("component"))


def _min_label_propagation(
    vertices: DataFrame, edges: DataFrame, cp: CheckpointManager, max_iter: int
) -> DataFrame:
    spark = edges.sparkSession
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = vertices.select("vid", F.col("vid").alias("component"))
    labels = cp.truncate(labels)
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        labels = cp.truncate(state.select("vid", "component"))
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))
    for it in range(start_iter, 0 if already_done else max_iter):
        nbr_min = (
            sym.join(labels, sym.u == labels.vid)
            .groupBy("v")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vid == nbr_min.v, "left")
            .select(
                "vid",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
        )
        # NOTE: not lazy -- the changed-check below is a short-circuit
        # limit(1).count() that would leave the cache only partially
        # materialized.
        new_labels = cp.checkpoint(new_labels, IterationMetrics(iteration=it))
        changed = (
            new_labels.alias("n")
            .join(labels.select("vid", F.col("component").alias("old")), "vid")
            .where("component != old")
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            cp.finalize(it, state=labels)
            break
    sym.unpersist()
    return labels
