"""k-core decomposition: distributed h-index iteration.

The reference exposes only the Neptune Analytics algorithm set (no
k-core: /root/reference/nx_neptune/algorithms has pagerank/centrality/
community/traversal only); core decomposition is included as a core
link-graph extension in the same class as connected components /
triangle count (SURVEY.md §2.9) — coreness is the standard web-graph
measure of link-farm density and crawl-frontier priority.

Algorithm (Montresor, De Pellegrini, Miorandi, "Distributed k-Core
Decomposition", IEEE TPDS 24(2), 2013 — a published message-passing
formulation, not NetworkX's sequential peeling):

    c_0(v)     = deg(v)
    c_{t+1}(v) = min(c_t(v), H({c_t(u) : u ∈ N(v)}))

where H is the h-index (the largest h such that at least h neighbor
values are ≥ h). The sequence is monotonically non-increasing and its
fixpoint is exactly the core number of every vertex; NetworkX's
``nx.core_number`` (batagelj-zaversnik peeling) is the differential
test oracle (tests/test_kcore.py).

Semantics parity with ``nx.core_number``:

  * undirected graphs: simple-graph neighbor sets;
  * directed graphs: degree = in-degree + out-degree and every directed
    edge contributes its far endpoint once (so reciprocal pairs count
    twice), exactly NetworkX's G.degree on a DiGraph;
  * self-loops are rejected the way NetworkX rejects them
    (``nx.core_number`` raises on graphs with self-loops) unless
    ``drop_self_loops=True`` strips them first.

Plan per round (the scale story): one key-partitioned shuffle-hash join
(neighbor table ⨝ current cores on the neighbor key), one map-side-
combined (vid, neighbor-core) count aggregate, and one vid-partitioned
window over the GROUPED counts computing the h-index — so per-vid
window work is bounded by the number of distinct neighbor core values
(<= max-core), never by degree: a super-hub's 10^8 neighbor rows
collapse in the partial aggregate before any per-vid sort. The round
operates over a monotonically *shrinking* active set (vertices whose
core estimate is still moving, tracked exactly: a vertex's estimate can
only drop after a neighbor's dropped, so the join is restricted to
neighbors-of-last-round's-changed). Round count is bounded by the
longest strictly-decreasing estimate chain; on power-law web graphs
this is tens of rounds (Montresor §V measures <50 on billion-edge
graphs). No driver-side state beyond the per-round changed count.
"""

from __future__ import annotations

import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import (
    CheckpointManager,
    IterationMetrics,
    release_local_checkpoint,
    strip_plan_stats,
)


def _neighbor_table(graph: LinkGraph, drop_self_loops: bool) -> DataFrame:
    """(vid, nb): one row per incident edge endpoint.

    Directed graphs contribute both directions WITHOUT collapsing
    (NetworkX DiGraph degree semantics: reciprocal edges count twice);
    undirected graphs use the simple-graph symmetric view.
    """
    e = graph.edges.select("src", "dst")
    if drop_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    if graph.directed:
        return e.select(F.col("src").alias("vid"), F.col("dst").alias("nb")).unionAll(
            e.select(F.col("dst").alias("vid"), F.col("src").alias("nb"))
        )
    sym = (
        e.select("src", "dst")
        .unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    return sym.select(F.col("src").alias("vid"), F.col("dst").alias("nb"))


def core_number(
    graph: LinkGraph,
    max_iterations: int = 500,
    drop_self_loops: bool = False,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(vid long, core long): every vertex's core number.

    Runs the h-index iteration to its fixpoint (guaranteed to be the
    exact core decomposition); ``max_iterations`` is a safety cap — the
    fixpoint is always reached first on finite graphs.

    ``stats``: pass a dict to receive ``iterations`` (rounds run) and
    ``converged``.
    """
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    if not drop_self_loops:
        loops = graph.edges.where(F.col("src") == F.col("dst")).limit(1).count()
        if loops:
            raise ValueError(
                "core_number: graph has self-loops (NetworkX parity: "
                "nx.core_number raises); pass drop_self_loops=True to strip"
            )
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The neighbor table is SYMMETRIC by construction ((v,u) present iff
    # (u,v) is, both for the directed both-directions union and the
    # undirected symmetric view), so every per-round join below can key
    # on the pre-partitioned ``vid`` side: persisting ONE copy hash-
    # partitioned on vid removes the two full |2E|-row shuffles the loop
    # previously paid per round (guide §2.4 — share one exchange), and
    # neighbors-of-changed is read off the SAME copy (select nb where
    # vid ∈ changed ≡ select vid where nb ∈ changed).
    nbrs = (
        _neighbor_table(graph, drop_self_loops)
        .repartition(npart, "vid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    cp = checkpoint or CheckpointManager(spark, algorithm="core_number")
    deg = nbrs.groupBy("vid").agg(F.count("*").alias("core"))
    # every state/overlay leaf is stats-stripped: the round plan
    # references the state TWICE (cv + nc attach), which would square
    # the propagated sizeInBytes estimate each round — see
    # plans.checkpoint.strip_plan_stats for the measured blowup
    cores = strip_plan_stats(cp.truncate(
        vertices.join(deg, "vid", "left").select(
            "vid", F.coalesce("core", F.lit(0)).cast("long").alias("core")
        )
    ))
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        cores = strip_plan_stats(cp.truncate(state.select("vid", "core")))
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))

    iterations, converged = start_iter, already_done
    # h-index window over PRE-AGGREGATED (vid, nc) counts, not raw
    # neighbor rows: rows per vid are bounded by the number of DISTINCT
    # neighbor core values (<= max-core), not by degree — a 10^8-degree
    # hub's h-index sort would otherwise serialize in ONE task. The
    # (vid, nc) partial aggregate combines map-side, so the exchange
    # feeding this window carries ~|active|·distinct-values rows.
    w = (
        Window.partitionBy("vid")
        .orderBy(F.desc("nc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # active-set restriction: an estimate can only drop after a
    # NEIGHBOR's estimate dropped, so from round 1 on the h-index is
    # recomputed only for neighbors-of-last-round's-changed; everyone
    # else keeps their value via the coalesce below. After resume the
    # first round conservatively recomputes everything.
    n_verts = graph.num_vertices()
    changed_set: DataFrame | None = None
    n_changed = n_verts
    prev_cores: DataFrame | None = None
    # Small-tail overlay: once a round changes only a sliver of vertices
    # (≤ n/64), the V-row state stops being rewritten every round —
    # instead changed rows accumulate in a small persisted ``overrides``
    # table and the effective state is base ⊕ overrides (a left join the
    # planner serves as a broadcast/streamed overlay). The tail of the
    # fixpoint (many rounds, each touching a handful of vertices) then
    # pays NO V-row checkpoint write and NO V-row changed-detection join
    # per round. Durable-checkpoint runs keep the per-round state write
    # (that write is the durability contract).
    overrides: DataFrame | None = None
    n_overrides = 0
    overlay_ok = cp.checkpoint_dir is None
    round_log: list[dict] = []

    def _eff(base: DataFrame, over: DataFrame | None) -> DataFrame:
        if over is None:
            return base
        return base.join(
            over.select("vid", F.col("core").alias("__oc")), "vid", "left"
        ).select("vid", F.coalesce("__oc", "core").alias("core"))

    for it in range(start_iter, 0 if already_done else max_iterations):
        t_round = time.time()
        full = changed_set is None or n_changed * 4 >= n_verts
        overlay_round = (
            overlay_ok and not full and n_changed * 64 <= n_verts
        )
        if overlay_round and n_overrides * 16 > n_verts:
            # overlay grew past n/16: fold it into a fresh base so the
            # per-round overlay join stays a cheap broadcast. If the
            # overlay IS last round's changed frame (first-overlay-round
            # aliasing), leave its cache for the affected join below —
            # the round-top guard unpersists it next round.
            cores = strip_plan_stats(cp.truncate(_eff(cores, overrides)))
            if overrides is not changed_set:
                release_local_checkpoint(overrides)
            overrides, n_overrides = None, 0
        cur = _eff(cores, overrides)
        if full:
            # round 0, or a round where ≥25% of vertices just moved:
            # the affected-set restriction would touch nearly every
            # vertex anyway — skip its two joins and recompute all
            # (identical result: an unaffected vertex's h is unchanged
            # and least(core, h) == core for it)
            work = nbrs
        else:
            # neighbors-of-changed read off the vid-partitioned copy via
            # symmetry: {v : (v,c) ∈ nbrs} == {v : (c,v) ∈ nbrs}
            affected = (
                nbrs.join(changed_set, "vid")
                .select(F.col("nb").alias("vid"))
                .distinct()
            )
            work = nbrs.join(affected, "vid")
        # Cap each neighbor value at the vertex's OWN current core
        # before grouping: H(min(nc, cv)) == min(H(nc), cv) and the
        # update is least(cv, H), so the result is identical while all
        # neighbor values ≥ cv collapse into ONE group — a hub with
        # 10^5 neighbors but core 10 feeds ≤11 grouped rows into the
        # window instead of one per distinct neighbor core. The cv
        # attach joins on the pre-partitioned vid key (no exchange) and
        # rides through the aggregate (functionally dependent on vid),
        # so changed-detection below is a FILTER (h < cv), not a V-row
        # join against the old state.
        nb_vals = (
            work.join(cur.select("vid", F.col("core").alias("cv")), "vid")
            .join(
                cur.select(F.col("vid").alias("nb"), F.col("core").alias("nc0")),
                "nb",
            )
            .select("vid", "cv", F.least(F.col("nc0"), F.col("cv")).alias("nc"))
        )
        # h-index over grouped counts: with distinct neighbor values nc
        # sorted desc and c_ge = cumulative count of neighbor values
        # >= nc, H = max over nc of min(c_ge, nc) (the classic
        # "#values >= h reaches h" formulation evaluated only at the
        # distinct values, which is where the max is attained). The
        # final groupBy(vid) reuses the window's vid partitioning — no
        # extra exchange.
        h = (
            nb_vals.groupBy("vid", "nc")
            .agg(F.count("*").alias("cnt"), F.min("cv").alias("cv"))
            .withColumn("c_ge", F.sum("cnt").over(w))
            .groupBy("vid")
            .agg(
                F.max(F.least(F.col("c_ge"), F.col("nc"))).alias("h"),
                F.min("cv").alias("cv"),
            )
        )
        # exactly the rows whose estimate drops this round. A (lazy)
        # localCheckpoint, not a bare persist: the frame is consumed by
        # the NEXT round's logical plan (and by the overlay), and a
        # cached-but-untruncated plan would re-embed every prior round's
        # tree — exponential analysis cost. The leaf is materialized by
        # the count below.
        new_over = strip_plan_stats(
            h.where(F.col("h") < F.col("cv"))
            .select("vid", F.col("h").cast("long").alias("core"))
            .localCheckpoint(eager=False)
        )
        # ONE driver action per round: materializes the round's whole
        # chain (including any pending lazy base checkpoint) and counts
        n_changed = new_over.count()
        # NB: on the round after a first overlay round, changed_set IS
        # the overlay (aliased below) — its blocks must survive until
        # the overlay is merged away or folded, so skip the release then
        if changed_set is not None and changed_set is not overrides:
            release_local_checkpoint(changed_set)
        changed_set = new_over
        # two-rounds-ago base is now fully consumed: free its blocks
        if prev_cores is not None and prev_cores is not cores:
            release_local_checkpoint(prev_cores)
        prev_cores = None
        if n_changed == 0:
            iterations = it + 1
            round_log.append(
                {
                    "iter": it,
                    "secs": round(time.time() - t_round, 3),
                    "changed": 0,
                    "mode": "overlay" if overrides is not None else "full",
                }
            )
            converged = True
            if overrides is not None:
                cores = strip_plan_stats(cp.truncate(_eff(cores, overrides)))
                if overrides is not changed_set:
                    release_local_checkpoint(overrides)
                overrides, n_overrides = None, 0
            cp.finalize(it, state=cores)
            break
        if overlay_round:
            # fold the new changed rows into the overlay (latest wins)
            if overrides is None:
                # first overlay round: the changed rows ARE the overlay
                # (deliberately the same persisted frame as changed_set;
                # the unpersist guards above know about the aliasing)
                overrides = new_over
            else:
                merged = strip_plan_stats(new_over.unionByName(
                    overrides.join(new_over, "vid", "left_anti")
                ).localCheckpoint(eager=False))
                merged.count()  # tiny: reads two small checkpointed frames
                old_over = overrides
                overrides = merged
                if old_over is not changed_set:
                    release_local_checkpoint(old_over)
            n_overrides += n_changed
            mode = "overlay"
        else:
            # V-row state update from the (small) changed rows only;
            # lazy lineage cut — the NEXT round's count action (or the
            # eager fold at exit) materializes it
            base_src = cur if overrides is not None else cores
            new_cores = base_src.join(
                new_over.select("vid", F.col("core").alias("nc2")), "vid", "left"
            ).select("vid", F.coalesce("nc2", "core").alias("core"))
            # overlay→state transition must materialize EAGERLY: the new
            # state's lineage reads the overlay, which is unpersisted
            # right below
            new_cores = strip_plan_stats(cp.checkpoint(
                new_cores, IterationMetrics(iteration=it), lazy=overrides is None
            ))
            if overrides is not None:
                if overrides is not changed_set:
                    release_local_checkpoint(overrides)
                overrides, n_overrides = None, 0
            prev_cores = cores
            cores = new_cores
            mode = "full" if full else "active"
        iterations = it + 1
        round_log.append(
            {
                "iter": it,
                "secs": round(time.time() - t_round, 3),
                "changed": n_changed,
                "mode": mode,
            }
        )
        import os as _os, sys as _sys
        if _os.environ.get("NXS_KCORE_DEBUG"):
            print("DBG round", round_log[-1], file=_sys.stderr)

    else:
        # max_iterations exit: make sure the returned state is
        # materialized (and overlay folded) before caches are dropped
        if overrides is not None:
            cores = strip_plan_stats(cp.truncate(_eff(cores, overrides)))
            if overrides is not changed_set:
                release_local_checkpoint(overrides)
        else:
            cores = cp.truncate(cores)
    if changed_set is not None:
        release_local_checkpoint(changed_set)
    nbrs.unpersist()
    if stats is not None:
        stats.update(iterations=iterations, converged=converged, rounds=round_log)
    return cores


def k_core(
    graph: LinkGraph,
    k: int | None = None,
    core_numbers: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """Vertices of the k-core (max subgraph with min degree ≥ k):
    DataFrame(vid long, core long) filtered to core ≥ k.

    ``k=None`` returns the main core (maximum k with a non-empty
    k-core), NetworkX ``nx.k_core`` default. Pass ``core_numbers`` to
    reuse a computed decomposition.
    """
    cores = core_numbers if core_numbers is not None else core_number(graph, **kwargs)
    if k is None:
        return cores.crossJoin(F.broadcast(cores.agg(F.max("core").alias("mx")))).where(
            F.col("core") == F.col("mx")
        ).select("vid", "core")
    return cores.where(F.col("core") >= F.lit(int(k)))
