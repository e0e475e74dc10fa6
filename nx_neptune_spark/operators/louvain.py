"""Distributed Louvain community detection.

Reference surface: /root/reference/nx_neptune/algorithms/community/
louvain.py:46-148 (params maxLevels, iterationTolerance, levelTolerance,
edgeWeight*, maxIterations; `resolution`/`seed` unsupported there,
louvain.py:96). Louvain's sequential node-by-node moving does not
distribute, so this is the standard synchronous/parallel variant
(Prat-Pérez et al.-style): per sweep every node computes its best
neighbor community by modularity gain and nodes move in alternating
vid-parity half-steps (damps the two-community oscillation that pure
synchronous moving exhibits); after local moving converges, communities
are contracted to super-nodes and the process repeats per level.

Deterministic: gain ties break to the smaller community id; no RNG.
Quality is validated in tests against NetworkX's modularity of its own
(sequential) Louvain -- parallel Louvain is an approximation, but must
land within a few percent of sequential modularity.

Each sweep is two joins + two aggregations (all key-partitioned);
contraction is one groupBy per level. Scale shape matches PageRank:
no driver-side per-node state.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, IterationMetrics


def _level_state(mapping: DataFrame, edges: DataFrame) -> DataFrame:
    """Tagged union of the two per-level state frames for durable
    checkpointing: ('m', vid, node, null) + ('e', src, dst, w)."""
    m = mapping.select(
        F.lit("m").alias("kind"),
        F.col("vid").alias("a"),
        F.col("node").alias("b"),
        F.lit(None).cast("double").alias("w"),
    )
    e = edges.select(
        F.lit("e").alias("kind"),
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("w"),
    )
    return m.unionByName(e)


def _split_level_state(state: DataFrame) -> tuple[DataFrame, DataFrame]:
    mapping = state.where(F.col("kind") == "m").select(
        F.col("a").alias("vid"), F.col("b").alias("node")
    )
    edges = state.where(F.col("kind") == "e").select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    )
    return mapping, edges


def louvain_communities(
    graph: LinkGraph,
    weight: str | None = "weight",
    max_levels: int = 5,
    max_iterations: int = 10,
    iteration_tolerance: float = 0.0,
    level_tolerance: float = 0.0,
    resolution: float = 1.0,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Returns DataFrame(vid long, community long).

    Community ids are the minimum original vid contained in the
    community (deterministic representative).

    ``resolution`` is the γ of generalized modularity
    Q = intra/2m − γ·Σ(σ_c/2m)² (Reichardt–Bornholdt): γ > 1 favors
    more, smaller communities; γ < 1 fewer, larger ones. The reference
    warns-unsupported here (louvain.py:96, a Neptune Analytics
    limitation) — this engine supports it natively by scaling the
    σ-term in every local-moving gain and in both tolerance
    modularity evaluations. Default 1.0 = classic modularity,
    identical to the pre-resolution behavior.

    ``iteration_tolerance`` (reference threshold -> iterationTolerance,
    louvain.py:101-102): stop a level's local-moving sweeps when the
    modularity gain of a sweep falls below it. ``level_tolerance``
    (louvain.py:59,81): stop adding levels when the modularity gain
    between two levels falls below it. Both default to 0.0 = off
    (structural convergence only), matching warn-free acceptance of the
    reference's parameter surface.

    Durable checkpoint/resume (reference snapshot analog,
    instance_management.py:460-517) at LEVEL granularity: after each
    completed level the (mapping, contracted-edges) pair is written as
    one tagged-union state frame with the level number and running
    modularity in the manifest; a killed run resumes at the next level.
    Convergence (not budget exhaustion) finalizes the run with the
    final (vid, community) frame, which a resumed call returns
    directly. ``max_levels`` exhaustion deliberately does NOT finalize
    — like pagerank's fixed_iterations, running out of budget is the
    resume scenario, so the manifest stays incomplete and a follow-up
    call with a larger budget continues mid-run.
    """
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="louvain")
    durable = cp.checkpoint_dir is not None
    base = graph.symmetric_edges()
    if weight is not None and weight in base.columns:
        edges = base.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        edges = base.select("src", "dst", F.lit(1.0).alias("w"))
    edges = edges.where(F.col("src") != F.col("dst"))

    # mapping: original vid -> current super-node
    mapping = graph.vertices.select("vid", F.col("vid").alias("node"))
    mapping = cp.truncate(mapping)

    prev_q: float | None = None
    start_level = 0
    if durable:
        resumed = cp.resume()
        if resumed is not None:
            state, manifest = resumed
            if manifest.get("complete"):
                # finalize() stores the final (vid, community) result
                return state.select("vid", "community")
            mapping, edges = _split_level_state(state)
            start_level = int(manifest["metrics"]["iteration"]) + 1
            pq = manifest["metrics"].get("prev_q")
            prev_q = float(pq) if pq is not None else None

    converged = False
    completed = start_level  # levels durably checkpointed so far
    for _level in range(start_level, max_levels):
        edges = cp.truncate(edges)
        comm = _local_moving(edges, cp, max_iterations, iteration_tolerance, resolution)
        if level_tolerance > 0.0:
            two_m = edges.agg(F.sum("w")).first()[0] or 1.0
            deg = edges.groupBy("src").agg(F.sum("w").alias("k")).withColumnRenamed(
                "src", "vid"
            )
            q = _modularity(edges, comm, deg, float(two_m), resolution)
            if prev_q is not None and q - prev_q < level_tolerance:
                converged = True
                break
            prev_q = q
        # did anything merge?
        n_nodes = edges.select(F.col("src").alias("n")).unionAll(
            edges.select(F.col("dst"))
        ).distinct().count()
        n_comms = comm.select("c").distinct().count()
        comm_renamed = comm.select(F.col("vid").alias("cnode"), "c")
        mapping = cp.truncate(
            mapping.join(comm_renamed, mapping.node == comm_renamed.cnode, "left")
            .select("vid", F.coalesce("c", F.col("node")).alias("node"))
        )
        if n_comms >= n_nodes:
            converged = True
            break
        # contract: communities become super-nodes; intra-community mass
        # becomes a self-loop (2x internal weight in the symmetric
        # representation) -- dropping it would let upper levels merge
        # dense communities as if they were hollow
        edges = (
            edges.join(comm.select(F.col("vid").alias("src"), F.col("c").alias("cs")), "src")
            .join(comm.select(F.col("vid").alias("dst"), F.col("c").alias("cd")), "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        if edges.where(F.col("src") != F.col("dst")).isEmpty():
            converged = True
            break
        if durable:
            state = cp.checkpoint(
                _level_state(mapping, edges),
                IterationMetrics(iteration=_level, extra={"prev_q": prev_q}),
            )
            mapping, edges = _split_level_state(state)
            completed = _level + 1

    # canonical community id = min original vid in community
    rep = mapping.groupBy("node").agg(F.min("vid").alias("community"))
    result = mapping.join(rep, "node").select("vid", "community")
    if durable and converged:
        # `completed` never carries a level-union manifest (breaks fire
        # before that level's end-of-body checkpoint), so finalize gets
        # a fresh iter dir and stores the final result frame there
        result = cp.truncate(result)
        cp.finalize(completed, IterationMetrics(iteration=completed), state=result)
    return result


def _modularity(
    edges: DataFrame,
    comm: DataFrame,
    deg: DataFrame,
    two_m: float,
    resolution: float = 1.0,
) -> float:
    """Q = intra/2m - γ·sum_c (sigma_c/2m)^2 over the symmetric
    (double-counted) edge representation; self-loop rows carry the full
    both-direction internal mass, so Q is invariant under contraction."""
    cs = comm.select(F.col("vid").alias("src"), F.col("c").alias("cs"))
    cd = comm.select(F.col("vid").alias("dst"), F.col("c").alias("cd"))
    intra = (
        edges.join(cs, "src").join(cd, "dst").where(F.col("cs") == F.col("cd"))
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)))
        .first()[0]
    )
    sigma_sq = (
        comm.join(deg, "vid")
        .groupBy("c")
        .agg(F.sum("k").alias("sigma"))
        .agg(F.coalesce(F.sum(F.col("sigma") * F.col("sigma")), F.lit(0.0)))
        .first()[0]
    )
    return float(intra) / two_m - resolution * float(sigma_sq) / (two_m * two_m)


def _local_moving(
    edges: DataFrame,
    cp: CheckpointManager,
    max_iterations: int,
    iteration_tolerance: float = 0.0,
    resolution: float = 1.0,
) -> DataFrame:
    """One level of parallel local moving. edges: symmetric (src,dst,w).
    Returns (vid, c)."""
    spark = edges.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame([], "vid long, c long")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy("src").agg(F.sum("w").alias("k")).withColumnRenamed("src", "vid")
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    two_m = edges.agg(F.sum("w")).first()[0]  # = 2m (sym edges)
    comm = cp.truncate(deg.select("vid", F.col("vid").alias("c")))

    q_prev: float | None = None
    prev_comm = comm  # assignment at the last evaluated pair boundary
    for it in range(max_iterations):
        sigma = (
            comm.join(deg, "vid").groupBy("c").agg(F.sum("k").alias("sigma"))
        )
        # weight from each node to each neighboring community; a node's
        # self-loop moves with it, so it never counts toward k_in
        k_in = (
            edges.where(F.col("src") != F.col("dst"))
            .join(comm.select(F.col("vid").alias("dst"), F.col("c").alias("nc")), "dst")
            .groupBy(F.col("src").alias("vid"), F.col("nc").alias("cand"))
            .agg(F.sum("w").alias("k_in"))
        )
        state = comm.join(deg, "vid")
        # candidate gain: k_in(c) - γ*k*sigma'(c)/(2m), sigma' excludes
        # self when evaluating the current community (γ = resolution)
        cands = (
            k_in.join(state, "vid")
            .join(sigma.withColumnRenamed("c", "cand"), "cand")
            .select(
                "vid",
                "cand",
                "c",
                "k",
                (
                    F.col("k_in")
                    - F.lit(resolution)
                    * F.col("k")
                    * (
                        F.col("sigma")
                        - F.when(F.col("cand") == F.col("c"), F.col("k")).otherwise(0.0)
                    )
                    / F.lit(two_m)
                ).alias("gain"),
            )
        )
        # include "stay" option explicitly for isolated-in-community nodes
        stay = (
            state.join(sigma, "c")
            .select(
                "vid",
                F.col("c").alias("cand"),
                "c",
                "k",
                (
                    -F.lit(resolution)
                    * F.col("k")
                    * (F.col("sigma") - F.col("k"))
                    / F.lit(two_m)
                ).alias("gain"),
            )
        )
        best = (
            cands.unionByName(stay)
            .groupBy("vid")
            .agg(
                F.max(F.struct(F.col("gain"), (-F.col("cand")).alias("nc"))).alias("b"),
                F.first("c").alias("c_old"),
            )
            .select(
                "vid",
                F.col("c_old"),
                (-F.col("b.nc")).cast("long").alias("c_new"),
            )
        )
        # alternating parity: only half the nodes move per sweep
        move_ok = (F.col("vid") % 2) == (it % 2)
        new_comm = best.select(
            "vid",
            F.when(move_ok, F.col("c_new")).otherwise(F.col("c_old")).alias("c"),
        )
        new_comm = cp.truncate(new_comm)
        changed = (
            new_comm.join(comm.withColumnRenamed("c", "old"), "vid")
            .where("c != old")
            .limit(1)
            .count()
        )
        comm = new_comm
        if changed == 0 and it % 2 == 1:  # both parities settled
            break
        # reference iterationTolerance: stop local moving when the
        # modularity gain drops below the threshold. Evaluated only at
        # PARITY-PAIR boundaries (odd it): a single sweep moves only
        # vid%2 == it%2 nodes, so a marginal even-parity sweep says
        # nothing about the odd parity's pending gains — NX threshold
        # semantics assume a full pass over all nodes. One modularity
        # action per pair (the pair-end value carries over as the next
        # pair's baseline), not two per sweep.
        if iteration_tolerance > 0.0 and it % 2 == 1:
            q_now = _modularity(edges, comm, deg, float(two_m), resolution)
            if q_prev is not None and q_now - q_prev < iteration_tolerance:
                if q_now < q_prev:
                    # parity-damped synchronous moving can oscillate;
                    # a modularity-DECREASING pair is never kept
                    comm = prev_comm
                break
            q_prev = q_now
            prev_comm = comm
    edges.unpersist()
    deg.unpersist()
    return comm
