"""Single-source shortest paths (weighted): frontier Bellman-Ford.

The reference's traversal surface is BFS only
(/root/reference/nx_neptune/algorithms/traversal/bfs.py — bfs_edges /
bfs_layers / descendants_at_distance); weighted shortest paths is the
natural extension for link graphs carrying edge costs (latency,
toll, -log(probability)). NetworkX's
``nx.single_source_dijkstra_path_length`` is the differential oracle
(tests/test_sssp.py); for non-negative weights the Bellman-Ford
fixpoint equals Dijkstra's result.

Algorithm: label-correcting relaxation with an exact frontier — only
vertices whose tentative distance improved last round propagate:

    d_0 = {source: 0}
    cand_k = frontier_{k-1} ⨝ edges → (dst, d+w)
    d_k    = min(d_{k-1}, min cand_k)       (per vertex)
    frontier_k = {v : d_k(v) < d_{k-1}(v)}

Unreachable vertices never enter the state (the distance table stays
sparse, NetworkX dict-of-reached parity). Round count = longest
shortest-path hop count (graph "hop diameter" from the source), the
standard distributed SSSP bound.

Plan per round (the scale story): one key-partitioned shuffle-hash
join (frontier ⨝ edges on src) + one partial-agg exchange (min per
dst) + a full-outer merge with the persisted distance table — the
frontier SHRINKS toward convergence so late rounds touch a vanishing
edge subset, unlike a naive full-table Bellman-Ford whose every round
re-relaxes all |E| edges. ``check_every`` batches rounds into one lazy
block with a single emptiness action per block (the PageRank blocked
device); distances already at fixpoint are unaffected by extra rounds,
so blocked mode is exact, not approximate.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import release_local_checkpoint, strip_plan_stats
from ..session import adaptive_disabled


def shortest_path_lengths(
    graph: LinkGraph,
    source: int,
    weight: str | None = "weight",
    max_iterations: int = 10_000,
    check_every: int = 4,
    validate_nonnegative: bool = True,
    disable_adaptive: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Return DataFrame(vid long, distance double) for REACHED vertices
    (``nx.single_source_dijkstra_path_length`` dict parity; unreachable
    vertices are absent, the source has distance 0.0).

    ``weight``: edge-weight column; absent column / None → hop counts
    (then this is BFS-by-relaxation and ``bfs.bfs_levels`` is the
    cheaper plan). Negative weights are rejected up front when
    ``validate_nonnegative`` (one tiny aggregate) — the relaxation
    fixpoint is still correct for negative edges without negative
    cycles, but then equals Bellman-Ford, not Dijkstra, and the
    round-count bound degrades to |V|-1; flip the flag off only if you
    know that's what you want. ``stats`` receives ``rounds`` and
    ``converged``.
    """
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _sssp_impl(
            graph,
            source,
            weight,
            max_iterations,
            check_every,
            validate_nonnegative,
            stats,
        )


def _sssp_impl(
    graph: LinkGraph,
    source: int,
    weight: str | None,
    max_iterations: int,
    check_every: int,
    validate_nonnegative: bool,
    stats: dict | None,
) -> DataFrame:
    spark = graph.spark
    edges = graph.symmetric_edges()
    if weight is not None and weight in edges.columns:
        links = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        links = edges.select("src", "dst", F.lit(1.0).alias("w"))
    if validate_nonnegative:
        neg = links.where(F.col("w") < 0).limit(1).count()
        if neg:
            raise ValueError(
                "shortest_path_lengths: negative edge weight found; "
                "pass validate_nonnegative=False to run label-correcting "
                "Bellman-Ford anyway (no negative cycles allowed)"
            )
    # pre-partitioned on src: the per-round relaxation join keys on src,
    # so one up-front shuffle of the edge table replaces one per round
    # (guide §2.4); the shuffle_hash hint streams the pre-partitioned
    # links side with no per-round sort
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    links = links.repartition(npart, "src").persist(StorageLevel.MEMORY_AND_DISK)

    dist = spark.createDataFrame([(int(source), 0.0)], "vid long, distance double")
    dist = dist.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = dist
    rounds, converged = 0, False
    check_every = max(1, int(check_every))
    prev_final = None
    while rounds < max_iterations and not converged:
        block = min(check_every, max_iterations - rounds)
        # one lazy block of `block` relaxation rounds; distances at
        # fixpoint are invariant under extra rounds, so overshooting
        # inside a block never changes the result
        new_dist, new_frontier = dist, frontier
        block_frames = []
        for _ in range(block):
            cand = (
                links.join(
                    new_frontier.select(
                        F.col("vid").alias("src"), F.col("distance").alias("d")
                    ).hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
            )
            merged = (
                new_dist.join(cand, "vid", "full_outer")
                .select(
                    "vid",
                    F.least(
                        F.coalesce("distance", F.lit(float("inf"))),
                        F.coalesce("nd", F.lit(float("inf"))),
                    ).alias("distance"),
                    (
                        F.col("nd").isNotNull()
                        & (
                            F.col("distance").isNull()
                            | (F.col("nd") < F.col("distance"))
                        )
                    ).alias("improved"),
                )
                .localCheckpoint(eager=False)
            )
            block_frames.append(merged)
            if len(block_frames) == block:
                # stats reset once per block: merged is referenced TWICE
                # per round (next dist + frontier), which squares the
                # propagated sizeInBytes estimate — see
                # plans.checkpoint.strip_plan_stats. Stripping only the
                # block's last frame bounds the growth while keeping the
                # vid partitioning within the block.
                merged = strip_plan_stats(merged)
            new_frontier = merged.where("improved").select("vid", "distance")
            new_dist = merged.select("vid", "distance")
        # ONE action per block: materializes every pending checkpoint in
        # the block's chain and probes frontier emptiness
        n_improved = new_frontier.limit(1).count()
        # intra-block intermediates are fully consumed by the final
        # frame's materialization: free their blocks now
        for fr in block_frames[:-1]:
            release_local_checkpoint(fr)
        if prev_final is not None:
            release_local_checkpoint(prev_final)
        prev_final = block_frames[-1] if block_frames else None
        dist, frontier = new_dist, new_frontier
        rounds += block
        if n_improved == 0:
            converged = True
    links.unpersist()
    if stats is not None:
        stats.update(rounds=rounds, converged=converged)
    return dist.select("vid", "distance")
