"""Strongly connected components (directed; NetworkX parity).

The engine's components.py handles the UNDIRECTED case (the
reference's connected-components dispatch); for a directed web graph
the strongly-connected decomposition is the structural headline —
Broder et al. 2000's "bowtie" (giant SCC + IN + OUT + tendrils) is
defined by it. NetworkX `strongly_connected_components` is the
differential oracle; `scc_id` is the minimum vid of each component
(the deterministic min-representative convention components.py uses).

Algorithm: multi-pivot Forward-Backward with trimming (the
distributed FW-BW-Trim family: Fleischer-Hendrickson-Pinar 2000;
Slota-Rajamanickam-Madduri IPDPS 2014 multistep; Hong-Rodia-Olukotun
PPoPP 2013). Per outer round, over the still-active subgraph:

  trim:  vertices with active in-degree 0 or out-degree 0 are
         singleton SCCs — peel them iteratively (kills the DAG tail
         fast; on web graphs most vertices outside the giant SCC
         trim away)
  fwd(v) = min label over {v} ∪ ancestors(v)      (label = vid)
  bwd(v) = min label over {v} ∪ descendants(v)
  identify: fwd(v) == bwd(v) == p  ⟺  p reaches v AND v reaches p
         ⟺ v ∈ SCC(p), and anc(v) ∩ desc(v) = SCC(v), so p is the
         SCC minimum — every vertex whose SCC-min is a double-cone
         minimum resolves this round (always including the SCC of
         the globally smallest active vid, so progress is guaranteed)

Both label propagations are SPARSE-frontier Bellman-Ford over 0-cost
edges (the sssp.py device): only vertices whose label improved last
round propagate, so late rounds touch a vanishing edge subset, and
``check_every`` batches rounds into one lazy block with a single
emptiness action. Propagation depth = active-subgraph diameter
(~log n on web graphs).

Plan per inner round (the scale story): one key-partitioned
shuffle-hash join (frontier ⨝ edges) + one partial-agg min exchange +
a full-outer merge — identical exchange budget to SSSP. Outer rounds
shrink the active edge set monotonically; no driver-side state beyond
loop counters and one-row emptiness probes.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..session import adaptive_disabled


def _min_label_fixpoint(
    spark,
    vertices: DataFrame,
    links: DataFrame,
    out_col: str,
    max_iterations: int,
    check_every: int,
) -> DataFrame:
    """min-label closure: lab(v) = min vid over {v} ∪ ancestors(v)
    following ``links`` (src -> dst). Sparse changed-only frontier."""
    lab = vertices.select("vid", F.col("vid").alias("lab"))
    lab = lab.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = lab
    rounds = 0
    while rounds < max_iterations:
        block = min(max(1, check_every), max_iterations - rounds)
        new_lab, new_frontier = lab, frontier
        for _ in range(block):
            cand = (
                links.join(
                    new_frontier.select(
                        F.col("vid").alias("src"), F.col("lab").alias("l")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.min("l").alias("nl"))
            )
            merged = (
                new_lab.join(cand, "vid", "left")
                .select(
                    "vid",
                    F.least("lab", F.coalesce("nl", F.col("lab"))).alias("lab"),
                    (F.col("nl").isNotNull() & (F.col("nl") < F.col("lab"))).alias(
                        "improved"
                    ),
                )
                .localCheckpoint(eager=False)
            )
            new_frontier = merged.where("improved").select("vid", "lab")
            new_lab = merged.select("vid", "lab")
        new_lab = new_lab.persist(StorageLevel.MEMORY_AND_DISK)
        new_frontier = new_frontier.persist(StorageLevel.MEMORY_AND_DISK)
        n_improved = new_frontier.limit(1).count()
        lab.unpersist()
        frontier.unpersist()
        lab, frontier = new_lab, new_frontier
        rounds += block
        if n_improved == 0:
            break
    frontier.unpersist()
    out = lab.select("vid", F.col("lab").alias(out_col))
    return out


def strongly_connected_components(
    graph: LinkGraph,
    max_rounds: int = 64,
    max_label_iterations: int = 10_000,
    check_every: int = 4,
    disable_adaptive: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, scc_id long): scc_id = min vid of the
    strongly connected component (``nx.strongly_connected_components``
    set parity via grouping on scc_id)."""
    spark = graph.spark
    with adaptive_disabled(spark, disable_adaptive):
        return _scc(
            graph, max_rounds, max_label_iterations, check_every, stats
        )


def _scc(graph, max_rounds, max_label_iterations, check_every, stats):
    spark = graph.spark
    done_parts: list[DataFrame] = []
    active_v = graph.vertices.select("vid").persist(StorageLevel.MEMORY_AND_DISK)
    active_e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rounds = trim_rounds = 0
    while rounds < max_rounds:
        # ---- trim: peel in-degree-0 / out-degree-0 singleton SCCs
        while True:
            has_out = active_e.select(F.col("src").alias("vid")).distinct()
            has_in = active_e.select(F.col("dst").alias("vid")).distinct()
            core = has_out.join(has_in, "vid", "left_semi")
            trimmed = active_v.join(core, "vid", "left_anti")
            trimmed = trimmed.persist(StorageLevel.MEMORY_AND_DISK)
            if trimmed.isEmpty():
                trimmed.unpersist()
                break
            trim_rounds += 1
            done_parts.append(
                trimmed.select("vid", F.col("vid").alias("scc_id"))
                .localCheckpoint(eager=True)
            )
            # eager localCheckpoint on BOTH: per-round lineage cuts are
            # load-bearing in iterative plans (ktruss.py's 5^rounds
            # Catalyst re-analysis lesson)
            new_v = (
                active_v.join(trimmed, "vid", "left_anti")
                .localCheckpoint(eager=True)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_e = (
                active_e.join(
                    trimmed.select(F.col("vid").alias("src")), "src", "left_anti"
                )
                .join(trimmed.select(F.col("vid").alias("dst")), "dst", "left_anti")
                .localCheckpoint(eager=True)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            active_v.unpersist()
            active_e.unpersist()
            trimmed.unpersist()
            active_v, active_e = new_v, new_e
        if active_v.isEmpty():
            break
        # ---- forward / backward min-label closures on the active core
        fwd = _min_label_fixpoint(
            spark, active_v, active_e, "f", max_label_iterations, check_every
        )
        bwd = _min_label_fixpoint(
            spark,
            active_v,
            active_e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            "b",
            max_label_iterations,
            check_every,
        )
        marked = fwd.join(bwd, "vid").localCheckpoint(eager=True)
        ident = marked.where(F.col("f") == F.col("b")).select(
            "vid", F.col("f").alias("scc_id")
        )
        # the SCC of the globally smallest active vid always
        # identifies, so ident is non-empty here
        done_parts.append(ident.localCheckpoint(eager=True))
        new_v = (
            active_v.join(ident, "vid", "left_anti")
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_e = (
            active_e.join(
                ident.select(F.col("vid").alias("src")), "src", "left_anti"
            )
            .join(ident.select(F.col("vid").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        empty = new_v.isEmpty()
        active_v.unpersist()
        active_e.unpersist()
        active_v, active_e = new_v, new_e
        rounds += 1
        if empty:
            break
    leftover = not active_v.isEmpty()
    if leftover:
        raise RuntimeError(
            f"strongly_connected_components did not resolve within "
            f"{max_rounds} FW-BW rounds (pathological SCC chain); raise "
            "max_rounds"
        )
    active_v.unpersist()
    active_e.unpersist()
    if stats is not None:
        stats.update(rounds=rounds, trim_rounds=trim_rounds)
    if not done_parts:
        return spark.createDataFrame([], "vid long, scc_id long")
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def number_strongly_connected_components(graph: LinkGraph, **kw) -> int:
    return (
        strongly_connected_components(graph, **kw)
        .select("scc_id")
        .distinct()
        .count()
    )
