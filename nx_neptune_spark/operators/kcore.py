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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, IterationMetrics


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
    nbrs = _neighbor_table(graph, drop_self_loops).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    cp = checkpoint or CheckpointManager(spark, algorithm="core_number")
    deg = nbrs.groupBy("vid").agg(F.count("*").alias("core"))
    cores = cp.truncate(
        vertices.join(deg, "vid", "left").select(
            "vid", F.coalesce("core", F.lit(0)).cast("long").alias("core")
        )
    )
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        cores = cp.truncate(state.select("vid", "core"))
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
    changed_set: DataFrame | None = None
    for it in range(start_iter, 0 if already_done else max_iterations):
        if changed_set is None:
            work = nbrs
        else:
            affected = (
                nbrs.join(changed_set.select(F.col("vid").alias("nb")), "nb")
                .select("vid")
                .distinct()
            )
            work = nbrs.join(affected, "vid")
        nb_vals = work.join(
            cores.select(F.col("vid").alias("nb"), F.col("core").alias("nc")), "nb"
        ).select("vid", "nb", "nc")
        # h-index over grouped counts: with distinct neighbor values nc
        # sorted desc and c_ge = cumulative count of neighbor values
        # >= nc, H = max over nc of min(c_ge, nc) (the classic
        # "#values >= h reaches h" formulation evaluated only at the
        # distinct values, which is where the max is attained). The
        # final groupBy(vid) reuses the window's vid partitioning — no
        # extra exchange.
        h = (
            nb_vals.groupBy("vid", "nc")
            .agg(F.count("*").alias("cnt"))
            .withColumn("c_ge", F.sum("cnt").over(w))
            .groupBy("vid")
            .agg(F.max(F.least(F.col("c_ge"), F.col("nc"))).alias("h"))
        )
        # coalesce(h, core): vertices outside the recomputed set keep
        # their value; round-0 isolated vertices have core=deg=0 already
        new_cores = (
            cores.join(h, "vid", "left")
            .select(
                "vid",
                F.least(F.col("core"), F.coalesce(F.col("h"), F.col("core"))).alias(
                    "core"
                ),
            )
        )
        new_cores = cp.checkpoint(new_cores, IterationMetrics(iteration=it))
        new_changed = (
            new_cores.join(cores.select("vid", F.col("core").alias("old")), "vid")
            .where("core != old")
            .select("vid")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_changed = new_changed.count()
        if changed_set is not None:
            changed_set.unpersist()
        changed_set = new_changed
        cores = new_cores
        iterations = it + 1
        if n_changed == 0:
            converged = True
            cp.finalize(it, state=cores)
            break
    if changed_set is not None:
        changed_set.unpersist()
    nbrs.unpersist()
    if stats is not None:
        stats.update(iterations=iterations, converged=converged)
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
