"""Betweenness centrality: batched multi-source Brandes.

The reference's centrality surface is degree + closeness
(/root/reference/nx_neptune/algorithms/centrality/); betweenness is the
classic third member and the standard web-graph "bridge page" measure.
Semantics follow NetworkX exactly (``nx.betweenness_centrality`` /
``nx.betweenness_centrality_subset``): Brandes' algorithm (Brandes
2001, "A faster algorithm for betweenness centrality") — per source s,
a forward BFS computes shortest-path counts σ_s(v) and levels, a
backward sweep accumulates dependencies

    δ_s(v) = Σ_{w : (v,w)∈DAG_s} σ_s(v)/σ_s(w) · (1 + δ_s(w))

and bc(v) = Σ_s δ_s(v). Unweighted paths only (NetworkX's default
``weight=None``); ``sources`` selects pivots — NetworkX's ``k=``
sampling with a deterministic pivot list instead of a random seed
(the reference's own pattern is to drop randomized semantics:
label_propagation.py warns-and-ignores ``seed``). With
``sources=None`` every vertex is a pivot (exact betweenness — O(V·E),
loud at scale like closeness's exact mode).

Rescaling matches NetworkX ``_rescale``: normalized →
1/((n−1)(n−2)); unnormalized undirected → 1/2; sampling with
|sources|=κ < n multiplies by n/κ.

Plan (the scale story): ALL pivots run in ONE batched state
DataFrame keyed (s, vid) — each forward level is one
frontier ⨝ edges join + one (s,dst) partial-agg + one anti-join
against the visited set; each backward level joins the level's states
with the next level's (state+δ) through the edge table. Level count =
BFS diameter from the pivots; per-level frames are persisted and the
DAG is never materialized edge-by-edge driver-side. Pivot count scales
the state linearly — κ pivots on 10^12 edges is κ interleaved BFS
waves sharing every shuffle.
"""

from __future__ import annotations

import time
import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import release_local_checkpoint
from ..session import adaptive_disabled
from .bfs import _traversal_edges


def _forward_levels(
    edges: DataFrame,
    pivots: DataFrame,
    n_pivots: int,
    max_depth: int | None,
    stats: dict | None = None,
) -> tuple[list[DataFrame], list[int], int]:
    """Batched Brandes forward sweep: per-level (s, vid, sigma) frames.

    Memory accounting: every reached (s, v) pair lives in EXACTLY one
    level, so the retained forward state is Σ level sizes = |visited|
    ≈ pivots × reached-vertices rows — held twice (levels + the
    visited anti-join table) until visited is released right before
    returning, then shrinking as the backward sweep frees each
    consumed level's checkpoint blocks."""
    levels: list[DataFrame] = []
    level_rows: list[int] = []
    level_log: list[dict] | None = None if stats is None else []
    frontier = pivots.select(
        "s", F.col("s").alias("vid"), F.lit(1.0).alias("sigma"),
        F.lit(0).cast("long").alias("npred"),
    ).localCheckpoint(eager=True)
    levels.append(frontier)
    level_rows.append(n_pivots)
    depth = 0
    while True:
        if max_depth is not None and depth >= max_depth:
            break
        t_level = time.time()
        # visited = lazy union of the (checkpointed) level frames: the
        # anti-join scans the same Σ|levels| rows a maintained visited
        # table would, without the per-level persist+count action that
        # RE-COPIED the whole visited set every level (O(depth ·
        # Σ levels) cache writes → O(Σ levels) total)
        visited = levels[0].select("s", "vid")
        for lv in levels[1:]:
            visited = visited.unionByName(lv.select("s", "vid"))
        nxt = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.vid)
            .groupBy("s", F.col("dst").alias("vid"))
            # npred = BFS-DAG in-degree (load centrality's equal-split
            # denominator); betweenness ignores it
            .agg(F.sum("sigma").alias("sigma"), F.count("*").alias("npred"))
            .join(visited, ["s", "vid"], "left_anti")
            .localCheckpoint(eager=False)
        )
        # ONE action per level: materializes the lazy checkpoint + counts
        n_rows = nxt.count()
        if n_rows == 0:
            release_local_checkpoint(nxt)
            break
        depth += 1
        levels.append(nxt)
        level_rows.append(n_rows)
        if level_log is not None:
            level_log.append(
                {"level": depth, "secs": round(time.time() - t_level, 3),
                 "rows": n_rows}
            )
        frontier = nxt
    if stats is not None and level_log is not None:
        stats["forward_levels"] = level_log
    return levels, level_rows, depth


def betweenness_centrality(
    graph: LinkGraph,
    sources: list[int] | None = None,
    normalized: bool = True,
    weight: str | None = None,
    endpoints: bool = False,
    max_depth: int | None = None,
    stats: dict | None = None,
    disable_adaptive: bool = True,
) -> DataFrame:
    """Return DataFrame(vid long, betweenness double) over ALL vertices
    (zeros included, NetworkX dict parity).

    ``sources=None`` = exact (every vertex a pivot). ``weight`` and
    ``endpoints`` are warn-and-ignored when non-default (NetworkX
    betweenness supports them; this engine ships the unweighted
    non-endpoint form — the reference's warn-and-ignore pattern for
    unsupported parameters). ``stats`` receives ``levels`` (forward
    BFS depth) and ``pivots``.

    ``disable_adaptive``: the per-level plans have a statically known
    shape (pre-partitioned SHJ + small exchanges), so AQE re-planning
    is pure per-stage latency here — the same trade PageRank makes.
    """
    with adaptive_disabled(graph.spark, disable_adaptive):
        return _betweenness_impl(
            graph, sources, normalized, weight, endpoints, max_depth, stats
        )


def _betweenness_impl(
    graph, sources, normalized, weight, endpoints, max_depth, stats
):
    if weight is not None:
        warnings.warn(
            "Parameter `weight` is not supported by betweenness_centrality "
            "and will be ignored (unweighted shortest paths).",
            stacklevel=2,
        )
    if endpoints:
        warnings.warn(
            "Parameter `endpoints` is not supported by betweenness_centrality "
            "and will be ignored.",
            stacklevel=2,
        )
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    # pre-partitioned on src: every forward level joins frontier⨝edges
    # on src and every backward level joins level⨝edges on src — one
    # up-front shuffle of the edge table instead of one per level
    # (guide §2.4); the shuffle_hash hints below keep the big side
    # streamed with no per-level sort
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        _traversal_edges(graph)
        .repartition(npart, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    if sources is not None:
        pivots = spark.createDataFrame(
            [(int(s),) for s in sources], "s long"
        ).distinct()
        n_pivots = len(set(int(s) for s in sources))
    else:
        pivots = vertices.select(F.col("vid").alias("s"))
        n_pivots = n
        if n > 200_000:
            warnings.warn(
                f"exact betweenness on {n:,} vertices is O(V*E); pass "
                "sources=[...] to sample pivots",
                stacklevel=2,
            )

    levels, level_rows, depth = _forward_levels(
        edges, pivots, n_pivots, max_depth, stats=stats
    )

    # ---- backward: dependency accumulation, deepest level first
    back_log: list[dict] | None = None if stats is None else []
    bc_parts: list[DataFrame] = []
    delta: DataFrame | None = None  # (s, vid, delta) at level l+1
    for lvl in range(depth - 1, -1, -1):
        t_level = time.time()
        upper = levels[lvl + 1].select(
            F.col("s").alias("us"),
            F.col("vid").alias("w"),
            F.col("sigma").alias("sigma_w"),
        )
        if delta is not None:
            upper = upper.join(
                delta.select(
                    F.col("s").alias("us"),
                    F.col("vid").alias("w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["us", "w"],
                "left",
            ).select(
                "us", "w", "sigma_w", F.coalesce("delta_w", F.lit(0.0)).alias("delta_w")
            )
        else:
            upper = upper.select("us", "w", "sigma_w", F.lit(0.0).alias("delta_w"))
        cur = levels[lvl]
        contrib = (
            cur.hint("shuffle_hash").join(edges, cur.vid == edges.src)
            .join(
                upper,
                (F.col("us") == cur.s) & (F.col("w") == edges.dst),
            )
            .groupBy(cur.s, cur.vid)
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("delta")
            )
        )
        delta = contrib.localCheckpoint(eager=True)
        # accumulate: pivots never receive their own dependency
        bc_parts.append(delta.where(F.col("vid") != F.col("s")).select("vid", "delta"))
        # levels[lvl+1] was consumed (as `upper`) by the eager delta
        # materialization above and is never referenced again — free
        # its checkpoint blocks now instead of at context shutdown
        release_local_checkpoint(levels[lvl + 1])
        levels[lvl + 1] = None
        if back_log is not None:
            back_log.append(
                {"level": lvl, "secs": round(time.time() - t_level, 3)}
            )
    if stats is not None and back_log is not None:
        stats["backward_levels"] = back_log
    for rest in levels:  # level 0, plus everything when depth == 0
        if rest is not None:
            release_local_checkpoint(rest)
    edges.unpersist()

    if bc_parts:
        acc = bc_parts[0]
        for p in bc_parts[1:]:
            acc = acc.unionByName(p)
        raw = acc.groupBy("vid").agg(F.sum("delta").alias("b"))
    else:
        raw = spark.createDataFrame([], "vid long, b double")

    # NetworkX _rescale, verbatim: the n/k sampling factor only applies
    # when a scale exists (directed unnormalized stays raw even when
    # sampled — nx.betweenness_centrality behaves identically)
    scale: float | None
    if normalized:
        scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else None
    else:
        scale = None if graph.directed else 0.5
    if scale is not None and n_pivots < n:
        scale *= n / n_pivots

    out = vertices.join(raw, "vid", "left").select(
        "vid",
        (
            F.coalesce("b", F.lit(0.0))
            * F.lit(scale if scale is not None else 1.0)
        ).alias("betweenness"),
    )
    if stats is not None:
        stats.update(
            levels=depth,
            pivots=n_pivots,
            # peak retained forward state: Σ level sizes (each reached
            # (s,v) pair counted once) — visited held the same rows
            # again until its post-forward release
            peak_level_rows=max(level_rows),
            state_rows=sum(level_rows),
        )
    return out


def edge_betweenness_centrality(
    graph: LinkGraph,
    sources: list[int] | None = None,
    normalized: bool = True,
    weight: str | None = None,
    max_depth: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """``nx.edge_betweenness_centrality`` semantics: per-edge Brandes
    dependency sums — every edge of the graph gets a row (zeros kept),
    undirected edges canonicalized (src < dst) with both DAG
    orientations summed into the one key, exactly nx's edge-dict
    accumulation. Rescaling follows nx 3.6's unified ``_rescale`` with
    ``endpoints=True`` (the edge case): normalized → 1/(κ·(n−1));
    unnormalized → n/(κ·c), c = 2 undirected else 1 (κ = pivot count,
    = n when exact). ``sources`` is the deterministic-pivot analog of
    nx's ``k`` sampling; ``weight`` is warn-and-ignored (unweighted).

    Plan: the same batched forward sweep as the vertex operator
    (shared `_forward_levels`); each backward level eagerly
    materializes the DAG-join frame ONCE and derives BOTH aggregates
    from it — the per-(s,v) delta that drives the recursion and the
    per-(src,dst) edge partial — then frees the frame and the consumed
    level. Edge partials are edge-cardinality bounded.
    """
    if weight is not None:
        warnings.warn(
            "Parameter `weight` is not supported by "
            "edge_betweenness_centrality and will be ignored "
            "(unweighted shortest paths).",
            stacklevel=2,
        )
    spark = graph.spark
    n = graph.num_vertices()
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        _traversal_edges(graph)
        .repartition(npart, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    if sources is not None:
        pivots = spark.createDataFrame(
            [(int(s),) for s in sources], "s long"
        ).distinct()
        n_pivots = len(set(int(s) for s in sources))
    else:
        pivots = graph.vertices.select(F.col("vid").alias("s"))
        n_pivots = n
        if n > 200_000:
            warnings.warn(
                f"exact edge betweenness on {n:,} vertices is O(V*E); "
                "pass sources=[...] to sample pivots",
                stacklevel=2,
            )

    levels, level_rows, depth = _forward_levels(edges, pivots, n_pivots, max_depth)

    eparts: list[DataFrame] = []
    delta: DataFrame | None = None
    for lvl in range(depth - 1, -1, -1):
        upper = levels[lvl + 1].select(
            F.col("s").alias("us"),
            F.col("vid").alias("w"),
            F.col("sigma").alias("sigma_w"),
        )
        if delta is not None:
            upper = upper.join(
                delta.select(
                    F.col("s").alias("us"),
                    F.col("vid").alias("w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["us", "w"],
                "left",
            ).select(
                "us", "w", "sigma_w",
                F.coalesce("delta_w", F.lit(0.0)).alias("delta_w"),
            )
        else:
            upper = upper.select("us", "w", "sigma_w", F.lit(0.0).alias("delta_w"))
        cur = levels[lvl]
        joined = (
            cur.hint("shuffle_hash").join(edges, cur.vid == edges.src)
            .join(
                upper,
                (F.col("us") == cur.s) & (F.col("w") == edges.dst),
            )
            .select(
                cur.s.alias("s"),
                cur.vid.alias("v"),
                F.col("w"),
                (
                    F.col("sigma") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("term"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            joined.groupBy("s", "v")
            .agg(F.sum("term").alias("delta"))
            .select(F.col("s"), F.col("v").alias("vid"), F.col("delta"))
            .localCheckpoint(eager=True)
        )
        epart = (
            joined.groupBy(F.col("v").alias("src"), F.col("w").alias("dst"))
            .agg(F.sum("term").alias("t"))
            .localCheckpoint(eager=True)
        )
        eparts.append(epart)
        release_local_checkpoint(joined)
        release_local_checkpoint(levels[lvl + 1])
        levels[lvl + 1] = None
    for rest in levels:
        if rest is not None:
            release_local_checkpoint(rest)
    edges.unpersist()

    if eparts:
        acc = eparts[0]
        for p in eparts[1:]:
            acc = acc.unionByName(p)
    else:
        acc = spark.createDataFrame([], "src long, dst long, t double")
    if not graph.directed:
        acc = acc.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "t",
        )
        base = graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).distinct()
    else:
        base = graph.edges.select("src", "dst").distinct()
    raw = acc.groupBy("src", "dst").agg(F.sum("t").alias("t"))

    # nx 3.6 _rescale with endpoints=True (the edge form)
    scale: float | None = None
    if n >= 2:
        if normalized:
            scale = 1.0 / (n_pivots * (n - 1))
        else:
            correction = 1 if graph.directed else 2
            scale = n / (n_pivots * correction)

    out = base.join(raw, ["src", "dst"], "left").select(
        "src",
        "dst",
        (
            F.coalesce("t", F.lit(0.0))
            * F.lit(scale if scale is not None else 1.0)
        ).alias("betweenness"),
    )
    if stats is not None:
        stats.update(levels=depth, pivots=n_pivots,
                     peak_level_rows=max(level_rows),
                     state_rows=sum(level_rows))
    return out
