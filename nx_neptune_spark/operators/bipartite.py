"""Bipartite testing / two-coloring via parity BFS (NetworkX parity).

The reference has no bipartite surface; web analysts use two-coloring
constantly (host↔resource graphs, query↔click graphs), so this
completes the connectivity family (operators/components.py, bfs.py).

Semantics match ``nx.bipartite.color`` / ``nx.is_bipartite``: a proper
2-coloring exists iff no odd cycle. A BFS-tree parity assignment —
color(v) = 1 − dist(v, root) mod 2, root colored 1 — is a proper
2-coloring iff the graph is bipartite, and within a component every
proper 2-coloring is one of the two parity flips. nx picks its root as
the first node in insertion order and colors it 1; insertion order
does not survive the DataFrame representation, so HERE the root is the
MIN VID of each component — the coloring is deterministic, proper, and
matches nx exactly whenever nx's first-seen node of a component lands
in the same part as the min vid (always true for sorted insertion,
e.g. every LinkGraph built from sorted names). Isolates get color 0,
exactly as nx does.

Plan (the scale story): component labels come from the star-contraction
operator (min-label = the root, free); the parity BFS is ONE global
frontier loop over ALL components simultaneously — per level one
key-partitioned join + distinct + anti-join, state is (vid, parity)
with one row per vertex, lineage cut per level (CheckpointManager).
Rounds = max component diameter. The odd-cycle check is one marked
self-join of the colored edge list (same-device as reciprocity) — no
driver-side state at any scale.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager
from .components import connected_components


def _parity_colors(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """(colors, conflicts): colors = DataFrame(vid, color int) for the
    parity-BFS 2-coloring (root=min vid per component gets 1, isolates
    0); conflicts = DataFrame of monochromatic edges (empty iff the
    coloring is proper iff the graph is bipartite). Self-loops are
    monochromatic by construction, matching nx's refusal."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="bipartite")
    # undirected view regardless of orientation (nx.is_bipartite on a
    # DiGraph walks predecessors AND successors)
    fwd = graph.edges.select("src", "dst")
    und = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    comp = connected_components(graph, checkpoint=cp)
    # nx skips isolates in the coloring loop (they get 0, not the
    # root color 1): only components with an edge contribute a root
    roots = (
        comp.where(F.col("vid") == F.col("component"))
        .select("vid")
        .join(und.select(F.col("src").alias("vid")).distinct(), "vid", "left_semi")
    )
    # multi-source BFS: components are disjoint, so one global
    # (vid, parity) state covers every root simultaneously
    frontier = cp.truncate(roots.withColumn("parity", F.lit(0)))
    visited = frontier
    while True:
        nxt = (
            und.join(frontier, und.src == frontier.vid)
            .select(
                F.col("dst").alias("vid"),
                ((F.col("parity") + 1) % 2).alias("parity"),
            )
            .distinct()
            .join(visited.select("vid"), ["vid"], "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        visited = cp.truncate(visited.unionByName(nxt))
        frontier = nxt
    # root parity 0 -> nx color 1; odd levels -> 0; isolates -> 0.
    # Isolates are exactly the vertices BFS never reached whose vid is
    # its own component with no incident edge; every non-isolate is
    # reached (BFS runs to frontier exhaustion), so coalesce is safe.
    colors = (
        graph.vertices.select("vid")
        .join(visited, "vid", "left")
        .select(
            "vid",
            F.when(F.col("parity").isNull(), F.lit(0))
            .otherwise(F.lit(1) - F.col("parity"))
            .cast("int")
            .alias("color"),
        )
    )
    # self-loops survive in `und` and are monochromatic by definition,
    # so the same check catches them (nx: a loop is an odd cycle)
    conflicts = (
        und.join(
            colors.select(F.col("vid").alias("src"), F.col("color").alias("cs")),
            "src",
        )
        .join(
            colors.select(F.col("vid").alias("dst"), F.col("color").alias("cd")),
            "dst",
        )
        .where(F.col("cs") == F.col("cd"))
    )
    und.unpersist()
    return colors, conflicts


def bipartite_color(graph: LinkGraph) -> DataFrame:
    """``nx.bipartite.color`` analog: DataFrame(vid long, color int)
    with a proper 2-coloring (root-of-component colored 1, isolates
    0); raises ValueError exactly where nx raises NetworkXError."""
    colors, conflicts = _parity_colors(graph)
    if not conflicts.isEmpty():
        raise ValueError("Graph is not bipartite.")
    return colors


def is_bipartite(graph: LinkGraph) -> bool:
    """``nx.is_bipartite`` parity (works on digraphs via the
    undirected view, like nx)."""
    _, conflicts = _parity_colors(graph)
    return conflicts.isEmpty()


def bipartite_projection(
    graph: LinkGraph,
    nodes: DataFrame,
    max_center_degree: int | None = None,
) -> DataFrame:
    """One-mode projections of a bipartite graph onto the ``nodes``
    side, ALL standard weights in ONE wedge aggregate
    (``nx.bipartite`` projection family parity):

      common      |N(u) ∩ N(v)|            (weighted_projected_graph)
      ratio       common / |other side|    (ratio=True variant)
      jaccard     common / |N(u) ∪ N(v)|   (overlap_weighted_, jaccard)
      overlap_min common / min(deg)        (overlap_weighted_, not jaccard)
      collab      Σ_k 1/(deg_k − 1)        (collaboration_weighted_,
                                            Newman 2001)

    Returns DataFrame(u, v, common, ratio, jaccard, overlap_min,
    collab) with u < v and common >= 1 — nodes of the projected side
    with no co-neighbor pair simply have no rows (the adapter re-adds
    them as isolated projection vertices, nx graph parity).

    Plan: one semi-join splits the symmetric edge view into
    (u-side, center) rows; the projection is the linkpred wedge
    self-join keyed by the center with the center's degree joined
    BEFORE aggregation, so every weight folds into the same
    (u, v) partial+final aggregate. ``max_center_degree`` is the
    stop-shingle hub cap (operators/linkpred.py's device) — a center
    shared by k projected vertices emits k(k−1)/2 wedges, and a
    super-hub center dominates the join at web scale while carrying
    ~zero similarity signal."""
    nodes = nodes.select(F.col(nodes.columns[0]).alias("vid")).distinct()
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ue = sym.join(nodes.withColumnRenamed("vid", "src"), "src", "left_semi").select(
        F.col("src").alias("u"), F.col("dst").alias("m")
    )
    deg_u = ue.groupBy("u").agg(F.count("*").alias("du"))
    deg_m = ue.groupBy("m").agg(F.count("*").alias("dm"))
    if max_center_degree is not None:
        deg_m = deg_m.where(F.col("dm") <= max_center_degree)
    # nx ratio denominator: |B| − |nodes| over the FULL vertex set
    # (isolated other-side vertices count)
    n_other = graph.vertices.select("vid").join(nodes, "vid", "left_anti").count()
    le = ue.join(deg_m, "m")
    wedges = (
        le.alias("l")
        .join(ue.alias("r"), F.col("l.m") == F.col("r.m"))
        .where(F.col("l.u") < F.col("r.u"))
        .select(
            F.col("l.u").alias("u"),
            F.col("r.u").alias("v"),
            F.col("l.dm").alias("dm"),
        )
    )
    agg = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common"),
        F.sum(1.0 / (F.col("dm") - 1.0)).alias("collab"),
    )
    return (
        agg.join(deg_u.withColumnRenamed("u", "u").alias("a"), "u")
        .join(
            deg_u.select(F.col("u").alias("v"), F.col("du").alias("dv")), "v"
        )
        .select(
            "u",
            "v",
            "common",
            (F.col("common") / F.lit(float(max(n_other, 1)))).alias("ratio"),
            (
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("jaccard"),
            (F.col("common") / F.least("du", "dv")).alias("overlap_min"),
            "collab",
        )
    )
