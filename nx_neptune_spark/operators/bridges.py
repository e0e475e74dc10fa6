"""Bridges / 2-edge-connected components over the undirected view.

The reference exposes only the Neptune Analytics algorithm set (no
cut-edge queries: /root/reference/nx_neptune/algorithms has pagerank/
centrality/community/traversal only); bridges are included as a core
link-graph extension in the connected-components class (SURVEY.md
§2.9) — a crawl graph's bridges are its single-point-of-failure links
and its 2-edge-connected components are the redundantly-linked cores.

Characterization (valid for ANY spanning forest, not just a DFS tree):
a tree edge (p, c) is a bridge iff NO non-tree edge joins subtree(c)
to the rest of its component; non-tree edges are never bridges (each
closes a cycle through its fundamental tree path). The coverage test
is the cycle-space XOR device used by the graph-sketching literature
(Ahn-Guha-McGregor SODA 2012; Kapron-King-Mountjoy SODA 2013): give
every non-tree edge a 60-bit label, let val(v) = XOR of the labels of
non-tree edges incident to v; then

    XOR over subtree(c) of val(v)
      = XOR of labels of non-tree edges with EXACTLY ONE endpoint in
        subtree(c)               (both-endpoints-inside pairs cancel)

so tree edge (p, c) is uncovered — a bridge CANDIDATE — iff its
subtree XOR is zero. A zero XOR of a non-empty crossing set needs a
label collision (< 2^-60 per edge with md5-derived labels), and the
candidate set always CONTAINS every true bridge, so one verification
pass makes the result EXACT: drop the candidate edges, run connected
components, and a candidate is a real bridge iff its endpoints land
in different components (a true bridge's endpoints must separate —
every alternate path would use the bridge itself; a false positive's
endpoints reconnect through its cycle, whose edges are never true
bridges). Any failed candidates are removed and the check repeats;
the loop is monotone (candidates only shrink) and in practice runs
once. The verification CC is not extra cost — its final labels ARE
the 2-edge-connected components (components of G minus its bridges).

Plan shape (the scale story): one connected-components run for roots,
a level-synchronous multi-source BFS (parent = min src per child, one
join + one map-side-combined min per level), one anti-join for the
non-tree set, one hash aggregate for val(v), then ONE bottom-up sweep
over the BFS levels — each level is a join of the (sparse) pending
contribution rows against that level's vertices plus one bit_xor
aggregate, and every contribution row is touched exactly once on its
way up. Per-level state is eagerly localCheckpointed and consumed
blocks are released immediately (the betweenness / MSF discipline).
Nothing driver-side grows with the graph: driver actions are the
per-level isEmpty gates, one max(level) probe, and the verification
loop's bounded emptiness checks.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint
from .components import connected_components

# Verification rounds are bounded: each round strictly shrinks a
# non-empty false-positive set whose expected size is ~|E| * 2^-60.
_MAX_VERIFY_ROUNDS = 8


def _canonical_edges(graph: LinkGraph) -> DataFrame:
    """Distinct undirected edges as (u < v); self-loops dropped (a
    self-loop is never a bridge and never affects 2-edge-connectivity)."""
    return (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def _spanning_forest(
    graph: LinkGraph,
    canon: DataFrame,
    cp: CheckpointManager,
) -> tuple[list[DataFrame], DataFrame]:
    """Multi-source BFS forest from each component's minimum vid.

    Returns (levels, comp): ``levels[d]`` = DataFrame(vid, parent) of
    the vertices first reached at depth d >= 1 (parent = min src,
    deterministic), and ``comp`` = the (vid, component) labels (kept
    for the caller's vertex set; component = min vid)."""
    comp = connected_components(graph, checkpoint=cp).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    roots = comp.groupBy("component").agg(F.min("vid").alias("vid")).select("vid")
    sym = (
        canon.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(canon.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = cp.truncate(roots)
    visited = frontier
    levels: list[DataFrame] = []
    while True:
        nxt = (
            sym.join(frontier, sym.src == frontier.vid)
            .select(F.col("dst").alias("vid"), F.col("src").alias("parent"))
            .join(visited, "vid", "left_anti")
            .groupBy("vid")
            .agg(F.min("parent").alias("parent"))
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            release_local_checkpoint(nxt)
            break
        levels.append(nxt)
        old_visited = visited
        visited = cp.truncate(visited.unionByName(nxt.select("vid")))
        release_local_checkpoint(old_visited)
        frontier = nxt.select("vid")
    sym.unpersist()
    return levels, comp


def _bridge_candidates(
    canon: DataFrame,
    levels: list[DataFrame],
    cp: CheckpointManager,
) -> DataFrame:
    """DataFrame(u, v) of canonical tree edges whose child subtree has
    zero non-tree-edge XOR coverage (superset of the true bridges)."""
    tree = None
    for lv in levels:
        t = lv.select(
            F.least("parent", "vid").alias("u"), F.greatest("parent", "vid").alias("v")
        )
        tree = t if tree is None else tree.unionByName(t)
    if tree is None:
        return canon.limit(0)
    nontree = canon.join(tree, ["u", "v"], "left_anti")
    # 60-bit deterministic label per non-tree edge; val(v) folds both
    # endpoints' incident labels with bit_xor.
    labeled = nontree.withColumn(
        "label",
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit("bridge"), "u", "v")), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    val = (
        labeled.select(F.col("u").alias("vid"), "label")
        .unionByName(labeled.select(F.col("v").alias("vid"), "label"))
        .groupBy("vid")
        .agg(F.expr("bit_xor(label)").alias("s"))
    )
    pending = cp.truncate(val)  # contribution rows addressed to their vid
    cand_parts: list[DataFrame] = []
    for d in range(len(levels) - 1, -1, -1):
        cur = levels[d]  # (vid, parent) — parents sit at depth d-1
        sub = cp.truncate(
            cur.join(pending, "vid", "left")
            .groupBy("vid", "parent")
            .agg(F.expr("bit_xor(s)").alias("s"))
        )
        cand_parts.append(
            sub.where(F.col("s").isNull() | (F.col("s") == 0)).select(
                F.least("parent", "vid").alias("u"),
                F.greatest("parent", "vid").alias("v"),
            )
        )
        old_pending = pending
        pushed = sub.where(F.col("s").isNotNull() & (F.col("s") != 0)).select(
            F.col("parent").alias("vid"), "s"
        )
        # Contributions not consumed at this level (they belong to
        # shallower vertices) stay pending alongside the pushed rows.
        rest = old_pending.join(cur.select("vid"), "vid", "left_anti")
        pending = cp.truncate(rest.unionByName(pushed))
        release_local_checkpoint(old_pending)
    out = cand_parts[0]
    for p in cand_parts[1:]:
        out = out.unionByName(p)
    return cp.truncate(out)


def bridges_and_components(
    graph: LinkGraph,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(bridges, two_edge_components) of the undirected view, exact.

    bridges: DataFrame(u long, v long) canonical (u < v).
    two_edge_components: DataFrame(vid long, component long) — label =
    minimum vid in the vertex's 2-edge-connected class (components of
    the graph with its bridges removed, the standard equivalence)."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="bridges")
    canon = _canonical_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    levels, comp = _spanning_forest(graph, canon, cp)
    cand = _bridge_candidates(canon, levels, cp)
    for lv in levels:
        release_local_checkpoint(lv)
    verify_rounds = 0
    while True:
        remainder = canon.join(cand, ["u", "v"], "left_anti").select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        )
        tecc = connected_components(
            LinkGraph(
                remainder,
                graph.vertices.select("vid", "name"),
                directed=False,
                vids_non_negative=graph.vids_non_negative,
            ),
            checkpoint=cp,
        )
        tecc = cp.truncate(tecc)
        lab = tecc.select("vid", "component")
        false_pos = (
            cand.join(lab.withColumnRenamed("vid", "u"), "u")
            .withColumnRenamed("component", "cu")
            .join(lab.withColumnRenamed("vid", "v"), "v")
            .where(F.col("cu") == F.col("component"))
            .select("u", "v")
        )
        false_pos = cp.truncate(false_pos)
        verify_rounds += 1
        if false_pos.isEmpty() or verify_rounds >= _MAX_VERIFY_ROUNDS:
            release_local_checkpoint(false_pos)
            break
        old_cand = cand
        cand = cp.truncate(cand.join(false_pos, ["u", "v"], "left_anti"))
        release_local_checkpoint(old_cand)
        release_local_checkpoint(false_pos)
    canon.unpersist()
    comp.unpersist()
    if stats is not None:
        stats["bfs_depth"] = len(levels)
        stats["verify_rounds"] = verify_rounds
    return cand, tecc


def bridges(graph: LinkGraph, **kw) -> DataFrame:
    """DataFrame(u long, v long): the bridge edges, canonical (u < v).
    Matches ``nx.bridges`` on the undirected view as an edge SET
    (nx yields in DFS-traversal orientation/order)."""
    br, _ = bridges_and_components(graph, **kw)
    return br


def has_bridges(graph: LinkGraph, **kw) -> bool:
    """True iff the undirected view has at least one bridge."""
    return not bridges(graph, **kw).isEmpty()


def two_edge_components(graph: LinkGraph, **kw) -> DataFrame:
    """DataFrame(vid long, component long): 2-edge-connected classes,
    label = minimum vid in the class. Matches
    ``nx.k_edge_components(G, k=2)`` as a partition (every vertex
    appears; bridge endpoints fall in different classes)."""
    _, tecc = bridges_and_components(graph, **kw)
    return tecc.select("vid", "component")


def local_bridges(
    graph: LinkGraph,
    with_span: bool = True,
    max_rounds: int | None = None,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Local bridges (Easley-Kleinberg §3.2 / ``nx.local_bridges``):
    edges whose endpoints share NO common neighbor. With
    ``with_span``, adds the span — the endpoint distance once the edge
    is deleted (NULL = infinite, nx's ``float('inf')``).

    Candidates are one wedge anti-join (edge (u,v) is local iff no w
    with both (u,w) and (v,w) present). Spans run as ONE labeled
    multi-source BFS — state rows are (edge, vertex) pairs, each edge
    retiring from the frontier the round its far endpoint is reached —
    so the per-round cost tracks the surviving candidates, not the
    graph. ``max_rounds`` caps the sweep for web-scale use (uncapped
    spans on a crawl graph are diameter-bounded anyway)."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="local_bridges")
    canon = _canonical_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    sym = (
        canon.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(canon.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wedged = (
        canon.alias("e")
        .join(sym.alias("a"), F.col("e.u") == F.col("a.src"))
        .join(
            sym.alias("b"),
            (F.col("e.v") == F.col("b.src")) & (F.col("a.dst") == F.col("b.dst")),
        )
        .select("e.u", "e.v")
        .distinct()
    )
    local = cp.truncate(canon.join(wedged, ["u", "v"], "left_anti"))
    if not with_span:
        canon.unpersist()
        sym.unpersist()
        return local
    # Labeled BFS from each candidate's u toward its v, the candidate
    # edge itself excluded in both directions.
    active = local  # (u, v): candidates whose span is still unknown
    frontier = cp.truncate(active.select("u", "v", F.col("u").alias("vid")))
    visited = frontier
    spans = spark.createDataFrame([], "u long, v long, span long")
    dist = 0
    while True:
        if frontier.isEmpty() or (max_rounds is not None and dist >= max_rounds):
            break
        dist += 1
        nxt = (
            frontier.join(sym, frontier.vid == sym.src)
            .where(
                ~(
                    (F.least("src", "dst") == F.col("u"))
                    & (F.greatest("src", "dst") == F.col("v"))
                )
            )
            .select("u", "v", F.col("dst").alias("vid"))
            .distinct()
            .join(visited, ["u", "v", "vid"], "left_anti")
        )
        nxt = cp.truncate(nxt)
        found = nxt.where(F.col("vid") == F.col("v")).select(
            "u", "v", F.lit(dist).cast("long").alias("span")
        )
        spans = cp.truncate(spans.unionByName(found))
        old_frontier, old_visited = frontier, visited
        frontier = cp.truncate(nxt.join(spans.select("u", "v"), ["u", "v"], "left_anti"))
        visited = cp.truncate(visited.unionByName(nxt))
        release_local_checkpoint(old_frontier)
        release_local_checkpoint(old_visited)
        release_local_checkpoint(nxt)
    canon.unpersist()
    sym.unpersist()
    return local.join(spans, ["u", "v"], "left").select("u", "v", "span")
