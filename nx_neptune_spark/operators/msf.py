"""Minimum / maximum spanning forest: distributed Boruvka.

The reference exposes only the Neptune Analytics algorithm set (no
spanning trees: /root/reference/nx_neptune/algorithms has pagerank/
centrality/community/traversal only); the spanning forest is included
as a core link-graph extension in the same class as connected
components (SURVEY.md §2.9) — the minimum spanning forest of a
similarity- or latency-weighted link graph is the standard backbone /
single-linkage-clustering primitive.

Algorithm (Boruvka 1926, the textbook parallel MST algorithm — every
distributed MST treatment from Chung & Condon 1996 to the GraphX/
Pegasus implementations uses it because each round is pure
gather-scatter):

    round: every component picks its lightest incident edge under a
    TOTAL order on edges (w, u, v); the chosen edges join the forest;
    the pointer graph they induce on components is contracted and the
    edge table is relabeled.

With a total order the chosen pointer set is cycle-free except for
mutual (2-cycle) pairs, so contraction = connected components of the
pointer graph — delegated to the engine's star-contraction CC
operator on a table with ONE edge per live component. Components at
least halve per round: <= log2(V) rounds.

Tie-breaking / parity: edges are totally ordered by
(w, least(u,v), greatest(u,v)). On graphs with DISTINCT weights the
MSF is unique, so the result is algorithm-independent and equals
``nx.minimum_spanning_edges`` for every nx algorithm choice
(differential: tests/test_msf.py). With ties the forest is still a
valid MSF (same total weight as nx's, pinned deterministic edge set).

Plan per round (the scale story): the contracted edge table E carries
(cu, cv, u, v, w) with ONE row per live component pair (parallel
edges collapse in a map-side-combined min(struct) aggregate, so E
shrinks at least geometrically); the per-component choice is one
map-side-combined min(struct) over the 2|E| orientation rows — no
window, no per-component sort, hub components pre-aggregate before
the shuffle. Relabeling is two hash joins of E against the component
map. Nothing driver-side grows with the graph: the only driver
actions are the per-round isEmpty gate and the CC contraction's own
bounded machinery. Per-round state is eagerly localCheckpointed and
the consumed round's blocks are released immediately (the
betweenness / MIS discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint
from .components import connected_components


def minimum_spanning_edges(
    graph: LinkGraph,
    weight: str = "weight",
    maximum: bool = False,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(src long, dst long, weight double): the edges of the
    minimum (or maximum) spanning forest of the undirected view of
    ``graph``, canonical orientation src < dst.

    ``weight``: edge column name; missing -> every edge weighs 1.0
    (nx's default for absent data). Parallel rows of the same
    undirected pair collapse to the lightest (heaviest when
    ``maximum``) — the only one a spanning forest can ever use.
    """
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="msf")

    w_col = (
        F.col(weight).cast("double")
        if weight in graph.edges.columns
        else F.lit(1.0)
    )
    sign = -1.0 if maximum else 1.0
    # canonical undirected pairs, self-loops out (a spanning forest
    # never uses them), parallel edges collapsed to the best one;
    # the internal weight is sign*w so "min" is always the objective
    e0 = (
        graph.edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            (F.lit(sign) * w_col).alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    # E: contracted edge table (cu, cv, u, v, w), cu < cv
    edges = cp.truncate(
        e0.select(
            F.col("u").alias("cu"), F.col("v").alias("cv"), "u", "v", "w"
        )
    )
    forest: DataFrame | None = None
    rounds = 0

    for r in range(max_rounds):
        if edges.isEmpty():
            break
        rounds = r + 1
        # lightest incident edge per component under the total order
        # (w, u, v) — (u, v) is unique per row, so the struct order is
        # total and the trailing cu/cv fields never tip a comparison;
        # both orientations, one map-side-combined min(struct)
        estruct = F.struct("w", "u", "v", "cu", "cv").alias("e")
        bidir = edges.select(F.col("cu").alias("c"), estruct).unionByName(
            edges.select(F.col("cv").alias("c"), estruct)
        )
        chosen = cp.truncate(bidir.groupBy("c").agg(F.min("e").alias("e")))
        picked = chosen.select(
            F.col("e.u").alias("u"), F.col("e.v").alias("v"), F.col("e.w").alias("w")
        ).distinct()
        if forest is None:
            forest = cp.truncate(picked)
        else:
            old_forest = forest
            forest = cp.truncate(forest.unionByName(picked))
            release_local_checkpoint(old_forest)

        # contraction: CC of the pointer graph (component -> the far
        # endpoint's component of its chosen edge; one edge per live
        # component, mutual choices are the only cycles)
        ptr = chosen.select(
            F.col("c").alias("src"),
            F.when(F.col("e.cu") == F.col("c"), F.col("e.cv"))
            .otherwise(F.col("e.cu"))
            .alias("dst"),
        )
        compmap = connected_components(
            LinkGraph(ptr, directed=False, vids_non_negative=graph.vids_non_negative)
        ).select(F.col("vid").alias("c"), F.col("component").alias("nc"))

        # relabel + re-collapse the edge table; intra-component rows out.
        # Every component in E chose an edge, so it appears in compmap;
        # the coalesce is belt-and-braces for the left join.
        relab = (
            edges.join(
                compmap.withColumnsRenamed({"c": "cu", "nc": "ncu"}), "cu", "left"
            )
            .join(compmap.withColumnsRenamed({"c": "cv", "nc": "ncv"}), "cv", "left")
            .select(
                F.coalesce("ncu", F.col("cu")).alias("a"),
                F.coalesce("ncv", F.col("cv")).alias("b"),
                "u", "v", "w",
            )
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("cu"),
                F.greatest("a", "b").alias("cv"),
                F.struct("w", "u", "v").alias("e"),
            )
            .groupBy("cu", "cv")
            .agg(F.min("e").alias("e"))
            .select(
                "cu", "cv", F.col("e.u").alias("u"), F.col("e.v").alias("v"),
                F.col("e.w").alias("w"),
            )
        )
        old_edges = edges
        edges = cp.truncate(relab)
        release_local_checkpoint(old_edges)
        release_local_checkpoint(chosen)

    release_local_checkpoint(edges)
    if stats is not None:
        stats["rounds"] = rounds
    if forest is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return forest.select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        (F.lit(sign) * F.col("w")).alias("weight"),
    )


def minimum_spanning_forest_weight(
    graph: LinkGraph, weight: str = "weight", maximum: bool = False
) -> float:
    """Total weight of the spanning forest (``nx.minimum_spanning_tree(
    G).size(weight=...)`` on each component, summed)."""
    row = (
        minimum_spanning_edges(graph, weight=weight, maximum=maximum)
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("s"))
        .first()
    )
    return float(row["s"])
