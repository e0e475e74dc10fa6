"""Maximal matching — distributed local-dominant edge rounds — and the
derived 2-approximation vertex cover.

Manne & Bisseling 2007 ("A parallel approximation algorithm for the
weighted maximum matching problem") / Preis 1999 local-dominant idea,
specialized to the unweighted maximal case: an edge enters the
matching when it carries the minimum priority among ALL edges sharing
either endpoint; matched endpoints retire; repeat. Properties: the
result is a matching (winners share no endpoint by construction) and
maximal (an unmatched edge always has a dominated neighbor chain), so
its endpoint set is the textbook factor-2 vertex cover (Gavril) —
"which page pairs can be mutually assigned without conflicts" and
"the smallest crawl-blocklist covering every link" in link-graph
terms. ``nx.maximal_matching`` is a sequential first-seen sweep a
distributed engine cannot replay; parity is the property contract
(matching + maximality, tested against nx on the same graph), with
the randomness pinned to the portable hash
:func:`~nx_neptune_spark.functions.hashing.hash60` ("match:<u>:<v>")
and (h, u, v) lexicographic tie-breaking so the result is
deterministic and oracle-checkable.

Plan (the scale story): active state is the canonical (u<v) edge
list, which only shrinks. Per round: explode each edge to its two
endpoint perspectives (2|E| rows), ONE map-side-combined
min(struct(h,u,v)) per vertex — a hub's incident edges pre-aggregate
map-side, no per-vertex arrays or sorts — then two key-partitioned
joins re-attach the per-endpoint minima and a filter keeps edges
dominant at BOTH ends; two anti-joins retire matched endpoints.
Rounds are O(log |E|) expected (measured 3-5 on the fixtures),
per-round lineage cuts, nothing driver-side but the isEmpty probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def maximal_matching(
    graph: LinkGraph,
    max_rounds: int = 200,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(u long, v long, round int), u < v: the matched edges
    of the deterministic local-dominant matching and the round each
    was won. Self-loops are excluded (a self-loop can never be in a
    matching). Directed edges are treated as undirected pairs."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="matching")

    e = graph.edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    act = cp.truncate(
        e.withColumn(
            "h",
            hash60(
                F.concat_ws(
                    ":", F.lit("match"), F.col("u"), F.col("v")
                )
            ),
        )
    )

    matched: DataFrame | None = None
    rounds = 0
    for r in range(max_rounds):
        if act.isEmpty():
            break
        rounds = r + 1
        ends = act.select(
            F.explode(F.array("u", "v")).alias("vertex"),
            F.struct("h", "u", "v").alias("k"),
        )
        vmin = ends.groupBy("vertex").agg(F.min("k").alias("mk"))
        win = (
            act.join(
                vmin.withColumnsRenamed({"vertex": "u", "mk": "mu"}), "u"
            )
            .join(vmin.withColumnsRenamed({"vertex": "v", "mk": "mv"}), "v")
            .where(
                (F.col("mu") == F.struct("h", "u", "v"))
                & (F.col("mv") == F.struct("h", "u", "v"))
            )
            .select("u", "v", F.lit(r).alias("round"))
        )
        win = cp.truncate(win)
        if matched is None:
            matched = win
        else:
            old_matched = matched
            matched = cp.truncate(matched.unionByName(win))
            release_local_checkpoint(old_matched)
        gone = (
            win.select(F.col("u").alias("vid"))
            .unionByName(win.select(F.col("v").alias("vid")))
            .distinct()
        )
        old_act = act
        act = cp.truncate(
            act.join(gone.withColumnRenamed("vid", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("vid", "v"), "v", "left_anti")
            .select("u", "v", "h")
        )
        # prior round's edge state was copied into the new checkpoint —
        # free its blocks now, not at shutdown
        release_local_checkpoint(old_act)
    if stats is not None:
        stats["rounds"] = rounds
    if matched is None:
        return spark.createDataFrame([], "u long, v long, round int")
    return matched.select(
        "u", "v", F.col("round").cast("int").alias("round")
    )


def vertex_cover(graph: LinkGraph, **kw) -> DataFrame:
    """DataFrame(vid long): the endpoints of the maximal matching — a
    vertex cover at most 2x the optimum (Gavril's bound: every cover
    contains >= one endpoint per matched edge). ONE distinct over the
    matching's 2-row-per-edge explode."""
    m = maximal_matching(graph, **kw)
    return (
        m.select(F.explode(F.array("u", "v")).alias("vid")).distinct()
    )
