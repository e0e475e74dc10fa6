"""Maximal independent set — distributed Luby rounds (NetworkX parity
in kind: ``nx.maximal_independent_set`` returns one random MIS; HERE
the randomness is a pinned portable hash so the set is deterministic
and oracle-checkable, and independence + maximality are the verified
contract).

Luby 1986 ("A simple parallel algorithm for the maximal independent
set problem", SIAM J. Comput. 15(4)): every vertex draws a priority;
a vertex joins the MIS when it beats every still-active neighbor;
winners and their neighbors retire; repeat. O(log n) rounds in
expectation — THE textbook Pregel-style symmetry breaker, and the web
use is direct: picking a maximal set of pairwise non-adjacent pages /
hosts (crawl-frontier sampling, landing-page dedup, ad-slot conflict
resolution). An MIS is also a dominating set, so the result doubles
as a 1-hop cover of the whole graph.

Priorities are :func:`~nx_neptune_spark.functions.hashing.hash60`
("mis:<vid>") — identical md5 arithmetic in Spark and DuckDB — with
(priority, vid) lexicographic comparison so hash collisions cannot
produce a non-deterministic or improper round. nx's seeded
`maximal_independent_set` (mis.py in networkx) is a sequential greedy
over a shuffled node list; a distributed engine cannot replay a
Python `random.Random` shuffle, so parity is at the property level
(tests assert independence and maximality against the same nx graph).

Plan (the scale story): state is the ACTIVE edge list, which only
shrinks. Per round: one anti-join (active minus beaten = winners),
one semi-join (winners' neighbors), one anti-join + two semi-joins to
retire winners∪neighbors from the vertex and edge states — every one
a key-partitioned hash join on vid, no window functions, no per-vertex
neighbor materialization (a 10^8-degree hub contributes edge ROWS
spread over all partitions, never one task's array or sort). Lineage
is cut per round (CheckpointManager); rounds are O(log n) expected,
`max_rounds`-bounded. Nothing ever reaches the driver but the
round-boundary isEmpty() probe.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def maximal_independent_set(
    graph: LinkGraph,
    max_rounds: int = 200,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, round int): the members of the deterministic
    Luby MIS and the round each was elected (round 0 = local priority
    minima, incl. every isolate). Self-loops are ignored (a vertex is
    never its own neighbor), matching nx's Graph view of them for
    independence purposes."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="mis")

    pri = hash60(F.concat(F.lit("mis:"), F.col("vid").cast("string")))
    act = cp.truncate(graph.vertices.select("vid", pri.alias("p")))

    # undirected adjacency regardless of orientation (independence is a
    # property of the underlying undirected graph): edges ∪ reversed
    fwd = graph.edges.select("src", "dst")
    sym = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # carry both endpoint priorities on the edge row so rounds never
    # re-join the vertex state to compare
    p_of = act.select(F.col("vid"), F.col("p"))
    aedges = cp.truncate(
        sym.join(p_of.withColumnsRenamed({"vid": "src", "p": "p_src"}), "src")
        .join(p_of.withColumnsRenamed({"vid": "dst", "p": "p_dst"}), "dst")
        .select("src", "dst", "p_src", "p_dst")
    )

    mis: DataFrame | None = None
    rounds = 0
    for r in range(max_rounds):
        if act.isEmpty():
            break
        rounds = r + 1
        # v loses when ANY active neighbor u has (p_u, u) < (p_v, v)
        beaten = (
            aedges.where(
                (F.col("p_dst") < F.col("p_src"))
                | ((F.col("p_dst") == F.col("p_src")) & (F.col("dst") < F.col("src")))
            )
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        winners = cp.truncate(
            act.join(beaten, "vid", "left_anti").select(
                "vid", F.lit(r).alias("round")
            )
        )
        if mis is None:
            mis = winners
        else:
            old_mis = mis
            mis = cp.truncate(mis.unionByName(winners))
            release_local_checkpoint(old_mis)
        # retire winners and their neighbors from both states
        wvid = winners.select("vid")
        nbrs = (
            aedges.join(wvid.withColumnRenamed("vid", "src"), "src", "left_semi")
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        gone = wvid.unionByName(nbrs).distinct()
        old_act, old_aedges = act, aedges
        act = cp.truncate(act.join(gone, "vid", "left_anti"))
        aedges = cp.truncate(
            aedges.join(gone.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select("src", "dst", "p_src", "p_dst")
        )
        # prior round's state was copied into the new checkpoints above
        # (truncate is eager) — free its blocks now, not at shutdown
        release_local_checkpoint(old_act)
        release_local_checkpoint(old_aedges)
    if stats is not None:
        stats["rounds"] = rounds
    if mis is None:
        return spark.createDataFrame([], "vid long, round int")
    return mis.select("vid", F.col("round").cast("int").alias("round"))
