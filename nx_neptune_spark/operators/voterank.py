"""VoteRank influential-seed selection (NetworkX parity).

Zhang et al. 2016 ("Identifying a set of influential spreaders in
complex networks", Sci. Rep. 6, 27823): nodes vote with a decaying
voting ability; the top-scored node is elected each round, silenced,
and its neighbors' ability is weakened by 1/avg_degree. The standard
seed picker for influence-maximization over link graphs — exactly the
"which pages/hosts seed a crawl or a campaign" question — and a
natural companion to the centrality family (C1-C3).

Semantics match ``nx.voterank(G, number_of_nodes)`` (voterank_alg.py):
directed graphs vote along out-edges (score(v) = Σ ability(out-nbrs)),
weaken the elected node's out-neighbors, and use avg OUT-degree;
undirected graphs do both directions with avg total degree. Election
stops early when the best score hits 0. nx breaks score ties by node
insertion order, which a DataFrame cannot carry — HERE ties elect the
MIN VID (deterministic; identical to nx whenever insertion is sorted,
e.g. every LinkGraph built from sorted names).

Plan (the scale story): per round ONE key-partitioned join
(edges ⨝ abilities) + ONE map-side-combined sum + a TakeOrdered(1)
(sort-limit collapses to a per-partition top-1 — no global sort), then
one broadcast update of the elected vertex's neighbor set. Rounds = k
(the seed count, user-bounded; k = |V| reproduces nx's default but is
a driver loop of |V| rounds — pick seeds, not rankings, at scale).
Ability state is V rows, lineage-cut per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager

# Above this out-degree the elected vertex's neighbor set is no longer
# broadcast for the ability update: a super-hub winner on a real crawl
# has 1e7-1e8 out-neighbors, and a degree-sized broadcast is a driver
# collect + per-executor copy of the whole neighborhood. Past the
# threshold the update runs as a plain keyed join instead (abilities is
# V rows either way). 2M rows of (vid, bool) ~ 32 MB framed — safely
# inside broadcast limits, far below driver pressure.
BROADCAST_MAX_DEGREE = 2_000_000


def voterank(graph: LinkGraph, number_of_nodes: int | None = None) -> DataFrame:
    """``nx.voterank`` parity: DataFrame(rank int, vid long) of the
    elected seeds in election order (rank 0 = first seed); only
    positive-score elections are returned, exactly like nx."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="voterank")
    n = graph.num_vertices()
    if n == 0:
        return spark.createDataFrame([], "rank int, vid long")
    k = number_of_nodes if number_of_nodes is not None and number_of_nodes <= n else n

    if graph.directed:
        edges = graph.edges.select("src", "dst").distinct()
    else:
        edges = graph.symmetric_edges().select("src", "dst")
    edges = edges.persist()
    m = edges.count()
    avg_degree = m / n  # directed: avg out-degree; undirected: 2|E|/n
    if avg_degree == 0:
        edges.unpersist()
        return spark.createDataFrame([], "rank int, vid long")

    abilities = cp.truncate(
        graph.vertices.select("vid", F.lit(1.0).alias("ability"))
    )
    elected: list[int] = []
    for _ in range(k):
        # vote: score(v) = sum of abilities of v's (out-)neighbors
        scores = (
            edges.join(
                abilities.select(
                    F.col("vid").alias("dst"), F.col("ability").alias("ab")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"))
            # abilities always carries all V rows (silenced vertices keep
            # a 0.0 row), so the inner join preserves every edge and
            # count(*) is the voter's exact (out-)degree — computed for
            # free inside the same map-side-combined aggregate.
            .agg(F.sum("ab").alias("score"), F.count(F.lit(1)).alias("deg"))
        )
        if elected:
            silenced = spark.createDataFrame(
                [(int(v),) for v in elected], "vid long"
            )
            scores = scores.join(silenced, "vid", "left_anti")
        top = (
            scores.where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("vid"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        winner = int(top[0]["vid"])
        winner_deg = int(top[0]["deg"])
        elected.append(winner)
        # weaken the winner's (out-)neighbors, silence the winner;
        # broadcast the neighbor set only while it is provably small
        # (hub winners fall back to a plain keyed join — see
        # BROADCAST_MAX_DEGREE above)
        nbrs = edges.where(F.col("src") == winner).select(
            F.col("dst").alias("vid"), F.lit(True).alias("is_nbr")
        )
        if winner_deg <= BROADCAST_MAX_DEGREE:
            nbrs = F.broadcast(nbrs)
        abilities = cp.truncate(
            abilities.join(nbrs, "vid", "left").select(
                "vid",
                F.when(F.col("vid") == winner, F.lit(0.0))
                .when(
                    F.col("is_nbr"),
                    F.greatest(
                        F.col("ability") - F.lit(1.0 / avg_degree), F.lit(0.0)
                    ),
                )
                .otherwise(F.col("ability"))
                .alias("ability"),
            )
        )
    edges.unpersist()
    rows = [(i, v) for i, v in enumerate(elected)]
    return spark.createDataFrame(rows, "rank int, vid long")
