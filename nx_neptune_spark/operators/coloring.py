"""Greedy graph coloring — distributed Jones–Plassmann rounds.

Jones & Plassmann 1993 ("A parallel graph coloring heuristic", SIAM
J. Sci. Comput. 14(3)): a vertex colors itself once it is the
priority maximum among its still-uncolored neighbors, taking the
smallest color absent from its already-colored neighborhood. The
classic Pregel-era scheduling/partitioning primitive — on a link
graph it answers "how many mutually-non-conflicting batches do these
pages/hosts decompose into" (crawl politeness batching, conflict-free
update scheduling).

``nx.greedy_color`` is an inherently sequential vertex sweep whose
output depends on the visit order; a distributed engine cannot replay
it, so parity is at the contract level (a PROPER coloring using a
bounded palette — tests verify properness against nx on the same
graph, and that the color count matches nx's greedy bound Δ+1).
Priorities are the pinned portable hash
:func:`~nx_neptune_spark.functions.hashing.hash60` ("color:<vid>")
with (priority, vid) lexicographic comparison, so the result is
deterministic and the DuckDB oracle replays it bit-for-bit.

Plan (the scale story): mirror of the Luby MIS loop (operators/mis.py)
— active-edge state only shrinks; per round one anti-join (local
maxima = winners), one join of winners against the COLORED neighbor
table + one map-side-combined collect_set whose size is bounded by
the palette (≤ Δ+1 distinct colors), never by degree — a hub's rows
pre-deduplicate map-side, so no per-vertex degree-sized array or sort
exists anywhere. The smallest-missing-color (mex) is a pure Catalyst
``aggregate`` over the ≤Δ+1-element sorted color set. Rounds are
O(log n / log log n) expected (measured 8-11 on the fixtures),
per-round lineage cuts, nothing driver-side but the isEmpty probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def greedy_color(
    graph: LinkGraph,
    max_rounds: int = 200,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, color int): a deterministic proper coloring
    of the underlying undirected graph (Jones–Plassmann with pinned
    hash priorities; colors 0..k-1, k ≤ Δ+1). Isolates color 0.
    Self-loops are ignored (nx.greedy_color raises on them only via
    interchange strategies; the plain greedy ignores them too)."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="coloring")

    pri = hash60(F.concat(F.lit("color:"), F.col("vid").cast("string")))
    act = cp.truncate(graph.vertices.select("vid", pri.alias("p")))

    fwd = graph.edges.select("src", "dst")
    sym = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    p_of = act.select("vid", "p")
    aedges = cp.truncate(
        sym.join(p_of.withColumnsRenamed({"vid": "src", "p": "p_src"}), "src")
        .join(p_of.withColumnsRenamed({"vid": "dst", "p": "p_dst"}), "dst")
        .select("src", "dst", "p_src", "p_dst")
    )

    colored: DataFrame | None = None
    rounds = 0
    for _r in range(max_rounds):
        if act.isEmpty():
            break
        rounds = _r + 1
        # v waits while ANY active neighbor u has (p_u, u) > (p_v, v)
        beaten = (
            aedges.where(
                (F.col("p_dst") > F.col("p_src"))
                | ((F.col("p_dst") == F.col("p_src")) & (F.col("dst") > F.col("src")))
            )
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        winners = act.join(beaten, "vid", "left_anti").select("vid")
        # mex over already-colored neighbors: sorted distinct colors
        # scanned left-to-right; acc advances past each matching value
        if colored is None:
            new = winners.select("vid", F.lit(0).alias("color"))
        else:
            used = (
                sym.join(winners.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(
                    colored.withColumnsRenamed({"vid": "dst", "color": "c"}), "dst"
                )
                .groupBy(F.col("src").alias("vid"))
                .agg(F.array_sort(F.collect_set("c")).alias("cs"))
            )
            new = (
                winners.join(used, "vid", "left")
                .select(
                    "vid",
                    F.coalesce(
                        F.aggregate(
                            "cs",
                            F.lit(0),
                            lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
                        ),
                        F.lit(0),
                    ).alias("color"),
                )
            )
        new = cp.truncate(new)
        if colored is None:
            colored = new
        else:
            old_colored = colored
            colored = cp.truncate(colored.unionByName(new))
            release_local_checkpoint(old_colored)
        old_act, old_aedges = act, aedges
        act = cp.truncate(act.join(new.select("vid"), "vid", "left_anti"))
        aedges = cp.truncate(
            aedges.join(new.select(F.col("vid").alias("src")), "src", "left_anti")
            .join(new.select(F.col("vid").alias("dst")), "dst", "left_anti")
            .select("src", "dst", "p_src", "p_dst")
        )
        # prior round's state lives on only as copies inside the new
        # eager checkpoints — free its blocks now, not at shutdown
        release_local_checkpoint(old_act)
        release_local_checkpoint(old_aedges)
    sym.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if colored is None:
        return spark.createDataFrame([], "vid long, color int")
    return colored.select("vid", F.col("color").cast("int").alias("color"))
