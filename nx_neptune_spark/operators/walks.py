"""Deterministic random-walk corpus generation (DeepWalk/node2vec-style).

Perozzi et al. KDD'14 (DeepWalk) and Grover & Leskovec KDD'16
(node2vec, p=q=1 case): uniform random walks over the link graph are
THE standard corpus for graph-embedding training — each walk is a
"sentence" of vertex ids fed to a skip-gram model. This operator is
the training-data-pipeline member of the graph family: it turns the
edge table into an embedding corpus the same way the dedup/ANN
operators prepare the text side.

The reference has no walk surface (nx exposes ``generate_random_paths``
over a scipy dense matrix); at web scale a replayable corpus matters
more than "true" randomness, so the per-step choice is a pinned
portable hash: from vertex v at step t of walk (start, rep), the next
hop is the out-neighbor d minimizing
``hash60(concat_ws(':', 'walk', start, rep, t, d))`` — uniform-ish
over neighbors, independent across steps/walks, identical md5
arithmetic in Spark and DuckDB, and (h, d) lexicographic so even a
hash collision cannot make the walk nondeterministic. Walks stop at
dangling vertices (no out-edges), like PageRank's dangling semantics
minus the teleport.

Plan (the scale story): walk state is ONE row per active walk
(start, rep, cur). Per step: one key-partitioned hash join
state⨝edges on cur=src fans out to candidate rows, then ONE
map-side-combined min(struct(h, dst)) per walk key collapses them —
a hub's fan-out is pre-aggregated map-side before the shuffle, so a
10^8-degree vertex never concentrates rows on one reducer (the same
combine property PageRank's contribution sum relies on). No windows,
no driver state; per-step lineage cuts (CheckpointManager). Steps are
the user-bounded walk length; total output is |starts|·reps·(len+1)
rows, emitted as (start, rep, step, vid) — `F.collect_list` over a
step-sorted group yields sentence arrays when a corpus file is the
target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def random_walks(
    graph: LinkGraph,
    length: int = 8,
    starts: DataFrame | None = None,
    walks_per_node: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(start long, rep int, step int, vid long): the vertex
    at each step of each walk. step 0 = the start vertex itself; a walk
    that reaches a dangling vertex emits no further rows. ``starts``
    (DataFrame with a ``vid`` column) defaults to every vertex;
    ``walks_per_node`` replicates each start with rep = 0..reps-1
    (each rep walks independently — the hash seed includes it)."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="walks")

    if graph.directed:
        edges = graph.edges.select("src", "dst").distinct()
    else:
        edges = graph.symmetric_edges().select("src", "dst")

    if starts is None:
        starts = graph.vertices.select("vid")
    reps = spark.range(walks_per_node).select(F.col("id").cast("int").alias("rep"))
    state = cp.truncate(
        starts.select(F.col("vid").alias("start"))
        .crossJoin(reps)
        .select("start", "rep", F.col("start").alias("cur"))
    )

    out = state.select(
        "start", "rep", F.lit(0).alias("step"), F.col("cur").alias("vid")
    )
    for t in range(length):
        cand = state.join(edges, state.cur == edges.src).select(
            "start",
            "rep",
            "dst",
            hash60(
                F.concat_ws(
                    ":",
                    F.lit("walk"),
                    F.col("start"),
                    F.col("rep"),
                    F.lit(t),
                    F.col("dst"),
                )
            ).alias("h"),
        )
        nxt = (
            cand.groupBy("start", "rep")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("start", "rep", F.col("m.dst").alias("cur"))
        )
        old_state, old_out = state, out
        state = cp.truncate(nxt)
        out = cp.truncate(
            out.unionByName(
                state.select(
                    "start",
                    "rep",
                    F.lit(t + 1).alias("step"),
                    F.col("cur").alias("vid"),
                )
            )
        )
        # the new eager checkpoints hold copies of everything the prior
        # step's frames contributed; free those blocks now. Ordering
        # matters: out's step-0 rows are a lazy select over the INITIAL
        # state checkpoint, so old_state is only releasable after the
        # out truncate above materialized. old_out at t=0 is that lazy
        # select itself (not a checkpoint) — release is a no-op there.
        release_local_checkpoint(old_state)
        if t > 0:
            release_local_checkpoint(old_out)
    if stats is not None:
        stats["length"] = length
        stats["walks_per_node"] = walks_per_node
    return out.select(
        "start", F.col("rep").cast("int").alias("rep"),
        F.col("step").cast("int").alias("step"), "vid",
    )


def walk_sentences(walks: DataFrame) -> DataFrame:
    """Collapse :func:`random_walks` rows into sentence arrays:
    DataFrame(start long, rep int, sentence array<long>) with vertices
    in step order — the skip-gram input shape. One partial-aggregable
    collect over the walk key."""
    return (
        walks.groupBy("start", "rep")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("step", "vid"))
            ).alias("s")
        )
        .select(
            "start",
            "rep",
            F.transform(F.col("s"), lambda x: x["vid"]).alias("sentence"),
        )
    )


#: 2^60 as an exact double divisor: hash60 values are < 2^60, so
#: u = (h+1)/2^60 lands in (0, 1] with identical IEEE rounding in
#: Spark, DuckDB and CPython (cast-to-double then divide-by-2^60 are
#: both correctly-rounded single operations).
_U_DENOM = float(1 << 60)


def node2vec_walks(
    graph: LinkGraph,
    length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    starts: DataFrame | None = None,
    walks_per_node: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec KDD'16): same
    output shape as :func:`random_walks`, but the next hop x from
    vertex v with predecessor t is drawn with node2vec's search bias
    alpha = 1/p if x == t (return), 1 if x is a neighbor of t
    (BFS-ish), 1/q otherwise (DFS-ish); the first hop is uniform.

    Weighted sampling stays in the min(struct) shape via the
    exponential race (Gumbel/expo trick): candidate key
    -ln(u)/alpha with u = (hash60(walk-seed)+1)/2^60 is Exp(alpha)
    distributed, and the per-walk argmin selects x with probability
    alpha_x / sum(alpha) — so the corpus stays deterministic,
    engine-replayable (identical md5 + IEEE arithmetic in DuckDB),
    and hub-safe: the key is computed row-wise and collapsed by ONE
    map-side-combined min per walk, never a per-walk weight array.
    The second-order state adds exactly one extra key-partitioned
    hash join per step (the dist-1 membership probe of (prev, x)
    against the edge table) over the first-order walk — still no
    windows, no driver state, per-step lineage cuts."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="node2vec")
    if graph.directed:
        edges = graph.edges.select("src", "dst").distinct()
    else:
        edges = graph.symmetric_edges().select("src", "dst")
    edges = edges.persist()

    if starts is None:
        starts = graph.vertices.select("vid")
    reps = spark.range(walks_per_node).select(F.col("id").cast("int").alias("rep"))
    state = cp.truncate(
        starts.select(F.col("vid").alias("start"))
        .crossJoin(reps)
        .select(
            "start",
            "rep",
            F.lit(None).cast("long").alias("prev"),
            F.col("start").alias("cur"),
        )
    )
    out = state.select(
        "start", "rep", F.lit(0).alias("step"), F.col("cur").alias("vid")
    )
    ap, a1, aq = 1.0 / p, 1.0, 1.0 / q
    nbr1 = edges.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"),
        F.lit(True).alias("is_nbr1"),
    )
    for t in range(length):
        cand = state.join(edges, state.cur == edges.src).select(
            "start", "rep", "prev", "cur", "dst"
        )
        cand = cand.join(nbr1, ["prev", "dst"], "left")
        u = (
            hash60(
                F.concat_ws(
                    ":",
                    F.lit("n2v"),
                    F.col("start"),
                    F.col("rep"),
                    F.lit(t),
                    F.col("dst"),
                )
            )
            + F.lit(1)
        ) / F.lit(_U_DENOM)
        alpha = (
            F.when(F.col("prev").isNull(), F.lit(a1))
            .when(F.col("dst") == F.col("prev"), F.lit(ap))
            .when(F.col("is_nbr1"), F.lit(a1))
            .otherwise(F.lit(aq))
        )
        keyed = cand.select(
            "start", "rep", "cur", "dst", (-F.log(u) / alpha).alias("k")
        )
        nxt = (
            keyed.groupBy("start", "rep")
            .agg(F.min(F.struct("k", "dst", "cur")).alias("m"))
            .select(
                "start",
                "rep",
                F.col("m.cur").alias("prev"),
                F.col("m.dst").alias("cur"),
            )
        )
        old_state, old_out = state, out
        state = cp.truncate(nxt)
        out = cp.truncate(
            out.unionByName(
                state.select(
                    "start", "rep", F.lit(t + 1).alias("step"),
                    F.col("cur").alias("vid"),
                )
            )
        )
        release_local_checkpoint(old_state)
        if t > 0:
            release_local_checkpoint(old_out)
    if stats is not None:
        stats["length"] = length
        stats["p"] = p
        stats["q"] = q
    edges.unpersist()
    return out.select(
        "start", F.col("rep").cast("int").alias("rep"),
        F.col("step").cast("int").alias("step"), "vid",
    )
