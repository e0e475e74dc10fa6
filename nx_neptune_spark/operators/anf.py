"""Approximate neighborhood function (ANF) via Flajolet-Martin
bitmask sketches — the web-scale "effective diameter" algorithm.

``operators/distance.py`` answers eccentricity/diameter questions
EXACTLY with an all-sources BFS profile and deliberately refuses past
a vertex cap (the profile is O(V*E)). This module is the scale path
the refusal points at: Palmer/Gibbons/Faloutsos ANF (KDD 2002) with
the iteration shape of Boldi/Rosa/Vigna HyperANF (WWW 2011) — each
vertex carries K fixed-size probabilistic counters, and one
sparse-gather round per distance t ORs every vertex's counters with
its neighbors', so after t rounds vertex v's sketch summarizes
|{u : dist(v, u) <= t}|. Memory is K longs per vertex regardless of
the graph, and one round is ONE key-partitioned shuffle (union +
bit_or partial aggregate) — the same per-iteration exchange budget as
the PageRank loop, which is what makes "effective diameter of a
10^12-page crawl" tractable where exact BFS-from-every-vertex is not.

Counters are classic FM bitmasks (not HyperLogLog registers): bit i
of trial k for vertex v is set with probability 2^-(i+1) via a
deterministic integer hash of (vid, k), and the OR of the masks of a
vertex set S estimates |S| as 2^R / 0.77351 where R is the position
of the lowest UNSET bit, averaged over the K trials (Flajolet-Martin
1985). FM-over-bit_or is chosen over HLL-over-max deliberately:
``bit_or`` is a built-in JVM-side aggregate in both Spark and DuckDB,
so the whole iteration stays in whole-stage codegen AND the driver
contract's DuckDB oracle can replay the sketch BIT-FOR-BIT (the hash
is two rounds of a MINSTD-style Lehmer step mod the Mersenne prime
2^31-1 — plain 64-bit-safe integer arithmetic both engines evaluate
exactly).

Determinism: everything is a pure function of (vid, k), so estimates
are reproducible across runs, partitionings, and engines — the same
property every other operator's oracle contract relies on.

Reference scope: the reference (awslabs/nx-neptune) has no
neighborhood-function dispatch; this extends the distance family
(``operators/distance.py``) with its documented scale path.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint

#: FM bias correction constant (Flajolet-Martin 1985, phi).
FM_PHI = 0.77351

#: Lehmer/MINSTD multiplier and the Mersenne prime modulus. Two
#: rounds with a small odd increment; every intermediate product fits
#: int64 (operand < 2^31 after the first reduction, vid*K+k+1 < 2^47
#: even at 10^12 vertices x 64 trials before it).
_LCG_A = 48271
_LCG_C = 11
_LCG_M = 2147483647


def _fm_bit_position(x):  # Column -> Column
    """Deterministic geometric bit position for seed integer x:
    two Lehmer rounds, then the trailing-zero count of the result
    (h & -h isolates the lowest set bit; log2 of a power of two is
    exact in ieee754). P(position = i) ~= 2^-(i+1), i <= 30."""
    h1 = (F.lit(_LCG_A) * x + F.lit(_LCG_C)) % F.lit(_LCG_M)
    h2 = (F.lit(_LCG_A) * h1 + F.lit(_LCG_C)) % F.lit(_LCG_M)
    h = F.when(h2 == 0, F.lit(1)).otherwise(h2)
    return F.log2(h.bitwiseAND(-h)).cast("int")


def _lowest_zero_bit(mask):  # Column -> Column
    """FM's R statistic: position of the lowest UNSET bit of the mask
    (~m & (m+1) isolates it). Masks only ever set bits 0..30, so the
    long's upper zero bits keep this well-defined at saturation."""
    return F.log2(F.bitwise_not(mask).bitwiseAND(mask + 1)).cast("int")


def anf_state0(graph: LinkGraph, k: int = 16) -> DataFrame:
    """Distance-0 sketch table DataFrame(vid long, k int, mask long):
    each vertex's K one-bit seed masks."""
    return (
        graph.vertices.select("vid")
        .crossJoin(F.broadcast(graph.spark.range(k).select(F.col("id").cast("int").alias("k"))))
        .select(
            "vid",
            "k",
            # shiftleft() needs a literal bit count; pow(2, p) is exact
            # in ieee754 for the p <= 30 range _fm_bit_position yields
            F.pow(
                F.lit(2.0),
                _fm_bit_position(F.col("vid") * F.lit(k) + F.col("k") + F.lit(1)),
            ).cast("long").alias("mask"),
        )
    )


def _nf_probe(state: DataFrame) -> tuple[float, int]:
    """(nf, mask_total): the FM neighborhood-function estimate
    sum_v 2^R(v) / phi, plus the exact sum of all masks. OR only ever
    ADDS bits, so mask_total strictly increases whenever ANY sketch
    changed — the exact fixpoint witness, free in the same 1-row
    probe job."""
    per_v = state.groupBy("vid").agg(
        F.avg(_lowest_zero_bit(F.col("mask"))).alias("r"),
        F.sum("mask").alias("m"),
    )
    row = per_v.agg(
        (F.sum(F.pow(F.lit(2.0), F.col("r"))) / F.lit(FM_PHI)).alias("nf"),
        F.sum("m").alias("mask_total"),
    ).first()
    return float(row["nf"]), int(row["mask_total"])


def neighborhood_function(
    graph: LinkGraph,
    t_max: int,
    k: int = 16,
    reverse: bool = False,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(t int, nf double): ANF estimate of
    sum_v |{u : dist(v, u) <= t}| for t = 0..t_max (directed graphs
    follow out-links; ``reverse`` follows in-links; undirected graphs
    use the symmetric edge view).

    One shuffle per distance round (neighbor-gather union + bit_or),
    lineage cut and consumed state released every round. Stops early
    at the sketch fixpoint (OR is monotone: when no mask changed, no
    later t can differ). The per-t curve rows are 1-row aggregates
    pulled as the loop runs — T+1 driver values, the same bounded
    pattern as PageRank's convergence probes."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="anf")
    edges = graph.reversed_edges() if (graph.directed and reverse) else graph.symmetric_edges()
    gather = edges.select(
        F.col("dst").alias("nbr"), F.col("src").alias("vid")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    state = cp.truncate(anf_state0(graph, k))
    nf0, mask_total = _nf_probe(state)
    curve = [(0, nf0)]
    fixpoint_t = None
    for t in range(1, t_max + 1):
        contrib = gather.join(
            state.select(F.col("vid").alias("nbr"), "k", "mask"), "nbr"
        ).select("vid", "k", "mask")
        nxt = cp.truncate(
            state.unionByName(contrib).groupBy("vid", "k").agg(
                F.bit_or("mask").alias("mask")
            )
        )
        nf, nxt_total = _nf_probe(nxt)
        release_local_checkpoint(state)
        state = nxt
        curve.append((t, nf))
        if nxt_total == mask_total:
            fixpoint_t = t
            break
        mask_total = nxt_total
    if stats is not None:
        stats["rounds"] = curve[-1][0]
        stats["k"] = k
        stats["fixpoint"] = fixpoint_t is not None
    # carry a flat curve to t_max when the sketch saturated early
    # (N(t) is constant past the fixpoint by monotonicity)
    last = curve[-1][1]
    curve += [(t, last) for t in range(curve[-1][0] + 1, t_max + 1)]
    gather.unpersist()
    release_local_checkpoint(state)
    return spark.createDataFrame(
        [(int(t), float(nf)) for t, nf in curve], "t int, nf double"
    )


def effective_diameter(
    graph: LinkGraph,
    q: float = 0.9,
    k: int = 32,
    t_max: int = 64,
    reverse: bool = False,
) -> int:
    """Smallest t with NF(t) >= q * NF(t_max) (Palmer et al.'s
    effective-diameter question, integer-valued variant): "90% of all
    reachable page pairs are within t clicks"."""
    curve = {
        r["t"]: r["nf"]
        for r in neighborhood_function(graph, t_max, k=k, reverse=reverse).collect()
    }
    target = q * curve[max(curve)]
    return min(t for t, nf in curve.items() if nf >= target)
