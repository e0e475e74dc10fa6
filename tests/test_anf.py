"""ANF (approximate neighborhood function) vs an exact pure-Python
replay of the same Flajolet-Martin sketch, plus accuracy / fixpoint /
effective-diameter behavior. The sketch is a pure function of
(vid, trial), so the Spark curve must match the replay to float
noise — this pins the hash, the OR propagation, and the estimate
formula bit-for-bit, not just statistically."""

import math

import pytest
from pyspark.sql import functions as F

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.anf import (
    FM_PHI,
    effective_diameter,
    neighborhood_function,
)

M = 2147483647
A = 48271
C = 11


def _seed_mask(vid: int, kk: int, k_total: int) -> int:
    x = vid * k_total + kk + 1
    h1 = (A * x + C) % M
    h2 = (A * h1 + C) % M
    h = h2 or 1
    return h & -h  # == 2^(trailing zeros), the FM geometric bit


def _lowest_zero(mask: int) -> int:
    return ((~mask) & (mask + 1)).bit_length() - 1


def _balls(n: int, edges: list[tuple[int, int]], t_max: int) -> dict:
    """ball[t][v] = {u : dist(v,u) <= t} following edges as given."""
    adj = {v: [] for v in range(n)}
    for s, d in edges:
        adj[s].append(d)
    ball = {0: {v: {v} for v in range(n)}}
    for t in range(1, t_max + 1):
        ball[t] = {
            v: set(ball[t - 1][v]).union(
                *(adj[u] for u in ball[t - 1][v])
            )
            for v in range(n)
        }
    return ball

def _replay_curve(
    n: int, edges: list[tuple[int, int]], t_max: int, k: int
) -> list[float]:
    ball = _balls(n, edges, t_max)
    seeds = {
        (v, kk): _seed_mask(v, kk, k) for v in range(n) for kk in range(k)
    }
    out = []
    for t in range(t_max + 1):
        nf = 0.0
        for v in range(n):
            masks = [0] * k
            for u in ball[t][v]:
                for kk in range(k):
                    masks[kk] |= seeds[(u, kk)]
            r = sum(_lowest_zero(m) for m in masks) / k
            nf += 2.0 ** r
        out.append(nf / FM_PHI)
    return out


def _ring_chord(n: int) -> list[tuple[int, int]]:
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i + 7) % n) for i in range(n) if i % 3 == 0]
    return edges


def _lg(spark, n, edges, directed=True):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.range(n).select(F.col("id").alias("vid"))
    return LinkGraph(e, v, directed=directed)


def test_anf_exact_replay_directed(spark):
    n, t_max, k = 40, 6, 8
    edges = _ring_chord(n)
    got = {
        r["t"]: r["nf"]
        for r in neighborhood_function(_lg(spark, n, edges), t_max, k=k).collect()
    }
    want = _replay_curve(n, edges, t_max, k)
    assert sorted(got) == list(range(t_max + 1))
    for t in range(t_max + 1):
        assert got[t] == pytest.approx(want[t], rel=1e-9)


def test_anf_reverse_follows_in_links(spark):
    n, t_max, k = 30, 4, 8
    edges = [(i, (i + 1) % n) for i in range(n)]  # directed ring
    g = _lg(spark, n, edges)
    got = {
        r["t"]: r["nf"]
        for r in neighborhood_function(g, t_max, k=k, reverse=True).collect()
    }
    want = _replay_curve(n, [(d, s) for s, d in edges], t_max, k)
    for t in range(t_max + 1):
        assert got[t] == pytest.approx(want[t], rel=1e-9)


def test_anf_undirected_symmetric_view(spark):
    n, t_max, k = 24, 3, 8
    half = [(i, (i + 1) % n) for i in range(n)]
    g = _lg(spark, n, half, directed=False)
    sym = half + [(d, s) for s, d in half]
    got = {
        r["t"]: r["nf"]
        for r in neighborhood_function(g, t_max, k=k).collect()
    }
    want = _replay_curve(n, sym, t_max, k)
    for t in range(t_max + 1):
        assert got[t] == pytest.approx(want[t], rel=1e-9)


def test_anf_fixpoint_pads_flat_curve(spark):
    # undirected star: every sketch saturates at t=2; the curve must
    # still carry t_max+1 rows with a constant tail, and stats must
    # witness the early stop.
    n, t_max = 12, 6
    edges = [(0, i) for i in range(1, n)]
    g = _lg(spark, n, edges, directed=False)
    stats = {}
    rows = neighborhood_function(g, t_max, k=8, stats=stats).collect()
    assert len(rows) == t_max + 1
    by_t = {r["t"]: r["nf"] for r in rows}
    assert stats["fixpoint"] is True
    assert stats["rounds"] <= 3
    for t in range(stats["rounds"], t_max + 1):
        assert by_t[t] == by_t[stats["rounds"]]
    # monotone non-decreasing everywhere (OR only adds bits)
    for t in range(1, t_max + 1):
        assert by_t[t] >= by_t[t - 1] - 1e-9


def test_anf_accuracy_against_exact(spark):
    # deterministic hash => a fixed, reproducible estimate. Balls on
    # this fixture are TINY (1..11 vertices), the regime where classic
    # FM bias is worst (measured ratios 0.78..1.83 here, decaying as
    # balls grow) — so the contract is a 2x envelope plus curve shape,
    # not tight relative error; the bit-exact replay tests above pin
    # the sketch itself.
    n, t_max, k = 60, 5, 32
    edges = _ring_chord(n)
    ball = _balls(n, edges, t_max)
    exact = [sum(len(ball[t][v]) for v in range(n)) for t in range(t_max + 1)]
    got = {
        r["t"]: r["nf"]
        for r in neighborhood_function(_lg(spark, n, edges), t_max, k=k).collect()
    }
    for t in range(t_max + 1):
        assert 0.5 * exact[t] <= got[t] <= 2.0 * exact[t]
    # exact NF strictly grows on this fixture; the estimate must too
    for t in range(1, t_max + 1):
        assert got[t] > got[t - 1]


def test_effective_diameter_path_vs_star(spark):
    # star saturates by t=2; a 16-path needs many more hops to cover
    # 90% of pairs — the integer effective diameter must order them.
    star = _lg(spark, 10, [(0, i) for i in range(1, 10)], directed=False)
    assert effective_diameter(star, q=0.9, k=16, t_max=4) <= 2
    n = 16
    path = _lg(
        spark, n, [(i, i + 1) for i in range(n - 1)], directed=False
    )
    d_star = effective_diameter(star, q=0.9, k=16, t_max=4)
    d_path = effective_diameter(path, q=0.9, k=16, t_max=n)
    assert d_path > d_star
