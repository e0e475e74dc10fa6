"""Louvain quality tests: parallel Louvain is an approximation of the
sequential algorithm, so we assert (a) exact communities on structured
fixtures, (b) modularity within a few percent of NetworkX's sequential
Louvain on random graphs."""

import networkx as nx

from fixtures_graphs import two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.louvain import louvain_communities


def comm_sets(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    by = {}
    for r in louvain_communities(lg, **kw).collect():
        by.setdefault(r["community"], set()).add(names[r["vid"]])
    return [set(s) for s in by.values()]


def test_two_triangles(spark):
    got = comm_sets(spark, two_triangles_bridge())
    assert sorted(map(sorted, got)) == [["A", "B", "C"], ["D", "E", "F"]]


def test_weighted_two_triangles(spark):
    got = comm_sets(spark, two_triangles_bridge(weighted=True), weight="weight")
    assert sorted(map(sorted, got)) == [["A", "B", "C"], ["D", "E", "F"]]


def test_disjoint_cliques(spark):
    g = nx.Graph()
    for b in range(0, 30, 5):
        for i in range(b, b + 5):
            for j in range(i + 1, b + 5):
                g.add_edge(i, j)
    got = comm_sets(spark, g)
    want = [
        sorted(str(i) for i in range(b, b + 5)) for b in range(0, 30, 5)
    ]
    assert sorted(map(sorted, got)) == sorted(want)


def test_planted_partition_quality(spark):
    """Ring of 12 cliques (size 8) with single bridges: strong planted
    structure that any reasonable Louvain must recover near-perfectly.
    (Parallel Louvain is an approximation of the sequential algorithm;
    on weak-structure graphs like Barabasi-Albert it can trail the
    sequential modularity, so quality is asserted on planted structure.)
    """
    g = nx.ring_of_cliques(12, 8)
    parts = comm_sets(spark, g, max_levels=4, max_iterations=10)
    parts = [{int(x) for x in s} for s in parts]
    q_ours = nx.community.modularity(g, parts)
    q_seq = nx.community.modularity(
        g, nx.community.louvain_communities(g, seed=42)
    )
    assert q_ours >= 0.95 * q_seq, (q_ours, q_seq)


def test_resolution_extremes_merge_and_split(spark):
    """Generalized-modularity γ behavior on planted structure: γ≈0
    removes the σ² penalty so the bridged cliques merge into one
    community; γ=1 recovers the cliques; a large γ makes every merge
    unprofitable and yields singletons. Deterministic (no RNG)."""
    g = nx.ring_of_cliques(6, 5)
    lo = comm_sets(spark, g, resolution=0.01, max_levels=6)
    assert len(lo) == 1

    mid = comm_sets(spark, g, resolution=1.0)
    assert len(mid) == 6
    assert all(len(s) == 5 for s in mid)

    # γ larger than any k_in*2m/(k_i*k_j) bound: staying alone wins
    hi = comm_sets(spark, g, resolution=50.0)
    assert all(len(s) == 1 for s in hi)


def test_resolution_differential_vs_networkx(spark):
    """Band differential vs sequential NetworkX Louvain at the SAME γ:
    our partition's generalized modularity (resolution=γ) must reach
    >=95% of the sequential algorithm's on planted structure, at both
    a merging (0.5) and a splitting (2.0) resolution."""
    g = nx.ring_of_cliques(10, 6)
    for gamma in (0.5, 2.0):
        parts = comm_sets(spark, g, resolution=gamma, max_levels=4)
        parts = [{int(x) for x in s} for s in parts]
        q_ours = nx.community.modularity(g, parts, resolution=gamma)
        q_seq = nx.community.modularity(
            g,
            nx.community.louvain_communities(g, resolution=gamma, seed=42),
            resolution=gamma,
        )
        assert q_ours >= 0.95 * q_seq, (gamma, q_ours, q_seq)
