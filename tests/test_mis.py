"""Maximal independent set: property parity with nx (independence +
maximality of the returned set on the SAME graph), determinism, and
round semantics."""

import networkx as nx

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.mis import maximal_independent_set


def spark_mis(spark, g, stats=None):
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    rows = maximal_independent_set(lg, stats=stats).collect()
    return {name_of[r["vid"]] for r in rows}, {
        name_of[r["vid"]]: r["round"] for r in rows
    }


def assert_is_mis(g: nx.Graph, s: set):
    und = g.to_undirected() if g.is_directed() else g
    for u in s:
        for v in s:
            if u != v:
                assert not und.has_edge(u, v), f"not independent: {u}-{v}"
    # maximal: every vertex outside s has a neighbor in s
    for v in und.nodes:
        if v not in s:
            assert any(n in s for n in und.neighbors(v)), f"not maximal at {v}"


def test_bridge_fixture(spark):
    g = two_triangles_bridge()
    s, _ = spark_mis(spark, g)
    assert_is_mis(g, s)


def test_barabasi_properties_and_determinism(spark):
    # string labels: from_networkx stringifies node names, so the
    # nx-side property check must see the same labels
    g = nx.relabel_nodes(barabasi(), lambda i: f"{i:04d}", copy=True)
    s1, r1 = spark_mis(spark, g)
    s2, r2 = spark_mis(spark, g)
    assert_is_mis(g, s1)
    assert s1 == s2 and r1 == r2


def test_digraph_uses_undirected_view(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    s, _ = spark_mis(spark, g)
    assert_is_mis(g, s)


def test_isolates_elected_round0(spark):
    g = nx.Graph()
    g.add_edge("A", "B")
    g.add_node("Z")
    s, rounds = spark_mis(spark, g)
    assert "Z" in s and rounds["Z"] == 0
    assert_is_mis(g, s)


def test_path_rounds_bounded(spark):
    g = nx.path_graph(32)
    g = nx.relabel_nodes(g, lambda i: f"{i:03d}")
    stats = {}
    s, _ = spark_mis(spark, g, stats=stats)
    assert_is_mis(g, s)
    # Luby terminates fast; the probe is that rounds were recorded and
    # far below the max_rounds bound (expected O(log n))
    assert 1 <= stats["rounds"] <= 16


def test_empty_graph(spark):
    g = nx.Graph()
    s, _ = spark_mis(spark, g)
    assert s == set()
