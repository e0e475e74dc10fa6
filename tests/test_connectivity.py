"""Directed/undirected connectivity surface vs NetworkX:
weakly_connected_components, is_* predicates, attracting_components."""

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.condensation import attracting_components


def _lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def test_weakly_connected_components(spark):
    g = gnp_digraph()
    got = {frozenset(c) for c in api.weakly_connected_components(_lg(spark, g))}
    want = {
        frozenset(str(n) for n in c) for c in nx.weakly_connected_components(g)
    }
    assert got == want
    assert api.number_weakly_connected_components(
        _lg(spark, g)
    ) == nx.number_weakly_connected_components(g)


def test_is_predicates(spark):
    gu = two_triangles_bridge()
    assert api.is_connected(_lg(spark, gu)) == nx.is_connected(gu)
    gu2 = nx.Graph(gu)
    gu2.add_node("lonely")
    assert api.is_connected(_lg(spark, gu2)) is False

    gd = nx.DiGraph([("a", "b"), ("b", "a"), ("b", "c")])
    assert api.is_weakly_connected(_lg(spark, gd)) is True
    assert api.is_strongly_connected(_lg(spark, gd)) is False
    ring = nx.cycle_graph(5, create_using=nx.DiGraph)
    assert api.is_strongly_connected(_lg(spark, ring)) is True


def test_is_connected_null_graph_raises(spark):
    g = nx.Graph()
    with pytest.raises(ValueError):
        api.is_connected(_lg(spark, g))


def test_attracting_components(spark):
    g = gnp_digraph()
    got = {frozenset(c) for c in api.attracting_components(_lg(spark, g))}
    want = {
        frozenset(str(n) for n in c) for c in nx.attracting_components(g)
    }
    assert got == want
    assert api.number_attracting_components(
        _lg(spark, g)
    ) == nx.number_attracting_components(g)


def test_attracting_components_bowtie(spark):
    """IN -> core cycle -> OUT: only OUT's sink attracts."""
    g = nx.DiGraph()
    g.add_edges_from([("i", "c0"), ("c0", "c1"), ("c1", "c0"),
                      ("c1", "o0"), ("o0", "o1")])
    lg = _lg(spark, g)
    rows = attracting_components(lg).collect()
    names = lg.name_of()
    got = {names[r["vid"]] for r in rows}
    assert got == {"o1"}


def test_connectivity_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = {
        frozenset(c)
        for c in nx.weakly_connected_components(g, backend="spark")
    }
    want = {frozenset(c) for c in nx.weakly_connected_components(g)}
    assert got == want
    assert nx.is_strongly_connected(g, backend="spark") == nx.is_strongly_connected(g)
    got_a = {frozenset(c) for c in nx.attracting_components(g, backend="spark")}
    want_a = {frozenset(c) for c in nx.attracting_components(g)}
    assert got_a == want_a
