"""Triadic census vs nx.triadic_census (+ independent table rebuild)."""

import itertools

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.triads import (
    CODE_NAMES,
    TRIAD_NAMES,
    triadic_census,
)


def spark_census(spark, g):
    lg = LinkGraph.from_networkx(spark, g)
    return {r["triad"]: int(r["count"]) for r in triadic_census(lg).collect()}


def test_code_table_matches_networkx():
    """Rebuild CODE_NAMES independently: realize each 6-bit code as a
    3-vertex DiGraph and ask nx which class it is."""
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    for code in range(64):
        g = nx.DiGraph()
        g.add_nodes_from([0, 1, 2])
        g.add_edges_from(p for i, p in enumerate(pairs) if code >> i & 1)
        cen = nx.triadic_census(g)
        (name,) = [k for k, v in cen.items() if v == 1]
        assert CODE_NAMES[code] == name, code


def test_docstring_example(spark):
    g = nx.DiGraph([(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (4, 2)])
    got = spark_census(spark, g)
    assert got == dict(nx.triadic_census(g))
    assert got["030T"] == 2 and got["030C"] == 2


@pytest.mark.parametrize("builder", [gnp_digraph, social_digraph])
def test_fixture_graphs(spark, builder):
    g = builder()
    got = spark_census(spark, g)
    want = dict(nx.triadic_census(g))
    assert got == want
    assert sum(got.values()) == (
        len(g) * (len(g) - 1) * (len(g) - 2) // 6
    )


def test_mutual_heavy(spark):
    """Bidirectional cycle + one-way chords: exercises 102/201/300-side
    classes and the mutual-dyad subtraction."""
    g = nx.DiGraph()
    n = 9
    for i in range(n):
        g.add_edge(i, (i + 1) % n)
        g.add_edge((i + 1) % n, i)
        if i % 3 == 0:
            g.add_edge(i, (i + 4) % n)
    got = spark_census(spark, g)
    assert got == dict(nx.triadic_census(g))


def test_isolated_vertices_and_adapter_order(spark):
    g = nx.DiGraph([(0, 1), (1, 2)])
    g.add_nodes_from([7, 8, 9])
    got = spark_census(spark, g)
    assert got == dict(nx.triadic_census(g))
    from nx_neptune_spark import api

    adapter = api.triadic_census(LinkGraph.from_networkx(spark, g))
    assert list(adapter) == TRIAD_NAMES  # nx key order


def test_undirected_raises(spark):
    with pytest.raises(ValueError):
        triadic_census(LinkGraph.from_networkx(spark, nx.path_graph(3)))


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = nx.triadic_census(g, backend="spark")
    assert dict(got) == dict(nx.triadic_census(g))
