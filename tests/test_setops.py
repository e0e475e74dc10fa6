"""Graph set operations (snapshot diff) vs NetworkX."""

import networkx as nx
import pytest

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.setops import (
    compose,
    difference,
    intersection,
    symmetric_difference,
)


@pytest.fixture(scope="module", autouse=True)
def backend(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    yield "spark"


def _lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def _edge_set(lg: LinkGraph) -> set:
    name_of = lg.name_of()
    pairs = {
        (name_of[r["src"]], name_of[r["dst"]]) for r in lg.edges.collect()
    }
    if not lg.directed:
        pairs = {tuple(sorted(p)) for p in pairs}
    return pairs


def _node_set(lg: LinkGraph) -> set:
    return {r["name"] for r in lg.vertices.collect()}


def _nx_edge_set(g) -> set:
    if g.is_directed():
        return {(str(u), str(v)) for u, v in g.edges()}
    return {tuple(sorted((str(u), str(v)))) for u, v in g.edges()}


def _snapshots(directed, seed=21):
    """Two 'crawl snapshots': overlapping gnp graphs on the same node
    universe plus a node unique to each side."""
    cls = nx.DiGraph if directed else nx.Graph
    a = nx.gnp_random_graph(40, 0.08, seed=seed, directed=directed)
    b = nx.gnp_random_graph(40, 0.08, seed=seed + 1, directed=directed)
    ga, gb = cls(a), cls(b)
    ga.add_node(100)  # isolated, only in A
    gb.add_node(200)  # isolated, only in B
    return ga, gb


@pytest.mark.parametrize("directed", [True, False])
def test_compose_matches_nx(spark, directed):
    ga, gb = _snapshots(directed)
    got = compose(_lg(spark, ga), _lg(spark, gb))
    want = nx.compose(ga, gb)
    assert _node_set(got) == {str(n) for n in want.nodes()}
    assert _edge_set(got) == _nx_edge_set(want)


@pytest.mark.parametrize("directed", [True, False])
def test_intersection_matches_nx(spark, directed):
    ga, gb = _snapshots(directed)
    got = intersection(_lg(spark, ga), _lg(spark, gb))
    want = nx.intersection(ga, gb)
    assert _node_set(got) == {str(n) for n in want.nodes()}
    assert _edge_set(got) == _nx_edge_set(want)


@pytest.mark.parametrize("directed", [True, False])
def test_difference_matches_nx(spark, directed):
    cls = nx.DiGraph if directed else nx.Graph
    ga = cls(nx.gnp_random_graph(40, 0.08, seed=3, directed=directed))
    gb = cls(nx.gnp_random_graph(40, 0.08, seed=4, directed=directed))
    gb.add_nodes_from(ga.nodes())
    ga.add_nodes_from(gb.nodes())
    got = difference(_lg(spark, ga), _lg(spark, gb))
    want = nx.difference(ga, gb)
    assert _node_set(got) == {str(n) for n in want.nodes()}
    assert _edge_set(got) == _nx_edge_set(want)


def test_symmetric_difference_matches_nx(spark):
    ga = nx.gnp_random_graph(35, 0.1, seed=5, directed=True)
    gb = nx.gnp_random_graph(35, 0.1, seed=6, directed=True)
    got = symmetric_difference(_lg(spark, ga), _lg(spark, gb))
    want = nx.symmetric_difference(ga, gb)
    assert _node_set(got) == {str(n) for n in want.nodes()}
    assert _edge_set(got) == _nx_edge_set(want)


def test_difference_unequal_nodes_raises(spark):
    ga = nx.DiGraph([(0, 1)])
    gb = nx.DiGraph([(0, 2)])
    with pytest.raises(ValueError, match="Node sets"):
        difference(_lg(spark, ga), _lg(spark, gb))


def test_mixed_directedness_raises(spark):
    ga = nx.DiGraph([(0, 1)])
    gb = nx.Graph([(0, 1)])
    with pytest.raises(ValueError, match="directed"):
        compose(_lg(spark, ga), _lg(spark, gb))


def test_undirected_orientation_insensitive(spark):
    """The same undirected edge stored in opposite orientations must
    intersect — membership is canonicalized on names."""
    ga = nx.Graph([(0, 1), (2, 3)])
    gb = nx.Graph([(1, 0), (3, 4)])
    got = intersection(_lg(spark, ga), _lg(spark, gb))
    assert _edge_set(got) == {("0", "1")}


def test_setops_dispatch(spark):
    ga, gb = _snapshots(True, seed=31)
    want = nx.compose(ga, gb)
    got = nx.compose(ga, gb, backend="spark")
    assert set(got.nodes()) == set(want.nodes())
    assert set(got.edges()) == set(want.edges())
    assert got.is_directed()

    want_i = nx.intersection(ga, gb)
    got_i = nx.intersection(ga, gb, backend="spark")
    assert set(got_i.nodes()) == set(want_i.nodes())
    assert set(got_i.edges()) == set(want_i.edges())

    with pytest.raises(nx.NetworkXError):
        nx.difference(ga, gb, backend="spark")  # unequal node sets

    gb2 = gb.copy()
    gb2.add_nodes_from(ga.nodes())
    ga2 = ga.copy()
    ga2.add_nodes_from(gb.nodes())
    want_d = nx.difference(ga2, gb2)
    got_d = nx.difference(ga2, gb2, backend="spark")
    assert set(got_d.edges()) == set(want_d.edges())
    want_s = nx.symmetric_difference(ga2, gb2)
    got_s = nx.symmetric_difference(ga2, gb2, backend="spark")
    assert set(got_s.edges()) == set(want_s.edges())
