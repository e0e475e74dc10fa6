"""Bipartite test / two-coloring vs nx.is_bipartite / bipartite.color."""

import networkx as nx
import pytest

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.bipartite import bipartite_color, is_bipartite


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def assert_proper_coloring(g, colors):
    """colors: {name: 0|1} — proper and complete."""
    assert set(colors.values()) <= {0, 1}
    for u, v in g.edges():
        assert colors[str(u)] != colors[str(v)], (u, v)


@pytest.mark.parametrize(
    "builder,bip",
    [
        (lambda: nx.path_graph(6), True),
        (lambda: nx.cycle_graph(8), True),
        (lambda: nx.cycle_graph(7), False),  # odd cycle
        (lambda: nx.complete_bipartite_graph(3, 4), True),
        (lambda: nx.complete_graph(4), False),
        (lambda: nx.star_graph(9), True),
    ],
)
def test_is_bipartite(spark, builder, bip):
    g = builder()
    assert nx.is_bipartite(g) == bip  # fixture sanity
    assert is_bipartite(lg(spark, g)) == bip


def test_is_bipartite_directed(spark):
    """nx checks the undirected view: an antiparallel pair is fine, a
    directed odd cycle is not."""
    g = nx.DiGraph([("a", "b"), ("b", "a"), ("b", "c")])
    assert is_bipartite(lg(spark, g)) == nx.is_bipartite(g) is True
    h = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert is_bipartite(lg(spark, h)) == nx.is_bipartite(h) is False


def test_self_loop_not_bipartite(spark):
    g = nx.path_graph(4)
    g.add_edge(1, 1)
    assert not is_bipartite(lg(spark, g))
    with pytest.raises(ValueError):
        bipartite_color(lg(spark, g)).collect()


def test_color_proper_and_nx_equal_on_sorted_order(spark):
    """With sorted insertion order nx's per-component root == min vid,
    so the colorings are identical, isolates included."""
    g = nx.Graph()
    g.add_nodes_from(range(12))  # sorted insertion
    g.add_edges_from([(0, 1), (1, 2), (2, 3), (4, 5), (5, 6)])
    # 7..11 isolates
    graph = lg(spark, g)
    name_of = graph.name_of()
    got = {name_of[r["vid"]]: r["color"] for r in bipartite_color(graph).collect()}
    want = {str(k): v for k, v in nx.bipartite.color(g).items()}
    assert got == want


def test_color_proper_on_multi_component(spark):
    g = nx.disjoint_union(nx.cycle_graph(6), nx.complete_bipartite_graph(2, 3))
    graph = lg(spark, g)
    name_of = graph.name_of()
    got = {name_of[r["vid"]]: r["color"] for r in bipartite_color(graph).collect()}
    assert_proper_coloring(g, got)
    assert len(got) == g.number_of_nodes()


def test_non_bipartite_color_raises(spark):
    with pytest.raises(ValueError):
        bipartite_color(lg(spark, nx.complete_graph(3))).collect()


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.complete_bipartite_graph(3, 4)
    assert nx.is_bipartite(g, backend="spark") is True
    got = nx.bipartite.color(g, backend="spark")
    assert_proper_coloring(g, {str(k): v for k, v in got.items()})
    h = nx.complete_graph(3)
    assert nx.is_bipartite(h, backend="spark") is False
    with pytest.raises(nx.NetworkXError):
        nx.bipartite.color(h, backend="spark")
