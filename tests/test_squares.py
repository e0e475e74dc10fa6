"""Square clustering vs nx.square_clustering."""

import math

import networkx as nx
import pytest

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.squares import square_clustering


def compare(spark, g):
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    got = {
        name_of[r["vid"]]: r["square_clustering"]
        for r in square_clustering(lg).collect()
    }
    want = nx.square_clustering(g)
    assert got.keys() == {str(k) for k in want}
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_cycle4(spark):
    compare(spark, nx.cycle_graph(4))  # every node in exactly one square


def test_complete_bipartite(spark):
    compare(spark, nx.complete_bipartite_graph(3, 4))


@pytest.mark.parametrize("builder", [two_triangles_bridge, barabasi])
def test_fixtures(spark, builder):
    compare(spark, builder())


def test_hypercube(spark):
    compare(spark, nx.hypercube_graph(3))


def test_with_isolates_and_leaves(spark):
    g = nx.cycle_graph(4)
    g.add_edge(0, 9)  # leaf
    g.add_node(7)  # isolate
    compare(spark, g)


def test_directed_raises(spark):
    with pytest.raises(NotImplementedError):
        square_clustering(
            LinkGraph.from_networkx(spark, nx.DiGraph([(0, 1), (1, 2)]))
        )


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.complete_bipartite_graph(2, 3)
    got = nx.square_clustering(g, backend="spark")
    want = nx.square_clustering(g)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9)
