"""k-truss edge peeling vs nx.k_truss."""

import networkx as nx
import pytest

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.ktruss import k_truss


def run_spark(spark, g, k, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {
        frozenset((names[r["u"]], names[r["v"]]))
        for r in k_truss(lg, k, **kw).collect()
    }


def nx_edges(g, k):
    return {frozenset((str(a), str(b))) for a, b in nx.k_truss(g, k).edges}


def test_ktruss_bridge_fixture(spark):
    g = two_triangles_bridge()
    # k=3: every edge in >=1 triangle -> the bridge drops, cliques stay
    assert run_spark(spark, g, 3) == nx_edges(g, 3)


def test_ktruss_powerlaw_several_k(spark):
    g = barabasi()
    for k in (3, 4, 5):
        stats: dict = {}
        got = run_spark(spark, g, k, stats=stats)
        assert stats["converged"]
        assert got == nx_edges(g, k)


def test_ktruss_k2_is_whole_edge_set(spark):
    g = two_triangles_bridge()
    assert run_spark(spark, g, 2) == {
        frozenset((str(a), str(b))) for a, b in g.edges
    }


def test_ktruss_cascade_to_empty(spark):
    # cycle has no triangles: k=3 truss is empty
    g = nx.cycle_graph(8)
    assert run_spark(spark, g, 3) == set()


def test_ktruss_rejects_small_k(spark):
    g = two_triangles_bridge()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ValueError, match="k must be >= 2"):
        k_truss(lg, 1)
