"""descendants / ancestors vs NetworkX."""

import networkx as nx
import pytest

from fixtures_graphs import chain_digraph, gnp_digraph
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph


def _lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def test_chain(spark):
    g = chain_digraph()
    lg = _lg(spark, g)
    assert api.descendants(lg, "A") == {str(n) for n in nx.descendants(g, "A")}
    assert api.ancestors(lg, "E") == {str(n) for n in nx.ancestors(g, "E")}


def test_cycle_excludes_source(spark):
    """Source on a cycle is reachable from itself but still excluded."""
    g = nx.DiGraph([("a", "b"), ("b", "c"), ("c", "a")])
    lg = _lg(spark, g)
    assert api.descendants(lg, "a") == {"b", "c"}
    assert api.ancestors(lg, "a") == {"b", "c"}


@pytest.mark.parametrize("node", [0, 13, 47])
def test_gnp(spark, node):
    g = gnp_digraph()
    lg = _lg(spark, g)
    assert api.descendants(lg, node) == {
        str(n) for n in nx.descendants(g, node)
    }
    assert api.ancestors(lg, node) == {str(n) for n in nx.ancestors(g, node)}


def test_missing_node_raises(spark):
    g = chain_digraph()
    with pytest.raises(ValueError, match="not in the graph"):
        api.descendants(_lg(spark, g), "ZZZ")


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    assert nx.descendants(g, 3, backend="spark") == nx.descendants(g, 3)
    assert nx.ancestors(g, 3, backend="spark") == nx.ancestors(g, 3)
    with pytest.raises(nx.NetworkXError):
        nx.descendants(g, 10**9, backend="spark")
