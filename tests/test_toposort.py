"""Topological generations / sort vs NetworkX."""

import networkx as nx
import pytest

from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.toposort import (
    topological_generations,
    topological_sort,
)


def _lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def _dag():
    g = nx.DiGraph()
    g.add_edges_from([
        ("a", "c"), ("b", "c"), ("c", "d"), ("c", "e"), ("d", "f"),
        ("e", "f"), ("b", "e"), ("g", "h"),
    ])
    g.add_node("iso")
    return g


def test_generations_match_nx(spark):
    g = _dag()
    got = [set(gen) for gen in api.topological_generations(_lg(spark, g))]
    want = [set(str(n) for n in gen) for gen in nx.topological_generations(g)]
    assert got == want


def test_random_dag(spark):
    base = nx.gnp_random_graph(60, 0.08, seed=7, directed=True)
    g = nx.DiGraph((u, v) for u, v in base.edges() if u < v)  # acyclic
    g.add_nodes_from(base.nodes())
    got = [set(gen) for gen in api.topological_generations(_lg(spark, g))]
    want = [set(str(n) for n in gen) for gen in nx.topological_generations(g)]
    assert got == want


def test_sort_is_valid_topological_order(spark):
    g = _dag()
    order = list(api.topological_sort(_lg(spark, g)))
    pos = {n: i for i, n in enumerate(order)}
    assert set(order) == {str(n) for n in g.nodes()}
    for u, v in g.edges():
        assert pos[str(u)] < pos[str(v)]


def test_cycle_raises(spark):
    g = nx.DiGraph([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    with pytest.raises(ValueError, match="cycle"):
        topological_generations(_lg(spark, g)).collect()


def test_depth_stats_and_condensation_composition(spark):
    """Layering the condensation of a cyclic graph is always legal."""
    from nx_neptune_spark.operators.condensation import condensation

    g = nx.DiGraph([("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
                    ("d", "c"), ("d", "e")])
    lg = _lg(spark, g)
    stats: dict = {}
    rows = topological_generations(condensation(lg), stats=stats).collect()
    # SCCs: {a,b} -> {c,d} -> {e}: depth 3
    assert stats["depth"] == 3
    assert sorted(r["generation"] for r in rows) == [0, 1, 2]


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = _dag()
    got = [set(gen) for gen in nx.topological_generations(g, backend="spark")]
    want = [set(gen) for gen in nx.topological_generations(g)]
    assert got == want
    order = list(nx.topological_sort(g, backend="spark"))
    pos = {n: i for i, n in enumerate(order)}
    for u, v in g.edges():
        assert pos[u] < pos[v]
    with pytest.raises(nx.NetworkXUnfeasible):
        list(nx.topological_sort(nx.DiGraph([(1, 2), (2, 1)]), backend="spark"))
