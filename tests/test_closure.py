"""Transitive closure / reduction vs NetworkX."""

import networkx as nx
import pytest

from fixtures_graphs import social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.closure import (
    transitive_closure,
    transitive_reduction,
)


def _spark_edges(spark, g, fn, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {
        (names[r["src"]], names[r["dst"]]) for r in fn(lg, **kw).collect()
    }


def _nx_edges(g):
    return {(str(u), str(v)) for u, v in g.edges}


def test_closure_reflexive_contract(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0), (3, 4), (5, 5)])
    for refl in (False, True, None):
        want = _nx_edges(nx.transitive_closure(g, reflexive=refl))
        got = _spark_edges(spark, g, transitive_closure, reflexive=refl)
        assert got == want, refl


def test_closure_social(spark):
    g = social_digraph()
    want = _nx_edges(nx.transitive_closure(g))
    got = _spark_edges(spark, g, transitive_closure, reflexive=False)
    assert got == want


def test_closure_deep_chain_log_rounds(spark):
    g = nx.path_graph(33, create_using=nx.DiGraph)
    lg = LinkGraph.from_networkx(spark, g)
    stats = {}
    res = transitive_closure(lg, stats=stats)
    assert res.count() == 33 * 32 // 2
    assert stats["rounds"] <= 7  # log2(32)+fixpoint probe, not 32


def test_reduction_dag(spark):
    g = nx.DiGraph(
        [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4), (1, 4)]
    )
    want = _nx_edges(nx.transitive_reduction(g))
    got = _spark_edges(spark, g, transitive_reduction)
    assert got == want


def test_reduction_rejects_cycles(spark):
    g = nx.DiGraph([(0, 1), (1, 0)])
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ValueError):
        transitive_reduction(lg).collect()
