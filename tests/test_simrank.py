"""SimRank vs nx.simrank_similarity."""

import math

import networkx as nx
import pytest

from fixtures_graphs import social_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.simrank import (
    ExceededMaxIterations,
    simrank_similarity,
)


def _spark_simrank(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = simrank_similarity(lg, **kw).collect()
    out = {}
    for r in rows:
        out[(names[r["a"]], names[r["b"]])] = r["sim"]
    return out


def _check(spark, g, **kw):
    want = nx.simrank_similarity(nx.relabel_nodes(g, str), **kw)
    got = _spark_simrank(spark, g, **kw)
    for u, row in want.items():
        for v, s in row.items():
            gs = got.get((u, v), 0.0)
            assert math.isclose(gs, s, rel_tol=1e-9, abs_tol=1e-12), (u, v, gs, s)


def test_simrank_undirected(spark):
    _check(spark, two_triangles_bridge())


def test_simrank_digraph_uses_predecessors(spark):
    _check(spark, social_digraph())


def test_simrank_importance_factor(spark):
    _check(spark, nx.cycle_graph(6), importance_factor=0.7)


def test_simrank_bipartite_classic(spark):
    # the Jeh-Widom running example shape: two "universities", shared
    # "professors/students"
    g = nx.Graph(
        [("UnivA", "ProfA"), ("UnivB", "ProfB"), ("ProfA", "StudentA"),
         ("ProfB", "StudentB"), ("StudentA", "UnivB"), ("StudentB", "UnivA")]
    )
    _check(spark, g)


def test_simrank_max_iterations_quirk(spark):
    # nx raises whenever the last permitted iteration runs, even if it
    # converged there; mirror by comparing against nx behavior
    g = nx.path_graph(4)
    with pytest.raises(nx.ExceededMaxIterations):
        nx.simrank_similarity(g, max_iterations=2)
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ExceededMaxIterations):
        simrank_similarity(lg, max_iterations=2)


def test_simrank_fixed_iterations_no_raise(spark):
    g = nx.path_graph(4)
    lg = LinkGraph.from_networkx(spark, g)
    stats = {}
    res = simrank_similarity(lg, fixed_iterations=3, stats=stats)
    assert stats["iterations"] == 3
    assert res.where("a = b").count() == 4  # diagonal intact
