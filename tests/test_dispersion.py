"""Dispersion vs nx.dispersion."""

import math

import networkx as nx

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.dispersion import dispersion


def _spark_disp(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {
        (names[r["u"]], names[r["v"]]): r["dispersion"]
        for r in dispersion(lg, **kw).collect()
    }


def _check(spark, g, **kw):
    want = nx.dispersion(nx.relabel_nodes(g, str), **kw)
    got = _spark_disp(spark, g, **kw)
    flat = {(u, v): x for u, d in want.items() for v, x in d.items()}
    assert set(got) == set(flat)
    for k, x in flat.items():
        assert math.isclose(got[k], x, rel_tol=1e-9, abs_tol=1e-12), (k, got[k], x)


def test_dispersion_karate_style(spark):
    # dense-ish graph with real dispersion structure
    g = nx.barbell_graph(5, 1)
    g.add_edge(0, 11)   # extra bridge-ish ties
    g.add_edge(1, 10)
    _check(spark, g)


def test_dispersion_two_triangles(spark):
    _check(spark, two_triangles_bridge())


def test_dispersion_barabasi(spark):
    _check(spark, barabasi())


def test_dispersion_unnormalized_and_params(spark):
    g = nx.barbell_graph(4, 2)
    _check(spark, g, normalized=False)
    _check(spark, g, alpha=0.6, b=0.4, c=1.0)
