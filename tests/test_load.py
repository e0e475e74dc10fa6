"""Load centrality vs nx.load_centrality."""

import math

import networkx as nx

from fixtures_graphs import barabasi, social_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.load import load_centrality


def _spark_load(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {names[r["vid"]]: r["load"] for r in load_centrality(lg, **kw).collect()}


def _check(spark, g, **kw):
    want = nx.load_centrality(nx.relabel_nodes(g, str), **kw)
    got = _spark_load(spark, g, **kw)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), (
            k, got[k], want[k],
        )


def test_load_two_triangles(spark):
    _check(spark, two_triangles_bridge())


def test_load_differs_from_betweenness_where_it_should(spark):
    # the classic example: load splits equally, betweenness by sigma
    g = nx.Graph(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 6), (6, 4)]
    )
    _check(spark, g)


def test_load_digraph(spark):
    _check(spark, social_digraph())


def test_load_unnormalized(spark):
    _check(spark, two_triangles_bridge(), normalized=False)


def test_load_cutoff(spark):
    g = nx.path_graph(7)
    want = nx.load_centrality(nx.relabel_nodes(g, str), cutoff=2)
    got = _spark_load(spark, g, cutoff=2)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12)


def test_load_barabasi(spark):
    _check(spark, barabasi())
