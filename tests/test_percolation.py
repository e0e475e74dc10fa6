"""Percolation centrality vs nx.percolation_centrality."""

import math

import networkx as nx
import pytest

from fixtures_graphs import barabasi, social_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.percolation import percolation_centrality


def _states_for(g, seed_mul=13):
    return {n: ((hash_int(n) * seed_mul + 5) % 11) / 10.0 for n in g.nodes}


def hash_int(n):
    # deterministic small int per node label
    return sum(ord(c) for c in str(n))


def _spark_pc(spark, g, states):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = {v: k for k, v in names.items()}
    sdf = spark.createDataFrame(
        [(vid_of[str(n)], float(x)) for n, x in states.items()], "vid long, x double"
    )
    rows = percolation_centrality(lg, sdf).collect()
    return {names[r["vid"]]: r["percolation"] for r in rows}


def _check(spark, g):
    states = _states_for(g)
    gs = nx.relabel_nodes(g, str)
    want = nx.percolation_centrality(
        gs, states={str(k): v for k, v in states.items()}
    )
    got = _spark_pc(spark, g, states)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), (
            k, got[k], want[k],
        )


def test_percolation_two_triangles(spark):
    _check(spark, two_triangles_bridge())


def test_percolation_digraph(spark):
    _check(spark, social_digraph())


def test_percolation_barabasi(spark):
    _check(spark, barabasi())


def test_percolation_uniform_states_proportional_to_betweenness(spark):
    # with all x equal, the weight factor is constant: x/(Sx - x)
    g = nx.path_graph(5)
    states = {n: 0.5 for n in g.nodes}
    got = _spark_pc(spark, g, states)
    want = nx.percolation_centrality(
        nx.relabel_nodes(g, str), states={str(n): 0.5 for n in g.nodes}
    )
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12)


def test_percolation_tiny_graph_raises(spark):
    g = nx.path_graph(2)
    lg = LinkGraph.from_networkx(spark, g)
    sdf = lg.spark.createDataFrame([(0, 0.5), (1, 0.5)], "vid long, x double")
    with pytest.raises(ZeroDivisionError):
        percolation_centrality(lg, sdf)
