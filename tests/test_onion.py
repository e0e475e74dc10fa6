"""Onion decomposition vs nx.onion_layers."""

import networkx as nx

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.onion import onion_layers


def _spark_layers(spark, g):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {names[r["vid"]]: r["layer"] for r in onion_layers(lg).collect()}


def _nx_layers(g):
    return {str(k): v for k, v in nx.onion_layers(nx.relabel_nodes(g, str)).items()}


def test_onion_two_triangles(spark):
    g = two_triangles_bridge()
    assert _spark_layers(spark, g) == _nx_layers(g)


def test_onion_barabasi(spark):
    g = barabasi()
    assert _spark_layers(spark, g) == _nx_layers(g)


def test_onion_isolates_shift_layers(spark):
    g = nx.cycle_graph(5)
    g.add_nodes_from([100, 101])  # nx: isolates are layer 1, cycle layer 2
    got = _spark_layers(spark, g)
    assert got == _nx_layers(g)
    assert got["100"] == 1 and got["0"] == 2


def test_onion_path_peels_inward(spark):
    g = nx.path_graph(9)
    assert _spark_layers(spark, g) == _nx_layers(g)


def test_onion_mixed_cores_and_pendants(spark):
    g = nx.barbell_graph(5, 3)
    g.add_edge(0, 200)
    g.add_edge(200, 201)
    assert _spark_layers(spark, g) == _nx_layers(g)
