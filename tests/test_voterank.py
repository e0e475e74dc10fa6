"""VoteRank vs nx.voterank."""

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.voterank import voterank


def spark_voterank(spark, g, k=None):
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    rows = voterank(lg, number_of_nodes=k).collect()
    return [name_of[r["vid"]] for r in sorted(rows, key=lambda r: r["rank"])]


def nx_voterank(g, k=None):
    return [str(v) for v in nx.voterank(g, number_of_nodes=k)]


def test_docstring_undirected(spark):
    g = nx.Graph([(0, 1), (0, 2), (0, 3), (1, 4)])
    assert spark_voterank(spark, g) == nx_voterank(g) == ["0", "1"]


def test_docstring_directed(spark):
    g = nx.DiGraph([(0, 1), (2, 1), (2, 3), (3, 4)])
    assert spark_voterank(spark, g) == nx_voterank(g) == ["2", "3"]


def test_bridge_fixture_full(spark):
    g = two_triangles_bridge()
    assert spark_voterank(spark, g) == nx_voterank(g)


def test_digraph_topk(spark):
    # zero-padded labels: lexicographic vid order == insertion order,
    # so nx's tie-break and the engine's min-vid tie-break coincide
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:03d}", copy=True)
    assert spark_voterank(spark, g, k=5) == nx_voterank(g, k=5)


def test_k_larger_than_n(spark):
    g = nx.path_graph(4)
    assert spark_voterank(spark, g, k=100) == nx_voterank(g, k=100)


def test_empty_and_edgeless(spark):
    g = nx.Graph()
    g.add_nodes_from([1, 2, 3])
    assert spark_voterank(spark, g) == nx_voterank(g) == []


def test_hub_winner_no_broadcast(spark, monkeypatch):
    # one vertex owning ~10% of edges: above a (patched) broadcast
    # threshold the ability update must run as a plain keyed join and
    # still elect the same seeds as nx
    import importlib

    vr = importlib.import_module("nx_neptune_spark.operators.voterank")
    monkeypatch.setattr(vr, "BROADCAST_MAX_DEGREE", 3)
    g = nx.star_graph(40)  # hub 0 with degree 40
    g.add_edges_from((i, i + 1) for i in range(1, 39))
    g = nx.relabel_nodes(g, lambda i: f"{i:03d}", copy=True)
    assert spark_voterank(spark, g, k=5) == nx_voterank(g, k=5)


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.DiGraph([(0, 1), (2, 1), (2, 3), (3, 4)])
    assert nx.voterank(g, backend="spark") == nx.voterank(g)
