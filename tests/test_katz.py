"""Katz centrality vs nx.katz_centrality."""

import math

import networkx as nx
import pytest

from fixtures_graphs import chain_digraph, gnp_digraph, two_triangles_bridge
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.katz import katz_centrality
from nx_neptune_spark.operators.pagerank import PowerIterationFailedConvergence


def _close(got: dict, want: dict, tol=1e-6):
    assert set(got) == {str(k) for k in want}
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, rel_tol=0, abs_tol=tol), k


def spark_katz(spark, g, **kw):
    return api.katz_centrality(LinkGraph.from_networkx(spark, g), **kw)


def test_chain_defaults(spark):
    g = chain_digraph()
    _close(spark_katz(spark, g), nx.katz_centrality(g))


def test_undirected(spark):
    g = two_triangles_bridge()
    _close(spark_katz(spark, g), nx.katz_centrality(g))


def test_gnp_alpha_beta_dict(spark):
    g = gnp_digraph()
    beta = {n: 1.0 + (n % 3) for n in g.nodes()}
    want = nx.katz_centrality(g, alpha=0.05, beta=beta)
    got = spark_katz(spark, g, alpha=0.05, beta={str(k): v for k, v in beta.items()})
    _close(got, want)


def test_unnormalized_weighted(spark):
    g = nx.DiGraph()
    g.add_edge("a", "b", weight=2.0)
    g.add_edge("b", "c", weight=0.5)
    g.add_edge("a", "c", weight=1.0)
    want = nx.katz_centrality(g, normalized=False, weight="weight")
    got = spark_katz(spark, g, normalized=False, weight="weight")
    _close(got, want)


def test_divergence_raises(spark):
    """alpha >= 1/lambda_max diverges: nx raises; so do we."""
    g = nx.complete_graph(6)
    with pytest.raises(PowerIterationFailedConvergence):
        spark_katz(spark, g, alpha=0.5, max_iter=30)


def test_beta_dict_missing_node_raises(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ValueError, match="beta dictionary"):
        katz_centrality(lg, beta={0: 1.0})


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = nx.katz_centrality(g, alpha=0.05, backend="spark")
    want = nx.katz_centrality(g, alpha=0.05)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-6)
