"""Eigenvector centrality vs NetworkX (nx.eigenvector_centrality is
pure-python in nx 3.x, so it runs without scipy; the fixed-depth mode
uses the re-stated update rule in oracles.nx_eigenvector_fixed)."""

import math

import networkx as nx
import pytest

from fixtures_graphs import airport_cycle, barabasi, gnp_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.eigenvector import eigenvector_centrality
from nx_neptune_spark.operators.pagerank import PowerIterationFailedConvergence
from oracles import nx_eigenvector_fixed


def run_spark(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {names[r["vid"]]: r["centrality"] for r in eigenvector_centrality(lg, **kw).collect()}


def assert_close(got, want, tol=1e-9):
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=tol), (k, got[k], want[k])


def test_eigen_undirected_fixed_depth(spark):
    g = barabasi()
    got = run_spark(spark, g, fixed_iterations=12)
    want = {str(k): v for k, v in nx_eigenvector_fixed(g, 12).items()}
    assert_close(got, want)


def test_eigen_digraph_fixed_depth(spark):
    g = gnp_digraph()
    got = run_spark(spark, g, fixed_iterations=10)
    want = {str(k): v for k, v in nx_eigenvector_fixed(g, 10).items()}
    assert_close(got, want)


def test_eigen_tol_matches_networkx(spark):
    g = airport_cycle()
    stats: dict = {}
    got = run_spark(spark, g, max_iter=500, tol=1e-10, stats=stats)
    want = {str(k): v for k, v in nx.eigenvector_centrality(g, max_iter=500, tol=1e-10).items()}
    assert stats["converged"]
    assert_close(got, want, tol=1e-7)


def test_eigen_weighted(spark):
    g = nx.DiGraph()
    g.add_weighted_edges_from(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (2, 0, 1.0), (3, 2, 5.0)]
    )
    got = run_spark(spark, g, fixed_iterations=9, weight="weight")
    want = {str(k): v for k, v in nx_eigenvector_fixed(g, 9, weight="weight").items()}
    assert_close(got, want)


def test_eigen_nstart(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    vid_of = lg.vid_of()
    ns_names = {n: float((i % 4) + 1) for i, n in enumerate(g)}
    names = lg.name_of()
    rows = eigenvector_centrality(
        lg, fixed_iterations=7, nstart={vid_of[n]: v for n, v in ns_names.items()}
    ).collect()
    got = {names[r["vid"]]: r["centrality"] for r in rows}
    want = {str(k): v for k, v in nx_eigenvector_fixed(g, 7, nstart=ns_names).items()}
    assert_close(got, want)


def test_eigen_non_convergence_raises(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(PowerIterationFailedConvergence):
        eigenvector_centrality(lg, max_iter=2, tol=0.0)
