"""HITS hubs/authorities vs the pure-python NetworkX-semantics oracle
(tests/oracles.py::nx_hits; nx.hits itself requires scipy, absent)."""

import math

import networkx as nx
import pytest

from fixtures_graphs import barabasi, gnp_digraph, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.hits import hits
from nx_neptune_spark.operators.pagerank import PowerIterationFailedConvergence
from oracles import nx_hits


def run_spark_hits(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = hits(lg, **kw).collect()
    return (
        {names[r["vid"]]: r["hub"] for r in rows},
        {names[r["vid"]]: r["authority"] for r in rows},
    )


def assert_pair_close(got, want, tol=1e-9):
    gh, ga = got
    wh, wa = want
    assert set(gh) == set(wh)
    for k in wh:
        assert math.isclose(gh[k], wh[k], rel_tol=0, abs_tol=tol), (k, gh[k], wh[k])
    for k in wa:
        assert math.isclose(ga[k], wa[k], rel_tol=0, abs_tol=tol), (k, ga[k], wa[k])


def _oracle(g, **kw):
    h, a = nx_hits(g, **kw)
    return {str(k): v for k, v in h.items()}, {str(k): v for k, v in a.items()}


def test_hits_digraph_fixed_depth(spark):
    g = social_digraph()
    got = run_spark_hits(spark, g, fixed_iterations=15)
    assert_pair_close(got, _oracle(g, fixed_iterations=15))


def test_hits_tol_converges_and_stats(spark):
    g = gnp_digraph()
    stats: dict = {}
    got = run_spark_hits(spark, g, max_iter=200, tol=1e-10, stats=stats)
    assert stats["converged"] and stats["delta"] < 1e-10
    assert_pair_close(got, _oracle(g, max_iter=200, tol=1e-10), tol=1e-7)


def test_hits_undirected_matches(spark):
    g = barabasi()
    got = run_spark_hits(spark, g, fixed_iterations=10)
    assert_pair_close(got, _oracle(g, fixed_iterations=10))


def test_hits_weighted(spark):
    g = nx.DiGraph()
    g.add_weighted_edges_from(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (2, 0, 1.0), (3, 2, 5.0)]
    )
    got = run_spark_hits(spark, g, fixed_iterations=12, weight="weight")
    assert_pair_close(got, _oracle(g, fixed_iterations=12, weight="weight"))


def test_hits_nstart_and_unnormalized(spark):
    g = social_digraph()
    ns_names = {n: float((i % 3) + 1) for i, n in enumerate(g)}
    lg = LinkGraph.from_networkx(spark, g)
    vid_of = lg.vid_of()
    ns_vids = {vid_of[n]: v for n, v in ns_names.items()}
    names = lg.name_of()
    rows = hits(lg, fixed_iterations=8, nstart=ns_vids, normalized=False).collect()
    got = (
        {names[r["vid"]]: r["hub"] for r in rows},
        {names[r["vid"]]: r["authority"] for r in rows},
    )
    assert_pair_close(
        got, _oracle(g, fixed_iterations=8, nstart=ns_names, normalized=False)
    )


def test_hits_dangling_and_sourceless_get_zero(spark):
    """Vertices with no out-edges have hub 0; with no in-edges,
    authority 0 — and an isolate has both 0 (nx dict semantics)."""
    g = nx.DiGraph()
    g.add_edges_from([(0, 1), (0, 2), (3, 2)])
    g.add_node(9)
    got_h, got_a = run_spark_hits(spark, g, fixed_iterations=6)
    want_h, want_a = _oracle(g, fixed_iterations=6)
    assert_pair_close((got_h, got_a), (want_h, want_a))
    assert got_h["1"] == 0.0 and got_h["2"] == 0.0  # no out-edges
    assert got_a["0"] == 0.0 and got_a["3"] == 0.0  # no in-edges
    assert got_h["9"] == 0.0 and got_a["9"] == 0.0


def test_hits_non_convergence_raises(spark):
    g = social_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    # tol=0 can never be undercut (delta >= 0 and the check is strict),
    # so exhaustion is guaranteed regardless of how fast values settle
    with pytest.raises(PowerIterationFailedConvergence):
        hits(lg, max_iter=2, tol=0.0)


def test_hits_edgeless_graph_all_zero(spark):
    g = nx.DiGraph()
    g.add_nodes_from(range(4))
    got_h, got_a = run_spark_hits(spark, g, fixed_iterations=3)
    assert all(v == 0.0 for v in got_h.values())
    assert all(v == 0.0 for v in got_a.values())
