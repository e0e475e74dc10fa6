"""Weighted SSSP (frontier Bellman-Ford) vs
nx.single_source_dijkstra_path_length."""

import math

import networkx as nx
import pytest

from fixtures_graphs import airport_cycle, barabasi, gnp_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.sssp import shortest_path_lengths


def run_spark(spark, g, source, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = lg.vid_of()
    rows = shortest_path_lengths(lg, vid_of[str(source)], **kw).collect()
    return {names[r["vid"]]: r["distance"] for r in rows}


def assert_dists(got, want):
    want = {str(k): v for k, v in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], float(want[k]), rel_tol=0, abs_tol=1e-9), (
            k,
            got[k],
            want[k],
        )


def test_sssp_weighted_digraph(spark):
    g = gnp_digraph()
    for i, (u, v) in enumerate(g.edges):
        g[u][v]["weight"] = float((u + v) % 5 + 1)
    got = run_spark(spark, g, 0)
    assert_dists(got, nx.single_source_dijkstra_path_length(g, 0))


def test_sssp_unreachable_absent(spark):
    g = nx.DiGraph([("A", "B"), ("B", "C"), ("D", "E")])
    g.add_node("X")
    got = run_spark(spark, g, "A", weight=None)
    assert_dists(got, {"A": 0, "B": 1, "C": 2})


def test_sssp_hop_counts_match_bfs(spark):
    g = barabasi()
    got = run_spark(spark, g, 0, weight=None)
    assert_dists(got, nx.single_source_shortest_path_length(g, 0))


def test_sssp_blocked_check_every_exact(spark):
    """check_every>1 overshoots inside a block but the fixpoint is
    invariant, so distances are identical; stats report the blocked
    round count."""
    g = airport_cycle()
    for u, v in g.edges:
        g[u][v]["weight"] = 2.5
    stats: dict = {}
    got = run_spark(spark, g, "YVR", check_every=4, stats=stats)
    assert stats["converged"] and stats["rounds"] % 4 == 0
    assert_dists(got, nx.single_source_dijkstra_path_length(g, "YVR"))


def test_sssp_negative_weight_rejected(spark):
    g = nx.DiGraph()
    g.add_edge("A", "B", weight=-1.0)
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ValueError, match="negative"):
        shortest_path_lengths(lg, lg.vid_of()["A"])
    # opt-out runs label-correcting Bellman-Ford (no negative cycles)
    g2 = nx.DiGraph()
    g2.add_edge("A", "B", weight=5.0)
    g2.add_edge("A", "C", weight=1.0)
    g2.add_edge("C", "B", weight=-3.0)
    got = run_spark(spark, g2, "A", validate_nonnegative=False)
    assert_dists(got, nx.single_source_bellman_ford_path_length(g2, "A"))
