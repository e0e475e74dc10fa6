"""DAG longest path (critical path) and reachability vs NetworkX."""

import networkx as nx
import pytest

from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.bfs import has_path
from nx_neptune_spark.operators.dagpath import (
    dag_longest_path,
    dag_longest_path_length,
    dag_longest_path_table,
)


def _lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def _random_dag(n=60, p=0.08, seed=7, weights=None):
    """gnp digraph filtered to u < v edges (always acyclic); optional
    deterministic per-edge weights via the callable ``weights(u, v)``."""
    base = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    g = nx.DiGraph()
    g.add_nodes_from(base.nodes())
    for u, v in base.edges():
        if u < v:
            if weights is None:
                g.add_edge(u, v)
            else:
                g.add_edge(u, v, weight=weights(u, v))
    return g


def test_unweighted_length_matches_nx(spark):
    g = _random_dag()
    assert api.dag_longest_path_length(_lg(spark, g)) == nx.dag_longest_path_length(g)


def test_unweighted_path_is_valid_and_maximal(spark):
    """nx breaks ties by dict order, so compare path VALIDITY + total
    length, not the literal vertex sequence."""
    g = _random_dag()
    path = api.dag_longest_path(_lg(spark, g))
    assert len(path) == nx.dag_longest_path_length(g) + 1
    ipath = [int(v) for v in path]
    for u, v in zip(ipath, ipath[1:]):
        assert g.has_edge(u, v)


def test_weighted_length_matches_nx(spark):
    g = _random_dag(weights=lambda u, v: (u * 7 + v * 13) % 9 + 1)
    got = api.dag_longest_path_length(_lg(spark, g), weight="weight")
    assert got == nx.dag_longest_path_length(g, weight="weight")


def test_weighted_path_total_matches(spark):
    g = _random_dag(weights=lambda u, v: (u * 3 + v) % 5 + 1)
    path = [int(v) for v in api.dag_longest_path(_lg(spark, g), weight="weight")]
    total = sum(g[u][v]["weight"] for u, v in zip(path, path[1:]))
    assert total == nx.dag_longest_path_length(g, weight="weight")


def test_negative_weight_clamp_matches_nx(spark):
    """nx restarts a vertex as its own source when the best incoming
    total is negative (dist[v] = (0, v)); pin that clamp."""
    g = nx.DiGraph()
    g.add_edge(0, 1, weight=-5)
    g.add_edge(1, 2, weight=3)
    g.add_edge(0, 3, weight=1)
    lg = _lg(spark, g)
    assert api.dag_longest_path_length(lg) == nx.dag_longest_path_length(g)
    path = [int(v) for v in api.dag_longest_path(lg)]
    # best path restarts at 1 (clamped) then 1->2 = 3 > 0->3 = 1
    assert path == [1, 2]


def test_default_weight_for_missing_attr(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (0, 2)])
    got = api.dag_longest_path_length(_lg(spark, g), default_weight=2)
    assert got == nx.dag_longest_path_length(g, default_weight=2)


def test_table_dist_equals_nx_dp(spark):
    """Per-vertex dist from the table equals nx's internal DP value
    (reconstructed by running nx on each prefix is overkill — instead
    check dist(v) == longest path ending at v via nx over the
    reversed-reachable subgraph)."""
    g = _random_dag(n=30, p=0.15, seed=3)
    lg = _lg(spark, g)
    rows = dag_longest_path_table(lg, weight=None).collect()
    name_of = lg.name_of()
    got = {int(name_of[r["vid"]]): r["dist"] for r in rows}
    # unweighted dist(v) == generation(v) in a Kahn layering
    want = {}
    for depth, gen in enumerate(nx.topological_generations(g)):
        for v in gen:
            want[v] = float(depth)
    assert got == want


def test_empty_and_edgeless(spark):
    g = nx.DiGraph()
    g.add_nodes_from([0, 1, 2])
    lg = _lg(spark, g)
    assert api.dag_longest_path_length(lg) == 0
    assert len(api.dag_longest_path(lg)) == 1  # a single vertex, like nx


def test_cycle_raises(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError):
        dag_longest_path_length(_lg(spark, g))


def test_undirected_rejected(spark):
    g = nx.Graph([(0, 1)])
    with pytest.raises(ValueError, match="directed"):
        api.dag_longest_path(_lg(spark, g))


# ---- reachability probes ------------------------------------------------


def test_has_path_matches_nx(spark):
    g = nx.gnp_random_graph(40, 0.05, seed=11, directed=True)
    lg = _lg(spark, g)
    vid_of = lg.vid_of()
    for s, t in [(0, 1), (5, 30), (12, 12), (3, 39), (20, 4)]:
        assert has_path(lg, vid_of[str(s)], vid_of[str(t)]) == nx.has_path(
            g, s, t
        ), (s, t)


def test_has_path_api_node_not_found(spark):
    g = nx.DiGraph([(0, 1)])
    with pytest.raises(ValueError, match="not in G"):
        api.has_path(_lg(spark, g), 0, 99)


def test_sssp_length_api_matches_nx(spark):
    g = nx.gnp_random_graph(50, 0.06, seed=9, directed=True)
    got = api.single_source_shortest_path_length(_lg(spark, g), 0)
    want = {str(k): v for k, v in nx.single_source_shortest_path_length(g, 0).items()}
    assert got == want


def test_sssp_length_cutoff(spark):
    g = nx.path_graph(10, create_using=nx.DiGraph)
    got = api.single_source_shortest_path_length(_lg(spark, g), 0, cutoff=3)
    want = {str(k): v for k, v in nx.single_source_shortest_path_length(g, 0, cutoff=3).items()}
    assert got == want


def test_is_dag_api(spark):
    dag = _random_dag(n=20, p=0.2, seed=5)
    assert api.is_directed_acyclic_graph(_lg(spark, dag)) is True
    cyc = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert api.is_directed_acyclic_graph(_lg(spark, cyc)) is False
    undirected = nx.Graph([(0, 1)])
    assert api.is_directed_acyclic_graph(_lg(spark, undirected)) is False
