"""Boruvka minimum spanning forest vs nx.minimum_spanning_edges."""

import random

import networkx as nx

from fixtures_graphs import barabasi
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.msf import (
    minimum_spanning_edges,
    minimum_spanning_forest_weight,
)


def _distinct_weights(g, seed=7):
    rnd = random.Random(seed)
    ws = rnd.sample(range(1, 10 * g.number_of_edges() + 1), g.number_of_edges())
    for (u, v), w in zip(g.edges, ws):
        g[u][v]["weight"] = float(w)
    return g


def _spark_forest(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = minimum_spanning_edges(lg, **kw).collect()
    return {frozenset((names[r["src"]], names[r["dst"]])): r["weight"] for r in rows}


def _nx_forest(g, maximum=False):
    fn = nx.maximum_spanning_edges if maximum else nx.minimum_spanning_edges
    return {
        frozenset((str(u), str(v))): float(d["weight"])
        for u, v, d in fn(g, data=True)
    }


def test_msf_distinct_weights_unique_mst(spark):
    g = _distinct_weights(barabasi())
    assert _spark_forest(spark, g) == _nx_forest(g)


def test_msf_disconnected_forest_with_isolates(spark):
    g1 = _distinct_weights(nx.gnm_random_graph(12, 22, seed=3), seed=11)
    g = nx.disjoint_union(g1, _distinct_weights(nx.cycle_graph(5), seed=13))
    g.add_nodes_from([100, 101])  # isolates: contribute no edges
    got = _spark_forest(spark, g)
    assert got == _nx_forest(g)
    # forest size = n_non_isolated_components invariant: n - c
    assert len(got) == g.number_of_nodes() - nx.number_connected_components(g)


def test_msf_maximum_variant(spark):
    g = _distinct_weights(barabasi(), seed=23)
    assert _spark_forest(spark, g, maximum=True) == _nx_forest(g, maximum=True)


def test_msf_unweighted_ties_weight_parity(spark):
    # all weights 1.0: edge sets may differ under ties, but any MSF has
    # exactly n - c edges of weight 1
    g = nx.gnm_random_graph(20, 35, seed=5)
    lg = LinkGraph.from_networkx(spark, g)
    total = minimum_spanning_forest_weight(lg)
    expect = g.number_of_nodes() - nx.number_connected_components(g)
    assert total == float(expect)


def test_msf_parallel_and_self_loop_rows(spark):
    # raw edge tables may carry parallel rows + self-loops; the forest
    # uses the lightest parallel row and never a loop
    lg = LinkGraph.from_edge_pairs(
        spark,
        [
            ("a", "b", 5.0),
            ("b", "a", 2.0),   # parallel, lighter
            ("b", "c", 1.0),
            ("c", "c", 0.1),   # self-loop
            ("a", "c", 9.0),
        ],
        directed=False,
    )
    names = lg.name_of()
    got = {
        frozenset((names[r["src"]], names[r["dst"]])): r["weight"]
        for r in minimum_spanning_edges(lg).collect()
    }
    assert got == {frozenset(("a", "b")): 2.0, frozenset(("b", "c")): 1.0}


def test_msf_directed_input_uses_undirected_view(spark):
    g = _distinct_weights(barabasi(), seed=31)
    dg = g.to_directed()
    lg = LinkGraph.from_networkx(spark, dg)
    names = lg.name_of()
    rows = minimum_spanning_edges(lg).collect()
    got = {frozenset((names[r["src"]], names[r["dst"]])): r["weight"] for r in rows}
    assert got == _nx_forest(g)


def test_msf_round_count_logarithmic(spark):
    g = _distinct_weights(nx.path_graph(33), seed=17)
    stats: dict = {}
    lg = LinkGraph.from_networkx(spark, g)
    rows = minimum_spanning_edges(lg, stats=stats).collect()
    assert len(rows) == 32  # a tree: every edge kept
    assert stats["rounds"] <= 6  # components at least halve per round
