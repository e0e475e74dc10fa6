"""Deterministic synchronous LPA: community structure on the
reference's fixtures (two 3-cliques + bridge, test_algo_lpa.py:26-40)."""

import networkx as nx

from fixtures_graphs import two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.label_propagation import communities, label_propagation


def comm_sets(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    labels = label_propagation(lg, **kw)
    rows = labels.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add(names[r["vid"]])
    return set(frozenset(s) for s in by_label.values())


def test_two_triangles_bridge(spark):
    got = comm_sets(spark, two_triangles_bridge())
    assert got == {frozenset({"A", "B", "C"}), frozenset({"D", "E", "F"})}


def test_weighted_bridge_still_splits(spark):
    got = comm_sets(spark, two_triangles_bridge(weighted=True), weight="weight")
    assert got == {frozenset({"A", "B", "C"}), frozenset({"D", "E", "F"})}


def test_disjoint_cliques(spark):
    g = nx.Graph()
    for b in range(0, 20, 5):
        for i in range(b, b + 5):
            for j in range(i + 1, b + 5):
                g.add_edge(i, j)
    got = comm_sets(spark, g)
    want = {frozenset(str(i) for i in range(b, b + 5)) for b in range(0, 20, 5)}
    assert got == want


def test_deterministic_across_runs(spark):
    g = two_triangles_bridge()
    assert comm_sets(spark, g) == comm_sets(spark, g)


def test_communities_shape(spark):
    lg = LinkGraph.from_networkx(spark, two_triangles_bridge())
    rows = communities(label_propagation(lg)).collect()
    # reference result shape: (community, sorted members)
    assert {tuple(r["members"]) for r in rows} == {(0, 1, 2), (3, 4, 5)}


def test_digraph_reciprocal_edges_not_double_counted(spark):
    """A digraph containing BOTH (a,b) and (b,a) must behave like
    G.to_undirected(): that neighbor's vote has weight 1, not 2.
    Fixture: vertex X between two 3-cliques; X->clique1 edges are
    reciprocal (stored both directions), X->clique2 edges one-way. With
    double-counting, clique1's pull on X would be doubled and the
    tie-break would flip; with to_undirected semantics the two sides
    stay symmetric and X joins the lower-labeled community."""
    g = nx.DiGraph()
    # clique 1: A B C, clique 2: D E F (stored one direction; LPA
    # symmetrizes internally)
    for u, v in [("A", "B"), ("B", "C"), ("A", "C")]:
        g.add_edge(u, v)
    for u, v in [("D", "E"), ("E", "F"), ("D", "F")]:
        g.add_edge(u, v)
    # X connects to B and E; X<->B stored BOTH directions (reciprocal)
    g.add_edge("X", "B")
    g.add_edge("B", "X")
    g.add_edge("X", "E")
    got = comm_sets(spark, g)
    und = comm_sets(spark, nx.Graph(g.to_undirected()))
    assert got == und


def test_single_node_and_empty(spark):
    g = nx.Graph()
    g.add_node("A")
    assert comm_sets(spark, g) == {frozenset({"A"})}
    lg = LinkGraph.from_edge_pairs(spark, [], nodes=[])
    assert label_propagation(lg).count() == 0
