"""Maximal matching + vertex cover: property parity with nx
(matching-ness and maximality on the same graph), determinism, cover
validity and the factor-2 bound versus nx's own maximal matching."""

import networkx as nx

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.matching import maximal_matching, vertex_cover


def spark_matching(spark, g, stats=None):
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    rows = maximal_matching(lg, stats=stats).collect()
    return {frozenset((name_of[r["u"]], name_of[r["v"]])) for r in rows}


def assert_maximal_matching(g, m):
    und = g.to_undirected() if g.is_directed() else g
    used = set()
    for e in m:
        u, v = tuple(e)
        assert und.has_edge(u, v)
        assert u not in used and v not in used, "not a matching"
        used |= {u, v}
    for u, v in und.edges:
        if u != v:
            assert u in used or v in used, f"not maximal: {u}-{v} addable"


def test_bridge(spark):
    g = two_triangles_bridge()
    m = spark_matching(spark, g)
    assert_maximal_matching(g, m)


def test_barabasi_properties_determinism_cover(spark):
    g = nx.relabel_nodes(barabasi(), lambda i: f"{i:04d}", copy=True)
    m1 = spark_matching(spark, g)
    m2 = spark_matching(spark, g)
    assert m1 == m2
    assert_maximal_matching(g, m1)
    # any maximal matching is >= half the maximum matching; compare
    # against nx's own maximal matching as a sanity band
    nx_m = nx.maximal_matching(g)
    assert len(m1) * 2 >= len(nx_m)
    assert len(nx_m) * 2 >= len(m1)
    # cover: every edge covered, size exactly 2|M|
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    cover = {name_of[r["vid"]] for r in vertex_cover(lg).collect()}
    assert len(cover) == 2 * len(m1)
    for u, v in g.edges:
        assert u in cover or v in cover


def test_digraph_undirected_pairs(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    m = spark_matching(spark, g)
    assert_maximal_matching(g, m)


def test_rounds_and_empty(spark):
    g = nx.relabel_nodes(nx.path_graph(33), lambda i: f"{i:02d}")
    stats = {}
    m = spark_matching(spark, g, stats=stats)
    assert_maximal_matching(g, m)
    assert 1 <= stats["rounds"] <= 16
    assert spark_matching(spark, nx.Graph()) == set()
