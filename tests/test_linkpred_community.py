"""Community-aware link prediction vs NetworkX (cn_soundarajan_hopcroft /
ra_index_soundarajan_hopcroft / within_inter_cluster /
common_neighbor_centrality), restricted to the wedge support —
non-adjacent pairs with >=1 common neighbor, exactly the pairs the
distributed operator generates (and, for CCPA, exactly the pairs where
d(u,v)=2 so the distance term is a constant)."""

import math
from itertools import combinations

import networkx as nx
import pytest

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.linkpred import link_prediction_community

DELTA = 0.001
ALPHA = 0.8


def communities_for(g):
    """Deterministic community per node: stable hash of the name mod 4."""
    return {n: sum(ord(c) for c in str(n)) % 4 for n in g.nodes}


def run_spark(spark, g, com, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    cdf = spark.createDataFrame(
        [(vid, int(com[_node_of(g, name)])) for vid, name in names.items()],
        "vid long, community long",
    )
    out = {}
    for r in link_prediction_community(lg, cdf, delta=DELTA, alpha=ALPHA, **kw).collect():
        u, v = sorted((names[r["u"]], names[r["v"]]))
        out[(u, v)] = r
    return out


def _node_of(g, name):
    """Map the LinkGraph's string name back to the nx node object."""
    for n in g.nodes:
        if str(n) == name:
            return n
    raise KeyError(name)


def nx_support(g):
    pairs = set()
    for u, v in combinations(g.nodes, 2):
        if g.has_edge(u, v):
            continue
        if len(list(nx.common_neighbors(g, u, v))) >= 1:
            pairs.add(tuple(sorted((str(u), str(v)))))
    return pairs


def check_scores(g, got):
    by_name = {str(n): n for n in g.nodes}
    ebunch = [(by_name[u], by_name[v]) for u, v in got]
    for u, v, s in nx.cn_soundarajan_hopcroft(g, ebunch):
        r = got[tuple(sorted((str(u), str(v))))]
        assert r["cn_sh"] == s, (u, v)
    for u, v, s in nx.ra_index_soundarajan_hopcroft(g, ebunch):
        r = got[tuple(sorted((str(u), str(v))))]
        assert math.isclose(r["ra_sh"], s, rel_tol=0, abs_tol=1e-12), (u, v)
    for u, v, s in nx.within_inter_cluster(g, ebunch, delta=DELTA):
        r = got[tuple(sorted((str(u), str(v))))]
        assert math.isclose(r["wic"], s, rel_tol=0, abs_tol=1e-12), (u, v)
    for u, v, s in nx.common_neighbor_centrality(g, ebunch, alpha=ALPHA):
        r = got[tuple(sorted((str(u), str(v))))]
        assert math.isclose(r["ccpa"], s, rel_tol=0, abs_tol=1e-12), (u, v)


def _with_communities(g):
    com = communities_for(g)
    nx.set_node_attributes(g, com, "community")
    return g, com


def test_community_linkpred_bridge(spark):
    g, com = _with_communities(two_triangles_bridge())
    got = run_spark(spark, g, com)
    assert set(got) == nx_support(g)
    check_scores(g, got)


def test_community_linkpred_barabasi(spark):
    g, com = _with_communities(barabasi())
    got = run_spark(spark, g, com)
    assert set(got) == nx_support(g)
    check_scores(g, got)


def test_community_linkpred_min_common(spark):
    g, com = _with_communities(barabasi())
    got = run_spark(spark, g, com, min_common=3)
    assert got, "min_common=3 support should be non-empty on barabasi"
    for r in got.values():
        assert r["common"] >= 3
    check_scores(g, got)


def test_wic_delta_parameter(spark):
    """delta flows through: WIC with delta=0.5 differs from 0.001 on a
    pair with zero inter-cluster common neighbors."""
    g = nx.Graph()
    g.add_edges_from([(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4)])
    com = {0: 0, 1: 1, 2: 0, 3: 0, 4: 0}
    nx.set_node_attributes(g, com, "community")
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    cdf = spark.createDataFrame(
        [(vid, com[int(name)]) for vid, name in names.items()],
        "vid long, community long",
    )
    got = {
        tuple(sorted((names[r["u"]], names[r["v"]]))): r
        for r in link_prediction_community(lg, cdf, delta=0.5).collect()
    }
    (u, v, expect) = next(iter(nx.within_inter_cluster(g, [(0, 4)], delta=0.5)))
    r = got[tuple(sorted((str(u), str(v))))]
    assert math.isclose(r["wic"], expect, rel_tol=0, abs_tol=1e-12)


def test_directed_projection(spark):
    """A digraph scores via its undirected simple projection (the
    base link_prediction contract extends to the community scores)."""
    dg = nx.DiGraph([(0, 1), (1, 0), (0, 2), (2, 3), (1, 3), (3, 0)])
    g = dg.to_undirected()
    com = {n: n % 2 for n in g.nodes}
    nx.set_node_attributes(g, com, "community")
    lg = LinkGraph.from_networkx(spark, dg)
    names = lg.name_of()
    cdf = spark.createDataFrame(
        [(vid, com[int(name)]) for vid, name in names.items()],
        "vid long, community long",
    )
    got = {
        tuple(sorted((names[r["u"]], names[r["v"]]))): r
        for r in link_prediction_community(lg, cdf).collect()
    }
    assert set(got) == nx_support(g)
    check_scores(g, got)
