"""Weighted closeness (distance=) vs nx.closeness_centrality."""

import math

import networkx as nx

from fixtures_graphs import social_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.closeness import weighted_closeness_centrality


def _weight(g, fn):
    for i, (u, v) in enumerate(g.edges):
        g[u][v]["weight"] = float(fn(i))
    return g


def _spark_wc(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = weighted_closeness_centrality(lg, **kw).collect()
    return {names[r["vid"]]: r["closeness"] for r in rows}


def _check(spark, g, **kw):
    want = nx.closeness_centrality(
        nx.relabel_nodes(g, str), distance="weight",
        wf_improved=kw.get("wf_improved", True),
    )
    got = _spark_wc(spark, g, **kw)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), (
            k, got[k], want[k],
        )


def test_weighted_closeness_undirected(spark):
    _check(spark, _weight(two_triangles_bridge(), lambda i: (i % 3) + 1))


def test_weighted_closeness_digraph_incoming(spark):
    _check(spark, _weight(social_digraph(), lambda i: i + 1))


def test_weighted_closeness_unimproved(spark):
    g = _weight(nx.disjoint_union(nx.cycle_graph(4), nx.path_graph(3)),
                lambda i: (i % 2) + 1)
    _check(spark, g, wf_improved=False)


def test_weighted_closeness_missing_weight_is_hops(spark):
    g = two_triangles_bridge()  # no weight attr -> hop counts
    want = nx.closeness_centrality(nx.relabel_nodes(g, str))
    got = _spark_wc(spark, g)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_weighted_closeness_sources_subset(spark):
    g = _weight(two_triangles_bridge(), lambda i: i + 1)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = {v: k for k, v in names.items()}
    rows = weighted_closeness_centrality(lg, sources=[vid_of["A"]]).collect()
    assert len(rows) == 1
    want = nx.closeness_centrality(
        nx.relabel_nodes(g, str), u="A", distance="weight"
    )
    assert math.isclose(rows[0]["closeness"], want, rel_tol=1e-9)
