"""Bipartite one-mode projections vs the nx.bipartite family."""

import math

import networkx as nx
from networkx.algorithms import bipartite as nxb

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.bipartite import bipartite_projection


def _fixture():
    g = nx.Graph()
    left = [f"u{i}" for i in range(8)]
    right = [f"m{i}" for i in range(6)]
    g.add_nodes_from(left, bipartite=0)
    g.add_nodes_from(right, bipartite=1)
    for i in range(8):
        for k in (0, 1, 2):
            g.add_edge(f"u{i}", f"m{(i * 5 + k) % 6}")
    return g, left


def _spark_proj(spark, g, left):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = {v: k for k, v in names.items()}
    nodes = spark.createDataFrame([(vid_of[n],) for n in left], "vid long")
    rows = bipartite_projection(lg, nodes).collect()
    return {
        frozenset((names[r["u"]], names[r["v"]])): r for r in rows
    }


def test_projection_weights_match_nx(spark):
    g, left = _fixture()
    got = _spark_proj(spark, g, left)

    w = nxb.weighted_projected_graph(g, left)
    assert {frozenset(e) for e in w.edges} == set(got)
    for u, v, d in w.edges(data=True):
        assert got[frozenset((u, v))]["common"] == d["weight"]

    r = nxb.weighted_projected_graph(g, left, ratio=True)
    for u, v, d in r.edges(data=True):
        assert math.isclose(got[frozenset((u, v))]["ratio"], d["weight"])

    j = nxb.overlap_weighted_projected_graph(g, left)
    for u, v, d in j.edges(data=True):
        assert math.isclose(got[frozenset((u, v))]["jaccard"], d["weight"])

    o = nxb.overlap_weighted_projected_graph(g, left, jaccard=False)
    for u, v, d in o.edges(data=True):
        assert math.isclose(got[frozenset((u, v))]["overlap_min"], d["weight"])

    c = nxb.collaboration_weighted_projected_graph(g, left)
    for u, v, d in c.edges(data=True):
        assert math.isclose(got[frozenset((u, v))]["collab"], d["weight"])


def test_projection_unshared_side_has_no_rows(spark):
    g = nx.Graph([("a", "x"), ("b", "y")])  # no shared centers
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = {v: k for k, v in names.items()}
    nodes = lg.spark.createDataFrame(
        [(vid_of["a"],), (vid_of["b"],)], "vid long"
    )
    assert bipartite_projection(lg, nodes).count() == 0


def test_projection_hub_cap_drops_super_center(spark):
    g = nx.Graph()
    for i in range(6):
        g.add_edge(f"u{i}", "HUB")
    g.add_edge("u0", "m0")
    g.add_edge("u1", "m0")
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = {v: k for k, v in names.items()}
    nodes = lg.spark.createDataFrame(
        [(vid_of[f"u{i}"],) for i in range(6)], "vid long"
    )
    rows = bipartite_projection(lg, nodes, max_center_degree=4).collect()
    # only the m0 wedge survives; the HUB's 15 pairs are capped out
    assert {(names[r["u"]], names[r["v"]]) for r in rows} == {("u0", "u1")}
