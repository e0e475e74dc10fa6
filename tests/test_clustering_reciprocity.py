"""clustering / transitivity / reciprocity / harmonic vs NetworkX."""

import math

import networkx as nx
import pytest

from fixtures_graphs import (
    barabasi,
    gnp_digraph,
    single_node,
    social_digraph,
    two_triangles_bridge,
)
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.clustering import (
    average_clustering,
    clustering,
    transitivity,
)
from nx_neptune_spark.operators.harmonic import harmonic_centrality
from nx_neptune_spark.operators.reciprocity import (
    overall_reciprocity,
    reciprocity,
)


def by_name(lg, df, col):
    names = lg.name_of()
    return {names[r["vid"]]: r[col] for r in df.collect()}


# ---------------------------------------------------------------- clustering


@pytest.mark.parametrize("gf", [two_triangles_bridge, barabasi])
def test_clustering_matches_nx(spark, gf):
    g = gf()
    lg = LinkGraph.from_networkx(spark, g)
    got = by_name(lg, clustering(lg), "clustering")
    want = nx.clustering(g)
    assert set(got) == {str(n) for n in want}
    for n, c in want.items():
        assert math.isclose(got[str(n)], c, rel_tol=0, abs_tol=1e-12), n


def test_clustering_isolated_and_degree_one(spark):
    g = two_triangles_bridge()
    g.add_node("iso")
    g.add_edge("leaf_a", "leaf_b")
    lg = LinkGraph.from_networkx(spark, g)
    got = by_name(lg, clustering(lg), "clustering")
    want = nx.clustering(g)
    for n, c in want.items():
        assert math.isclose(got[str(n)], c, rel_tol=0, abs_tol=1e-12), n


@pytest.mark.parametrize("gf", [two_triangles_bridge, barabasi])
def test_transitivity_matches_nx(spark, gf):
    g = gf()
    lg = LinkGraph.from_networkx(spark, g)
    assert math.isclose(
        transitivity(lg), nx.transitivity(g), rel_tol=0, abs_tol=1e-12
    )


def test_transitivity_wedge_free(spark):
    g = single_node()
    lg = LinkGraph.from_networkx(spark, g)
    assert transitivity(lg) == 0.0


@pytest.mark.parametrize("count_zeros", [True, False])
def test_average_clustering_matches_nx(spark, count_zeros):
    g = barabasi()
    lg = LinkGraph.from_networkx(spark, g)
    got = average_clustering(lg, count_zeros=count_zeros)
    want = nx.average_clustering(g, count_zeros=count_zeros)
    assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


# ---------------------------------------------------------------- reciprocity


@pytest.mark.parametrize("gf", [social_digraph, gnp_digraph])
def test_overall_reciprocity_matches_nx(spark, gf):
    g = gf()
    lg = LinkGraph.from_networkx(spark, g)
    assert math.isclose(
        overall_reciprocity(lg),
        nx.overall_reciprocity(g),
        rel_tol=0,
        abs_tol=1e-12,
    )


@pytest.mark.parametrize("gf", [social_digraph, gnp_digraph])
def test_reciprocity_per_node_matches_nx(spark, gf):
    g = gf()
    lg = LinkGraph.from_networkx(spark, g)
    got = by_name(lg, reciprocity(lg), "reciprocity")
    want = nx.reciprocity(g, nodes=list(g.nodes))
    for n, r in want.items():
        assert math.isclose(got[str(n)], r, rel_tol=0, abs_tol=1e-12), n


def test_reciprocity_self_loop_and_isolated(spark):
    g = nx.DiGraph()
    g.add_edges_from([("a", "b"), ("b", "a"), ("a", "c"), ("d", "d")])
    g.add_node("iso")
    lg = LinkGraph.from_networkx(spark, g)
    assert math.isclose(
        overall_reciprocity(lg), nx.overall_reciprocity(g), abs_tol=1e-12
    )
    got = by_name(lg, reciprocity(lg), "reciprocity")
    want = nx.reciprocity(g, nodes=["a", "b", "c", "d"])
    for n, r in want.items():
        assert math.isclose(got[str(n)], r, rel_tol=0, abs_tol=1e-12), n
    assert got["iso"] is None  # adapter raises NetworkXError, nx parity


# ---------------------------------------------------------------- harmonic


@pytest.mark.parametrize("gf", [two_triangles_bridge, social_digraph])
def test_harmonic_matches_nx(spark, gf):
    g = gf()
    lg = LinkGraph.from_networkx(spark, g)
    got = by_name(lg, harmonic_centrality(lg), "harmonic")
    want = nx.harmonic_centrality(g)
    for n, h in want.items():
        assert math.isclose(got[str(n)], h, rel_tol=0, abs_tol=1e-9), n


def test_harmonic_disconnected(spark):
    g = two_triangles_bridge()
    g.add_edge("x1", "x2")  # separate component
    g.add_node("iso")
    lg = LinkGraph.from_networkx(spark, g)
    got = by_name(lg, harmonic_centrality(lg), "harmonic")
    want = nx.harmonic_centrality(g)
    for n, h in want.items():
        assert math.isclose(got[str(n)], h, rel_tol=0, abs_tol=1e-9), n


def test_harmonic_nbunch_sources(spark):
    g = social_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid_of = lg.vid_of()
    nodes = sorted(g.nodes, key=str)
    nb, src = nodes[:3], nodes[2:]
    got = by_name(
        lg,
        harmonic_centrality(
            lg,
            nbunch=[vid_of[str(n)] for n in nb],
            sources=[vid_of[str(n)] for n in src],
        ),
        "harmonic",
    )
    want = nx.harmonic_centrality(g, nbunch=nb, sources=src)
    assert set(got) == {str(n) for n in want}
    for n, h in want.items():
        assert math.isclose(got[str(n)], h, rel_tol=0, abs_tol=1e-9), n


# ---------------------------------------------------------------- dispatch


def test_round5_backend_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = barabasi()
    dg = social_digraph()

    got = nx.clustering(g, backend="spark")
    want = nx.clustering(g)
    for n in want:
        assert math.isclose(got[n], want[n], abs_tol=1e-12)
    assert math.isclose(
        nx.transitivity(g, backend="spark"), nx.transitivity(g), abs_tol=1e-12
    )
    assert math.isclose(
        nx.average_clustering(g, backend="spark"),
        nx.average_clustering(g),
        abs_tol=1e-12,
    )
    assert math.isclose(
        nx.overall_reciprocity(dg, backend="spark"),
        nx.overall_reciprocity(dg),
        abs_tol=1e-12,
    )
    gotr = nx.reciprocity(dg, nodes=list(dg.nodes), backend="spark")
    wantr = nx.reciprocity(dg, nodes=list(dg.nodes))
    for n in wantr:
        assert math.isclose(gotr[n], wantr[n], abs_tol=1e-12)
    goth = nx.harmonic_centrality(dg, backend="spark")
    wanth = nx.harmonic_centrality(dg)
    for n in wanth:
        assert math.isclose(goth[n], wanth[n], abs_tol=1e-9)


def test_directed_clustering_nx_parity(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    got = nx.clustering(g, backend="spark")
    want = nx.clustering(g)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-12), (
            k, got[k], want[k],
        )
    assert math.isclose(
        nx.average_clustering(g, backend="spark"),
        nx.average_clustering(g),
        abs_tol=1e-12,
    )
    # bidirectional-edge case: reciprocated triangle
    d = nx.DiGraph([("A", "B"), ("B", "A"), ("B", "C"), ("C", "A"), ("A", "C")])
    got = nx.clustering(d, backend="spark")
    want = nx.clustering(d)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), (k, got[k], want[k])
