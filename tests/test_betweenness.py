"""Betweenness centrality (batched Brandes) vs NetworkX.

Exact mode vs nx.betweenness_centrality; pivot-sampled mode vs
nx.betweenness_centrality_subset scaled by NetworkX's n/k sampling
factor (deterministic pivots replace nx's random seed)."""

import math

import networkx as nx
import pytest

from fixtures_graphs import airport_cycle, chain_digraph, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.betweenness import betweenness_centrality


def run_spark(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = betweenness_centrality(lg, **kw).collect()
    return {names[r["vid"]]: r["betweenness"] for r in rows}


def assert_close(got, want, tol=1e-9):
    want = {str(k): v for k, v in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=tol), (
            k, got[k], want[k],
        )


def test_betweenness_exact_undirected_normalized(spark):
    g = two_triangles_bridge()
    assert_close(run_spark(spark, g), nx.betweenness_centrality(g))


def test_betweenness_exact_undirected_unnormalized(spark):
    g = airport_cycle()
    assert_close(
        run_spark(spark, g, normalized=False),
        nx.betweenness_centrality(g, normalized=False),
    )


def test_betweenness_exact_digraph(spark):
    g = gnp_digraph()
    stats: dict = {}
    got = run_spark(spark, g, stats=stats)
    assert stats["pivots"] == g.number_of_nodes()
    assert_close(got, nx.betweenness_centrality(g))


def test_betweenness_sampled_pivots(spark):
    """Deterministic pivot set == nx subset raw sums x the sampling
    rescale (n/k folded into the scale exactly as nx does for k=)."""
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = lg.vid_of()
    srcs = [0, 7, 23, 60, 111]
    rows = betweenness_centrality(
        lg, sources=[vid_of[str(s)] for s in srcs], normalized=True
    ).collect()
    got = {names[r["vid"]]: r["betweenness"] for r in rows}
    n = g.number_of_nodes()
    raw = nx.betweenness_centrality_subset(
        g, sources=srcs, targets=list(g), normalized=False
    )
    factor = 1.0 / ((n - 1) * (n - 2)) * (n / len(srcs))
    want = {k: v * factor for k, v in raw.items()}
    assert_close(got, want)


def test_betweenness_sampled_directed_unnormalized_raw(spark):
    """Directed unnormalized: scale is None, so the n/k factor does NOT
    apply (nx _rescale parity) — raw dependency sums."""
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    vid_of = lg.vid_of()
    srcs = [3, 42]
    rows = betweenness_centrality(
        lg, sources=[vid_of[str(s)] for s in srcs], normalized=False
    ).collect()
    got = {names[r["vid"]]: r["betweenness"] for r in rows}
    want = nx.betweenness_centrality_subset(
        g, sources=srcs, targets=list(g), normalized=False
    )
    assert_close(got, want)


def test_betweenness_warns_unsupported(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.warns(UserWarning, match="weight"):
        betweenness_centrality(lg, weight="weight")
    with pytest.warns(UserWarning, match="endpoints"):
        betweenness_centrality(lg, endpoints=True)


def spark_edge_bc(spark, g, **kw):
    from nx_neptune_spark.operators.betweenness import edge_betweenness_centrality

    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    rows = edge_betweenness_centrality(lg, **kw).collect()
    if g.is_directed():
        return {(name_of[r["src"]], name_of[r["dst"]]): r["betweenness"] for r in rows}
    return {
        frozenset((name_of[r["src"]], name_of[r["dst"]])): r["betweenness"]
        for r in rows
    }


def nx_edge_bc(g, **kw):
    got = nx.edge_betweenness_centrality(g, **kw)
    if g.is_directed():
        return {(u, v): b for (u, v), b in got.items()}
    return {frozenset((u, v)): b for (u, v), b in got.items()}


def assert_close_dicts(got, want):
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-9), (
            k, got[k], want[k],
        )


def test_edge_bc_undirected_normalized(spark):
    g = two_triangles_bridge()
    assert_close_dicts(spark_edge_bc(spark, g), nx_edge_bc(g))


def test_edge_bc_undirected_unnormalized(spark):
    g = two_triangles_bridge()
    assert_close_dicts(
        spark_edge_bc(spark, g, normalized=False), nx_edge_bc(g, normalized=False)
    )


def test_edge_bc_directed_both_norms(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    assert_close_dicts(spark_edge_bc(spark, g), nx_edge_bc(g))
    assert_close_dicts(
        spark_edge_bc(spark, g, normalized=False), nx_edge_bc(g, normalized=False)
    )


def test_edge_bc_chain_fixture(spark):
    g = chain_digraph()
    assert_close_dicts(spark_edge_bc(spark, g), nx_edge_bc(g))


def test_edge_bc_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    got = nx.edge_betweenness_centrality(g, backend="spark")
    want = nx.edge_betweenness_centrality(g)
    assert set(got) == set(want)
    for e in want:
        assert math.isclose(got[e], want[e], abs_tol=1e-9)
    d = chain_digraph()
    got = nx.edge_betweenness_centrality(d, normalized=False, backend="spark")
    want = nx.edge_betweenness_centrality(d, normalized=False)
    assert set(got) == set(want)
    for e in want:
        assert math.isclose(got[e], want[e], abs_tol=1e-9)
