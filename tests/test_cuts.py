"""Cuts/boundaries/expansion vs nx."""

import math

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


SCALARS = [
    ("cut_size", True),
    ("volume", False),
    ("conductance", True),
    ("normalized_cut_size", True),
    ("edge_expansion", True),
    ("mixing_expansion", True),
    ("node_expansion", False),
    ("boundary_expansion", False),
]


def check_all(spark, g, S, T=None):
    from nx_neptune_spark import api

    graph = lg(spark, g)
    s_names = [str(v) for v in S]
    t_names = None if T is None else [str(v) for v in T]
    for name, takes_t in SCALARS:
        nx_fn = getattr(nx, name)
        api_fn = getattr(api, name)
        if takes_t:
            want = nx_fn(g, S, T)
            got = api_fn(graph, s_names, t_names)
        else:
            want = nx_fn(g, S)
            got = api_fn(graph, s_names)
        assert math.isclose(got, want, abs_tol=1e-9), (name, got, want)


def test_undirected_bridge(spark):
    g = two_triangles_bridge()
    check_all(spark, g, {"A", "B", "C"})


def test_undirected_explicit_T(spark):
    g = nx.barbell_graph(4, 2)
    check_all(spark, g, set(range(4)), set(range(6, 10)))


def test_directed(spark):
    from nx_neptune_spark import api

    g = gnp_digraph()
    S = {v for v in g if v % 5 == 0}
    T = set(g) - S
    # native nx crashes on T=None for digraph cut-family calls (its
    # chain() path iterates None); give nx the explicit complement and
    # check OUR T=None default against it
    check_all(spark, g, S, T)
    graph = lg(spark, g)
    s_names = [str(v) for v in S]
    assert math.isclose(
        api.cut_size(graph, s_names), nx.cut_size(g, S, T), abs_tol=1e-9
    )
    assert math.isclose(
        api.conductance(graph, s_names), nx.conductance(g, S, T), abs_tol=1e-9
    )


def test_weighted_cut(spark):
    from nx_neptune_spark import api

    g = two_triangles_bridge(weighted=True)
    graph = lg(spark, g)
    S = {"A", "B", "C"}
    got = api.cut_size(graph, S, weight="weight")
    assert math.isclose(got, nx.cut_size(g, S, weight="weight"), abs_tol=1e-9)
    assert math.isclose(
        api.volume(graph, S, weight="weight"),
        nx.volume(g, S, weight="weight"),
        abs_tol=1e-9,
    )


def test_boundaries(spark):
    from nx_neptune_spark import api

    g = two_triangles_bridge()
    graph = lg(spark, g)
    S = ["A", "B", "C"]
    assert api.node_boundary(graph, S) == {
        str(v) for v in nx.node_boundary(g, set(S))
    }
    got = {frozenset(e) for e in api.edge_boundary(graph, S)}
    want = {frozenset((str(u), str(v))) for u, v in nx.edge_boundary(g, set(S))}
    assert got == want
    h = gnp_digraph()
    hg = lg(spark, h)
    S2 = [v for v in h if v % 7 == 0]
    got = set(api.edge_boundary(hg, [str(v) for v in S2]))
    want = {(str(u), str(v)) for u, v in nx.edge_boundary(h, set(S2))}
    assert got == want  # directed: orientation preserved, S->T only


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    S = {"A", "B", "C"}
    assert math.isclose(
        nx.conductance(g, S, backend="spark"), nx.conductance(g, S)
    )
    assert math.isclose(nx.cut_size(g, S, backend="spark"), nx.cut_size(g, S))
    assert nx.node_boundary(g, S, backend="spark") == nx.node_boundary(g, S)
    got = {frozenset(e) for e in nx.edge_boundary(g, S, backend="spark")}
    want = {frozenset(e) for e in nx.edge_boundary(g, S)}
    assert got == want
