"""Trophic levels/differences/incoherence vs a numpy reference.

networkx's native trophic_levels needs scipy (adjacency_matrix);
reimplement the published dense solve (I − P)⁻¹·1 + 1 (Levine 1980,
the exact procedure of networkx/algorithms/centrality/trophic.py)
with numpy as the differential oracle.
"""

import math

import networkx as nx
import numpy as np
import pytest

from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph


def np_trophic_levels(g, weight="weight"):
    nodes = list(g)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    a = np.zeros((n, n))
    for u, v, d in g.edges(data=True):
        w = d.get(weight, 1) if weight else 1
        a[idx[v], idx[u]] += w  # transposed adjacency, like nx
    rowsum = a.sum(axis=1)
    nz = rowsum != 0
    p = a[nz][:, nz] / rowsum[nz][:, None]
    y = np.linalg.inv(np.eye(p.shape[0]) - p).sum(axis=1) + 1
    levels = {}
    j = 0
    for i, node in enumerate(nodes):
        if nz[i]:
            levels[node] = float(y[j])
            j += 1
        else:
            levels[node] = 1.0
    return levels


def dag_fixture():
    g = nx.DiGraph()
    g.add_edges_from((i, i + 7) for i in range(40))
    g.add_edges_from((i, i + 10) for i in range(0, 37, 2))
    return g


def test_levels_dag(spark):
    g = dag_fixture()
    got = api.trophic_levels(LinkGraph.from_networkx(spark, g))
    want = np_trophic_levels(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_levels_cyclic_reachable(spark):
    # a cycle fed by a basal node: spectral radius < 1, Jacobi converges
    g = nx.DiGraph([(0, 1), (1, 2), (2, 3), (3, 1)])
    got = api.trophic_levels(LinkGraph.from_networkx(spark, g))
    want = np_trophic_levels(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-8), k


def test_weighted(spark):
    g = nx.DiGraph()
    g.add_weighted_edges_from(
        [(0, 2, 2.0), (1, 2, 1.0), (2, 3, 0.5), (1, 3, 3.0)]
    )
    got = api.trophic_levels(LinkGraph.from_networkx(spark, g))
    want = np_trophic_levels(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_differences_and_incoherence(spark):
    g = dag_fixture()
    graph = LinkGraph.from_networkx(spark, g)
    want_levels = np_trophic_levels(g)
    got_d = api.trophic_differences(graph)
    for (u, v), d in got_d.items():
        assert math.isclose(
            d, want_levels[int(v)] - want_levels[int(u)], abs_tol=1e-9
        )
    got_q = api.trophic_incoherence_parameter(graph)
    diffs = [want_levels[v] - want_levels[u] for u, v in g.edges]
    assert math.isclose(got_q, float(np.std(diffs)), abs_tol=1e-9)


def test_error_cases(spark):
    ring = nx.DiGraph([(0, 1), (1, 2), (2, 0)])  # no basal nodes
    with pytest.raises(ValueError):
        api.trophic_levels(LinkGraph.from_networkx(spark, ring))
    # basal exists but the cycle is unreachable from it
    g = nx.DiGraph([(5, 6), (0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError):
        api.trophic_levels(LinkGraph.from_networkx(spark, g))


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = dag_fixture()
    got = nx.trophic_levels(g, backend="spark")
    want = np_trophic_levels(g)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9)
    q = nx.trophic_incoherence_parameter(g, backend="spark")
    diffs = [want[v] - want[u] for u, v in g.edges]
    assert math.isclose(q, float(np.std(diffs)), abs_tol=1e-9)
    ring = nx.DiGraph([(0, 1), (1, 0)])
    with pytest.raises(nx.NetworkXError):
        nx.trophic_levels(ring, backend="spark")
