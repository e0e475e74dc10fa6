"""Laplacian centrality and tree recognition vs nx."""

import math

import networkx as nx
import pytest

from fixtures_graphs import two_triangles_bridge
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


# ------------------------------------------------------------ laplacian
#
# networkx's native laplacian_centrality needs scipy (absent in this
# sandbox): reimplement the published dense-Laplacian energy-drop
# definition (Qi et al. 2012, the exact procedure of
# networkx/algorithms/centrality/laplacian.py) with numpy as oracle.


def np_laplacian_centrality(g, normalized=True, weight="weight"):
    import numpy as np

    nodes = list(g)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v, d in g.edges(data=True):
        w = d.get(weight, 1) if weight else 1
        L[idx[u], idx[v]] -= w
        L[idx[v], idx[u]] -= w
        L[idx[u], idx[u]] += w
        L[idx[v], idx[v]] += w
    full = float(np.sum(L**2))
    out = {}
    for node in nodes:
        i = idx[node]
        keep = [j for j in range(n) if j != i]
        A2 = L[np.ix_(keep, keep)].copy()
        new_diag = L.diagonal() - np.abs(L[:, i])
        np.fill_diagonal(A2, new_diag[keep])
        new_energy = float(np.sum(A2**2)) if keep else 0.0
        c = full - new_energy
        out[node] = c / full if normalized else c
    return out


@pytest.mark.parametrize("normalized", [True, False])
def test_laplacian_unweighted(spark, normalized):
    g = two_triangles_bridge()
    got = api.laplacian_centrality(lg(spark, g), normalized=normalized)
    want = np_laplacian_centrality(g, normalized=normalized)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_laplacian_weighted(spark):
    g = two_triangles_bridge(weighted=True)
    got = api.laplacian_centrality(lg(spark, g))
    want = np_laplacian_centrality(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_laplacian_nx_docstring_example(spark):
    g = nx.Graph([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (3, 4)])
    got = api.laplacian_centrality(lg(spark, g))
    want = np_laplacian_centrality(g)
    # hand check: node 0 deg 3, nbr degs (3,2,3) -> cent 28; full
    # energy 32 + 2*6 = 44 -> 28/44
    assert math.isclose(want[0], 28 / 44)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_laplacian_isolate_and_edgeless(spark):
    g = nx.Graph([(0, 1)])
    g.add_node(5)
    got = api.laplacian_centrality(lg(spark, g))
    want = np_laplacian_centrality(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k
    h = nx.Graph()
    h.add_nodes_from([1, 2])
    with pytest.raises(ZeroDivisionError):
        api.laplacian_centrality(lg(spark, h))
    assert api.laplacian_centrality(lg(spark, h), normalized=False) == {
        "1": 0.0,
        "2": 0.0,
    }


def test_laplacian_directed_raises(spark):
    with pytest.raises(NotImplementedError):
        api.laplacian_centrality(lg(spark, nx.DiGraph([(0, 1)])))


# ------------------------------------------------------------ recognition


def test_tree_forest(spark):
    cases = [
        (nx.path_graph(5), True, True),
        (nx.cycle_graph(4), False, False),
        (nx.disjoint_union(nx.path_graph(3), nx.path_graph(2)), False, True),
        (nx.star_graph(7), True, True),
        (two_triangles_bridge(), False, False),
    ]
    for g, tree, forest in cases:
        assert api.is_tree(lg(spark, g)) == nx.is_tree(g) == tree
        assert api.is_forest(lg(spark, g)) == nx.is_forest(g) == forest


def test_branching_arborescence(spark):
    arb = nx.DiGraph([(0, 1), (0, 2), (1, 3)])
    assert api.is_arborescence(lg(spark, arb)) == nx.is_arborescence(arb) is True
    assert api.is_branching(lg(spark, arb)) == nx.is_branching(arb) is True
    two_roots = nx.DiGraph([(0, 1), (2, 3)])
    assert api.is_branching(lg(spark, two_roots)) == nx.is_branching(two_roots)
    assert (
        api.is_arborescence(lg(spark, two_roots))
        == nx.is_arborescence(two_roots)
        is False
    )
    diamond = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3)])  # in-deg 2
    assert api.is_branching(lg(spark, diamond)) == nx.is_branching(diamond) is False
    anti = nx.DiGraph([(0, 1), (1, 0)])  # 2 directed edges, 2 nodes
    assert api.is_forest(lg(spark, anti)) == nx.is_forest(anti) is False


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.path_graph(6)
    assert nx.is_tree(g, backend="spark") is True
    assert nx.is_forest(g, backend="spark") is True
    got = nx.laplacian_centrality(g, backend="spark")
    want = np_laplacian_centrality(g)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9)
    arb = nx.DiGraph([(0, 1), (0, 2)])
    assert nx.is_arborescence(arb, backend="spark") is True
