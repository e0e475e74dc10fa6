"""Semi-supervised node classification vs a numpy reference.

networkx's native node_classification needs scipy (absent here):
reimplement the published iteration (Zhu ICML'03 / Zhou NIPS'04 — the
exact procedure of networkx/algorithms/node_classification.py) with
dense numpy as the differential oracle.
"""

import networkx as nx
import numpy as np
import pytest

from fixtures_graphs import two_triangles_bridge
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph


def np_node_classification(g, seeds, max_iter=30, method="harmonic", alpha=0.99):
    nodes = list(g)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    X = np.zeros((n, n))
    for u, v, d in g.edges(data=True):
        w = d.get("weight", 1)
        X[idx[u], idx[v]] += w
        X[idx[v], idx[u]] += w
    classes = sorted({str(v) for v in seeds.values()})
    cidx = {c: i for i, c in enumerate(classes)}
    deg = X.sum(axis=0)
    deg[deg == 0] = 1
    B = np.zeros((n, len(classes)))
    for node, lab in seeds.items():
        B[idx[node], cidx[str(lab)]] = 1
    if method == "harmonic":
        P = X / deg[:, None]
        for node in seeds:
            P[idx[node], :] = 0
    else:
        d2 = 1.0 / np.sqrt(deg)
        P = alpha * (d2[:, None] * X * d2[None, :])
        B *= 1 - alpha
    F = np.zeros((n, len(classes)))
    for _ in range(max_iter):
        F = P @ F + B
    out = [classes[int(np.argmax(F[i]))] for i in range(n)]
    return {str(nodes[i]): out[i] for i in range(n)}


def labeled_bridge():
    g = two_triangles_bridge()
    seeds = {"A": "left", "F": "right"}
    return g, seeds


@pytest.mark.parametrize("max_iter", [1, 3, 30])
def test_harmonic_function(spark, max_iter):
    g, seeds = labeled_bridge()
    got = api.harmonic_function(
        LinkGraph.from_networkx(spark, g), seeds, max_iter=max_iter
    )
    want = np_node_classification(g, seeds, max_iter=max_iter)
    assert got == want


def test_harmonic_spreads_both_sides(spark):
    g, seeds = labeled_bridge()
    got = api.harmonic_function(LinkGraph.from_networkx(spark, g), seeds)
    assert got["B"] == got["C"] == "left"
    assert got["D"] == got["E"] == "right"


@pytest.mark.parametrize("alpha", [0.99, 0.5])
def test_lgc(spark, alpha):
    g, seeds = labeled_bridge()
    got = api.local_and_global_consistency(
        LinkGraph.from_networkx(spark, g), seeds, alpha=alpha
    )
    want = np_node_classification(g, seeds, method="lgc", alpha=alpha)
    assert got == want


def test_three_classes_and_unreachable(spark):
    g = nx.path_graph(9)
    g.add_node(99)  # isolated: no mass -> first sorted class
    seeds = {0: "a", 4: "b", 8: "c"}
    got = api.harmonic_function(LinkGraph.from_networkx(spark, g), seeds)
    want = np_node_classification(g, seeds)
    assert got == want
    assert got["99"] == "a"


def test_weighted(spark):
    g = two_triangles_bridge(weighted=True)
    seeds = {"A": "left", "F": "right"}
    got = api.harmonic_function(
        LinkGraph.from_networkx(spark, g), seeds, weight="weight"
    )
    # numpy reference reads weights whenever present
    want = np_node_classification(g, seeds)
    assert got == want


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g, seeds = labeled_bridge()
    for n, v in seeds.items():
        g.nodes[n]["label"] = v
    got = nx.node_classification.harmonic_function(g, backend="spark")
    want_map = np_node_classification(g, seeds)
    assert got == [want_map[str(n)] for n in g]
    got2 = nx.node_classification.local_and_global_consistency(
        g, backend="spark"
    )
    want2 = np_node_classification(g, seeds, method="lgc")
    assert got2 == [want2[str(n)] for n in g]
    h = nx.path_graph(3)
    with pytest.raises(nx.NetworkXError):
        nx.node_classification.harmonic_function(h, backend="spark")
