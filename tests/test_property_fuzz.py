"""Property-based NetworkX-differential fuzzing (hypothesis).

Random small graphs (including self-loops, parallel mentions, isolated
vertices, butterflies and chains) must agree with NetworkX on the exact
operators. These complement the fixed fixtures in the other test
modules by searching the structure space for convergence/orientation
edge cases -- e.g. the star-forest convergence test in
operators/components.py must never declare a butterfly (two parents,
one shared child) converged.
"""

import math

import networkx as nx
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.components import connected_components
from nx_neptune_spark.operators.degree import degree_centrality
from nx_neptune_spark.operators.pagerank import pagerank
from nx_neptune_spark.operators.triangles import triangle_count
from oracles import nx_pagerank_fixed

N_NODES = 14

edge_lists = st.lists(
    st.tuples(st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1)),
    min_size=0,
    max_size=40,
)

FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _undirected(pairs):
    g = nx.Graph()
    g.add_nodes_from(range(N_NODES))
    g.add_edges_from((u, v) for u, v in pairs if u != v)
    return g


def _directed(pairs):
    g = nx.DiGraph()
    g.add_nodes_from(range(N_NODES))
    g.add_edges_from((u, v) for u, v in pairs if u != v)
    return g


@given(pairs=edge_lists)
@example(pairs=[(0, 5), (1, 5)])  # butterfly: two parents, shared child
@example(pairs=[(0, 1), (1, 2), (2, 3), (3, 4)])  # chain
@example(pairs=[(0, 1), (1, 0)])  # reciprocal pair
@FUZZ
def test_fuzz_connected_components(spark, pairs):
    g = _undirected(pairs)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    by_comp = {}
    for r in connected_components(lg).collect():
        by_comp.setdefault(r["component"], set()).add(names[r["vid"]])
    got = set(frozenset(s) for s in by_comp.values())
    want = set(
        frozenset(str(n) for n in c) for c in nx.connected_components(g)
    )
    assert got == want


@given(pairs=edge_lists)
@example(pairs=[(0, 1), (1, 2), (2, 0)])  # single triangle
@example(pairs=[(0, 1), (1, 2), (2, 0), (0, 3), (3, 1)])  # shared edge
@FUZZ
def test_fuzz_triangles(spark, pairs):
    g = _undirected(pairs)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {
        names[r["vid"]]: r["triangles"] for r in triangle_count(lg).collect()
    }
    want = {str(n): t for n, t in nx.triangles(g).items()}
    assert got == want


@given(pairs=edge_lists)
@FUZZ
def test_fuzz_degree_centrality(spark, pairs):
    g = _undirected(pairs)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {
        names[r["vid"]]: r["centrality"]
        for r in degree_centrality(lg).collect()
    }
    want = nx.degree_centrality(g)
    assert got.keys() == {str(n) for n in want}
    for n, c in want.items():
        assert math.isclose(got[str(n)], c, abs_tol=1e-9)


@given(pairs=edge_lists)
@example(pairs=[])  # all-dangling graph
@example(pairs=[(0, 1), (2, 1)])  # most of the graph dangling
@FUZZ
def test_fuzz_pagerank_fixed_iters(spark, pairs):
    g = _directed(pairs)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {
        names[r["vid"]]: r["rank"]
        for r in pagerank(lg, fixed_iterations=6).collect()
    }
    want = nx_pagerank_fixed(g, iterations=6)
    assert got.keys() == {str(n) for n in want}
    for n, x in want.items():
        assert math.isclose(got[str(n)], x, abs_tol=1e-9), (n, got[str(n)], x)
