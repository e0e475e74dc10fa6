"""Jones–Plassmann coloring: properness (the nx.greedy_color
contract), palette bound Δ+1, determinism, isolates."""

import networkx as nx

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.coloring import greedy_color


def spark_color(spark, g, stats=None):
    lg = LinkGraph.from_networkx(spark, g)
    name_of = lg.name_of()
    rows = greedy_color(lg, stats=stats).collect()
    return {name_of[r["vid"]]: r["color"] for r in rows}


def assert_proper(g, col):
    und = g.to_undirected() if g.is_directed() else g
    assert set(col) == set(und.nodes)
    for u, v in und.edges:
        if u != v:
            assert col[u] != col[v], f"edge {u}-{v} monochromatic"


def test_bridge_proper(spark):
    g = two_triangles_bridge()
    col = spark_color(spark, g)
    assert_proper(g, col)
    assert max(col.values()) + 1 <= max(d for _, d in g.degree) + 1


def test_barabasi_proper_bounded_deterministic(spark):
    g = nx.relabel_nodes(barabasi(), lambda i: f"{i:04d}", copy=True)
    c1 = spark_color(spark, g)
    c2 = spark_color(spark, g)
    assert_proper(g, c1)
    assert c1 == c2
    # greedy bound: palette never exceeds Δ+1 (usually far below)
    assert max(c1.values()) + 1 <= max(d for _, d in g.degree) + 1
    # sanity vs nx's own greedy palette: same order of magnitude
    nx_colors = max(nx.greedy_color(g).values()) + 1
    assert max(c1.values()) + 1 <= 3 * nx_colors


def test_digraph_underlying_undirected(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    col = spark_color(spark, g)
    assert_proper(g, col)


def test_isolates_and_empty(spark):
    g = nx.Graph()
    g.add_edge("A", "B")
    g.add_node("Z")
    col = spark_color(spark, g)
    assert_proper(g, col)
    assert col["Z"] == 0
    assert spark_color(spark, nx.Graph()) == {}


def test_rounds_recorded(spark):
    g = nx.relabel_nodes(nx.path_graph(64), lambda i: f"{i:03d}")
    stats = {}
    col = spark_color(spark, g, stats=stats)
    assert_proper(g, col)
    assert 1 <= stats["rounds"] <= 20
    # a path is 2-colorable; greedy with any order needs <= 3
    assert max(col.values()) + 1 <= 3
