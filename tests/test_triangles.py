"""Triangle counting vs nx.triangles (exact, north rule)."""

import networkx as nx

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.triangles import total_triangles, triangle_count


def per_vertex(spark, g):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {names[r["vid"]]: r["triangles"] for r in triangle_count(lg).collect()}


def test_two_triangles_fixture(spark):
    g = two_triangles_bridge()
    got = per_vertex(spark, g)
    want = {str(k): v for k, v in nx.triangles(g).items()}
    assert got == want
    assert total_triangles(LinkGraph.from_networkx(spark, g)) == 2


def test_barabasi(spark):
    g = barabasi()
    got = per_vertex(spark, g)
    want = {str(k): v for k, v in nx.triangles(g).items()}
    assert got == want


def test_digraph_counts_undirected_triangles(spark):
    g = gnp_digraph()
    und = g.to_undirected()
    got = per_vertex(spark, g)
    want = {str(k): v for k, v in nx.triangles(und).items()}
    assert got == want


def test_triangle_free(spark):
    g = nx.cycle_graph(10)  # even cycle, no triangles
    got = per_vertex(spark, g)
    assert set(got.values()) == {0}
