"""Degree / BFS / closeness parity tests vs NetworkX."""

import math

import networkx as nx

from fixtures_graphs import airport_cycle, chain_digraph, gnp_digraph, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.bfs import (
    bfs_layers,
    bfs_levels,
    bfs_parents,
    descendants_at_distance,
)
from nx_neptune_spark.operators.closeness import closeness_centrality
from nx_neptune_spark.operators.degree import degree, degree_centrality


def test_degree_centrality_chain(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {names[r["vid"]]: r["centrality"] for r in degree_centrality(lg).collect()}
    want = {str(k): v for k, v in nx.degree_centrality(g).items()}
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12)


def test_in_out_degree(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got_in = {names[r["vid"]]: r["degree"] for r in degree(lg, "in").collect()}
    got_out = {names[r["vid"]]: r["degree"] for r in degree(lg, "out").collect()}
    assert got_in == {str(k): v for k, v in g.in_degree()}
    assert got_out == {str(k): v for k, v in g.out_degree()}


def test_bfs_layers_social(spark):
    g = social_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid, names = lg.vid_of(), lg.name_of()
    layers = bfs_layers(lg, [vid["Alice"]]).collect()
    got = {r["level"]: {names[m] for m in r["members"]} for r in layers}
    want = {i: set(map(str, layer)) for i, layer in enumerate(nx.bfs_layers(g, "Alice"))}
    assert got == want


def test_bfs_parents_social(spark):
    g = social_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid, names = lg.vid_of(), lg.name_of()
    got = {
        (names[r["parent"]], names[r["child"]])
        for r in bfs_parents(lg, vid["Alice"]).collect()
    }
    assert got == {("Alice", "Bob"), ("Alice", "Carl")}


def test_bfs_levels_gnp(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid = lg.vid_of()
    names = lg.name_of()
    src = "0"
    got = {names[r["vid"]]: r["level"] for r in bfs_levels(lg, [vid[src]]).collect()}
    want = {str(k): v for k, v in nx.single_source_shortest_path_length(g, 0).items()}
    assert got == want


def test_descendants_at_distance(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    vid, names = lg.vid_of(), lg.name_of()
    got = {names[r["vid"]] for r in descendants_at_distance(lg, vid["YVR"], 2).collect()}
    want = {str(n) for n in nx.descendants_at_distance(g, "YVR", 2)}
    assert got == want


def test_closeness_airports_exact(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {names[r["vid"]]: r["closeness"] for r in closeness_centrality(lg).collect()}
    want = {str(k): v for k, v in nx.closeness_centrality(g).items()}
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-9), (k, got[k], want[k])


def test_closeness_digraph_incoming(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    got = {names[r["vid"]]: r["closeness"] for r in closeness_centrality(lg).collect()}
    want = {str(k): v for k, v in nx.closeness_centrality(g).items()}
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-9), (k, got[k], want[k])


def test_closeness_sampled_sources(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    # sampled mode: only 2 lowest-vid sources get nonzero scores
    rows = closeness_centrality(lg, num_sources=2).collect()
    nonzero = [r for r in rows if r["closeness"] > 0]
    assert len(nonzero) == 2


def test_closeness_exact_mode_warns_at_scale(spark, monkeypatch):
    """VERDICT r2 item 8: exact closeness is O(V*E); above the vertex
    threshold the engine must warn (sampled runs stay silent)."""
    import warnings

    import nx_neptune_spark.operators.closeness as cl
    from fixtures_graphs import chain_digraph
    from nx_neptune_spark.graph import LinkGraph

    lg = LinkGraph.from_networkx(spark, chain_digraph())
    monkeypatch.setattr(cl, "EXACT_MODE_WARN_VERTICES", 3)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cl.closeness_centrality(lg).collect()
    assert any("O(V*E)" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cl.closeness_centrality(lg, num_sources=2).collect()
    assert not any("O(V*E)" in str(w.message) for w in rec)
