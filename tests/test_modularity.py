"""Modularity vs nx.community.modularity (scalar + per-community
stats + resolution + weights + dispatch)."""

import math

import networkx as nx
import pytest

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.louvain import louvain_communities
from nx_neptune_spark.operators.modularity import modularity, modularity_stats


def nx_partition(g, n_blocks=3):
    """Deterministic partition: node order chunked into n_blocks."""
    nodes = sorted(g.nodes, key=str)
    size = max(1, (len(nodes) + n_blocks - 1) // n_blocks)
    return [set(nodes[i : i + size]) for i in range(0, len(nodes), size)]


def to_df(spark, lg, comms):
    vid_of = lg.vid_of()
    rows = [(vid_of[str(n)], ci) for ci, c in enumerate(comms) for n in c]
    return spark.createDataFrame(rows, "vid long, community long")


def test_modularity_matches_nx(spark):
    g = barabasi()
    lg = LinkGraph.from_networkx(spark, g)
    comms = nx_partition(g)
    got = modularity(lg, to_df(spark, lg, comms))
    want = nx.community.modularity(g, comms)
    assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


def test_modularity_resolution(spark):
    g = two_triangles_bridge()
    lg = LinkGraph.from_networkx(spark, g)
    comms = nx_partition(g, 2)
    for gamma in (0.5, 1.0, 2.0):
        got = modularity(lg, to_df(spark, lg, comms), resolution=gamma)
        want = nx.community.modularity(g, comms, resolution=gamma)
        assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


def test_modularity_weighted(spark):
    g = nx.Graph()
    g.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 2.5), (3, 4, 1.5)]
    )
    lg = LinkGraph.from_networkx(spark, g)
    comms = [{0, 1, 2}, {3, 4}]
    got = modularity(lg, to_df(spark, lg, comms), weight="weight")
    want = nx.community.modularity(g, comms, weight="weight")
    assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


def test_modularity_scores_louvain_output(spark):
    """Round-trip: score the engine's own Louvain partition; the sum of
    per-community contributions equals the scalar and matches nx."""
    g = two_triangles_bridge()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    cdf = louvain_communities(lg, max_levels=3, max_iterations=8)
    by_name = {str(n): n for n in g.nodes}
    groups: dict = {}
    for r in cdf.collect():
        groups.setdefault(r["community"], set()).add(by_name[names[r["vid"]]])
    nx_comms = list(groups.values())
    stats = modularity_stats(lg, cdf).collect()
    q_from_stats = sum(r["contribution"] for r in stats)
    want = nx.community.modularity(g, nx_comms)
    assert math.isclose(q_from_stats, want, rel_tol=0, abs_tol=1e-12)
    assert names  # vid dictionary intact (adapter-scale graph)


def test_modularity_dispatch_and_not_a_partition(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    comms = nx_partition(g, 2)
    got = nx.community.modularity(g, comms, backend="spark")
    want = nx.community.modularity(g, comms)
    assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)
    with pytest.raises(nx.NetworkXError):
        nx.community.modularity(g, [set(list(g.nodes)[:2])], backend="spark")
