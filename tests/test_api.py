"""NetworkX-shaped API layer tests: reference signature parity,
warn-and-ignore semantics, result shapes."""

import math
import warnings

import networkx as nx

from fixtures_graphs import airport_cycle, chain_digraph, social_digraph, two_triangles_bridge
from oracles import nx_pagerank
from nx_neptune_spark import api
from nx_neptune_spark.graph import LinkGraph


def test_pagerank_dict_shape_and_values(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    got = api.pagerank(lg)
    want = nx_pagerank(g)
    assert isinstance(got, dict) and set(got) == {str(k) for k in want}
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-6)


def test_pagerank_warns_on_remote_only_params(spark):
    lg = LinkGraph.from_networkx(spark, chain_digraph())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        api.pagerank(lg, vertex_label="Page", concurrency=4)
    msgs = " ".join(str(x.message) for x in w)
    assert "vertex_label" in msgs and "concurrency" in msgs


def test_pagerank_write_property_mutates_vertices(spark):
    # reference mutate variant: writeProperty stores scores remotely
    # instead of returning them (pagerank.py:176-183)
    lg = LinkGraph.from_networkx(spark, chain_digraph())
    out = api.pagerank(lg, write_property="pr_score")
    assert out == {}
    assert "pr_score" in lg.vertices.columns
    total = sum(r["pr_score"] for r in lg.vertices.collect())
    assert math.isclose(total, 1.0, abs_tol=1e-9)


def test_degree_variants(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    for ours, theirs in [
        (api.degree_centrality(lg), nx.degree_centrality(g)),
        (api.in_degree_centrality(lg), nx.in_degree_centrality(g)),
        (api.out_degree_centrality(lg), nx.out_degree_centrality(g)),
    ]:
        want = {str(k): v for k, v in theirs.items()}
        assert ours.keys() == want.keys()
        for k in want:  # nx computes d*(1/(n-1)), we compute d/(n-1): 1-ulp apart
            assert math.isclose(ours[k], want[k], rel_tol=1e-12)


def test_closeness_single_node_and_distance_warn(spark):
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = api.closeness_centrality(lg, u="LAX", distance="weight")
    assert any("distance" in str(x.message) for x in w)
    assert math.isclose(got, nx.closeness_centrality(g, u="LAX"), abs_tol=1e-9)


def test_lpa_shapes_and_aliases(spark):
    lg = LinkGraph.from_networkx(spark, two_triangles_bridge())
    comms = list(api.label_propagation_communities(lg))
    assert sorted(map(sorted, comms)) == [["A", "B", "C"], ["D", "E", "F"]]
    assert api.asyn_lpa_communities is api.label_propagation_communities
    assert api.fast_label_propagation_communities is api.label_propagation_communities


def test_connected_components_generator(spark):
    lg = LinkGraph.from_networkx(spark, chain_digraph())
    comps = sorted(map(sorted, api.connected_components(lg)))
    assert comps == [["A", "B", "C", "D", "E"], ["X"]]


def test_triangles_and_bfs(spark):
    g = two_triangles_bridge()
    lg = LinkGraph.from_networkx(spark, g)
    assert api.triangles(lg) == {str(k): v for k, v in nx.triangles(g).items()}
    assert api.triangles(lg, nodes=["A"]) == {"A": 1}

    sg = social_digraph()
    slg = LinkGraph.from_networkx(spark, sg)
    assert list(api.bfs_edges(slg, "Alice")) == [("Alice", "Bob"), ("Alice", "Carl")]
    assert api.descendants_at_distance(slg, "Alice", 1) == {"Bob", "Carl"}
    assert list(api.bfs_layers(slg, "Alice")) == [["Alice"], ["Bob", "Carl"]]


def test_louvain_api_shape_and_warns(spark):
    """resolution is now natively supported (round 4) -- only `seed`
    keeps warn-and-ignore parity with the reference (louvain.py:96)."""
    lg = LinkGraph.from_networkx(spark, two_triangles_bridge())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        comms = api.louvain_communities(lg, resolution=1.2, seed=7)
    assert any("seed" in str(x.message) for x in w)
    assert not any("resolution" in str(x.message) for x in w)
    assert sorted(map(sorted, comms)) == [["A", "B", "C"], ["D", "E", "F"]]


def test_mutate_variants_write_property(spark):
    """write_property mutate variants for degree/closeness/LPA/Louvain
    (reference mutate builders opencypher_builder.py:804-984): the score
    column must land on graph.vertices and the call return empty."""
    g = two_triangles_bridge()

    lg = LinkGraph.from_networkx(spark, g)
    assert api.degree_centrality(lg, write_property="deg") == {}
    assert "deg" in lg.vertices.columns
    want = {str(k): v for k, v in nx.degree_centrality(g).items()}
    got = {r["name"]: r["deg"] for r in lg.vertices.collect()}
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12)

    assert api.closeness_centrality(lg, write_property="clo") == {}
    assert "clo" in lg.vertices.columns
    want = nx.closeness_centrality(g)
    got = {r["name"]: r["clo"] for r in lg.vertices.collect()}
    for k in want:
        assert math.isclose(got[str(k)], want[k], abs_tol=1e-9)

    assert list(api.label_propagation_communities(lg, write_property="comm")) == []
    assert "comm" in lg.vertices.columns
    labels = {r["name"]: r["comm"] for r in lg.vertices.collect()}
    assert len(set(labels.values())) == 2
    assert labels["A"] == labels["B"] == labels["C"]

    assert api.louvain_communities(lg, write_property="louv") == []
    assert "louv" in lg.vertices.columns
    labels = {r["name"]: r["louv"] for r in lg.vertices.collect()}
    assert labels["A"] == labels["B"] == labels["C"] != labels["D"]


def test_mutate_guard_rejects_bad_property(spark):
    """validate_mutate_execution_config analog (algorithm_utils.py:41-61 /
    nx_plugin/config.py:195-202): invalid or core-colliding property
    names are rejected before any compute."""
    import pytest as _pytest

    lg = LinkGraph.from_networkx(spark, two_triangles_bridge())
    with _pytest.raises(ValueError):
        api.degree_centrality(lg, write_property="bad name; drop")
    with _pytest.raises(ValueError):
        api.pagerank(lg, write_property="vid")


def test_closeness_single_source_fast_path(spark):
    """u= must run a single-source BFS (reference source-list query form,
    opencypher_builder.py:860-905), not all-pairs-then-index."""
    g = airport_cycle()
    lg = LinkGraph.from_networkx(spark, g)
    got = api.closeness_centrality(lg, u="LAX")
    assert math.isclose(got, nx.closeness_centrality(g, u="LAX"), abs_tol=1e-9)


def test_louvain_threshold_and_level_tolerance_wired(spark):
    """threshold -> iterationTolerance, level_tolerance -> levelTolerance
    (reference louvain.py:101-118): accepted without warning and a huge
    threshold stops refinement early (coarser or equal communities)."""
    lg = LinkGraph.from_networkx(spark, two_triangles_bridge())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        comms = api.louvain_communities(lg, threshold=1e-07, level_tolerance=1e-07)
    assert not [x for x in w if "threshold" in str(x.message)]
    assert sorted(map(sorted, comms)) == [["A", "B", "C"], ["D", "E", "F"]]
    # a threshold larger than any achievable gain halts local moving
    # after its first sweep (the sweep's own moves are kept when they
    # improve modularity -- reference iterationTolerance stops
    # *iterating*, it doesn't veto the executed sweep)
    giant = api.louvain_communities(lg, threshold=1e9)
    assert {m for c in giant for m in c} == {"A", "B", "C", "D", "E", "F"}
    assert len(giant) >= len(comms)  # strictly less refined or equal


def test_pagerank_traversal_direction_inbound(spark):
    """traversal_direction='inbound' (reference pagerank.py:63,125-126)
    == PageRank over the reversed digraph."""
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    got = api.pagerank(lg, traversal_direction="inbound")
    from oracles import nx_pagerank as _nxpr

    want = _nxpr(g.reverse())
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.pagerank(lg, traversal_direction="sideways")


def test_dict_adapter_row_guard(spark):
    """The NetworkX-dict adapters are fixture-scale only: past
    max_adapter_rows they refuse to collect and point at the DataFrame
    operator layer (VERDICT r1 'enforce the docstring promise')."""
    import pytest as _pytest

    from nx_neptune_spark.graph import LinkGraph

    g = LinkGraph.from_edge_pairs(spark, [("a", "b"), ("b", "c")])
    assert g.name_of()  # under the cap: fine
    old = LinkGraph.max_adapter_rows
    try:
        LinkGraph.max_adapter_rows = 2
        with _pytest.raises(RuntimeError, match="fixture-scale"):
            g.name_of()
        with _pytest.raises(RuntimeError, match="operator layer"):
            g.vid_of()
    finally:
        LinkGraph.max_adapter_rows = old
