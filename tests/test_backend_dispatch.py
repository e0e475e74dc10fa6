"""NetworkX backend dispatch: ``backend="spark"`` must route through
nx_neptune_spark.interface.BackendInterface and agree with native
NetworkX, modeled on the reference's BACKEND-switch integ pattern
(/root/reference/integ_test/utils/test_utils.py:26-28)."""

import math

import networkx as nx
import pytest

from oracles import nx_pagerank
from fixtures_graphs import two_triangles_bridge


@pytest.fixture(scope="module", autouse=True)
def backend(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    yield "spark"


def test_pagerank_dispatch_parity(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)])  # int node keys
    got = nx.pagerank(g, backend="spark")
    want = nx_pagerank(g)  # native semantics (scipy absent -> pure python oracle)
    assert set(got) == set(want) == {0, 1, 2, 3}  # original key types preserved
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-6)


def test_community_dispatch_parity(spark):
    g = two_triangles_bridge()
    got = {frozenset(c) for c in nx.community.label_propagation_communities(g, backend="spark")}
    want = {frozenset(c) for c in nx.community.label_propagation_communities(g)}
    assert got == want


def test_degree_centrality_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.degree_centrality(g, backend="spark")
    want = nx.degree_centrality(g)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12)


def test_bfs_and_descendants_dispatch(spark):
    g = nx.path_graph(6)
    got = set(nx.descendants_at_distance(g, 0, 3, backend="spark"))
    assert got == nx.descendants_at_distance(g, 0, 3)
    layers_got = [sorted(l) for l in nx.bfs_layers(g, [0], backend="spark")]
    layers_want = [sorted(l) for l in nx.bfs_layers(g, [0])]
    assert layers_got == layers_want


def test_bfs_edges_sort_neighbors_warns(spark):
    g = nx.path_graph(4)
    with pytest.warns(UserWarning, match="sort_neighbors"):
        list(nx.bfs_edges(g, 0, sort_neighbors=sorted, backend="spark"))


def test_triangles_and_components_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.triangles(g, backend="spark")
    assert got == nx.triangles(g)
    cc_got = {frozenset(c) for c in nx.connected_components(g, backend="spark")}
    cc_want = {frozenset(c) for c in nx.connected_components(g)}
    assert cc_got == cc_want


def test_native_path_still_works_after_registration(spark):
    g = nx.Graph([(0, 1), (2, 3)])  # two components
    # registration must not hijack backend=None calls
    want = {frozenset(c) for c in nx.connected_components(g)}
    assert want == {frozenset({0, 1}), frozenset({2, 3})}


def test_round4_extension_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.core_number(g, backend="spark")
    assert got == nx.core_number(g)
    kc = nx.k_core(g, k=2, backend="spark")
    assert set(kc.nodes) == set(nx.k_core(g, k=2).nodes)
    ec = nx.eigenvector_centrality(g, backend="spark", tol=1e-10, max_iter=500)
    want = nx.eigenvector_centrality(g, tol=1e-10, max_iter=500)
    for k in want:
        assert math.isclose(ec[k], want[k], rel_tol=0, abs_tol=1e-7)


def test_k_truss_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.k_truss(g, 3, backend="spark")
    want = nx.k_truss(g, 3)
    assert set(got.nodes) == set(want.nodes)
    assert {frozenset(e) for e in got.edges} == {frozenset(e) for e in want.edges}
    # directed input must refuse like networkx
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.k_truss(nx.DiGraph([(0, 1), (1, 2), (2, 0)]), 3, backend="spark")


def test_sssp_and_linkpred_dispatch(spark):
    g = nx.Graph()
    g.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 2.5)]
    )
    got = nx.single_source_dijkstra_path_length(g, 0, backend="spark")
    assert got == nx.single_source_dijkstra_path_length(g, 0)
    jac_got = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.jaccard_coefficient(g, backend="spark")
    )
    jac_want = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.jaccard_coefficient(g)
    )
    assert jac_got == jac_want
    pa_got = sorted(
        (tuple(sorted((u, v))), p)
        for u, v, p in nx.preferential_attachment(g, backend="spark")
    )
    pa_want = sorted(
        (tuple(sorted((u, v))), p) for u, v, p in nx.preferential_attachment(g)
    )
    assert pa_got == pa_want
    ebunch = [(0, 3), (1, 3)]
    aa_got = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.adamic_adar_index(g, ebunch, backend="spark")
    )
    aa_want = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.adamic_adar_index(g, ebunch)
    )
    assert aa_got == aa_want
    ra_got = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.resource_allocation_index(g, ebunch, backend="spark")
    )
    ra_want = sorted(
        (tuple(sorted((u, v))), round(p, 12))
        for u, v, p in nx.resource_allocation_index(g, ebunch)
    )
    assert ra_got == ra_want


def test_betweenness_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.betweenness_centrality(g, backend="spark")
    want = nx.betweenness_centrality(g)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-9)


def test_mis_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.maximal_independent_set(g, backend="spark")
    # deterministic engine: a valid MIS of THIS graph, not nx's sample
    assert len(got) == len(set(got))
    s = set(got)
    assert all(not g.has_edge(u, v) for u in s for v in s if u != v)
    assert all(v in s or any(n in s for n in g.neighbors(v)) for v in g)
    # seeded form: the seed nodes must be contained in the result
    seeded = set(nx.maximal_independent_set(g, nodes=["A"], backend="spark"))
    assert "A" in seeded
    assert all(
        not g.has_edge(u, v) for u in seeded for v in seeded if u != v
    )
    with pytest.raises(ValueError):
        nx.maximal_independent_set(g, nodes=["A", "B"], backend="spark")
    with pytest.raises(ValueError):
        nx.maximal_independent_set(g, nodes=["ZZ"], backend="spark")


def test_greedy_color_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.greedy_color(g, backend="spark")
    assert set(got) == set(g.nodes)
    for u, v in g.edges:
        assert got[u] != got[v]
    assert max(got.values()) + 1 <= max(d for _, d in g.degree) + 1


def test_matching_cover_dominating_dispatch(spark):
    g = two_triangles_bridge()
    m = nx.maximal_matching(g, backend="spark")
    used = set()
    for u, v in m:
        assert g.has_edge(u, v)
        assert u not in used and v not in used
        used |= {u, v}
    for u, v in g.edges:
        assert u in used or v in used
    cover = nx.approximation.min_weighted_vertex_cover(g, backend="spark")
    assert all(u in cover or v in cover for u, v in g.edges)
    assert len(cover) == 2 * len(m)
    with pytest.raises(NotImplementedError):
        nx.approximation.min_weighted_vertex_cover(g, weight="w", backend="spark")
    dom = nx.dominating_set(g, backend="spark")
    assert all(v in dom or any(n in dom for n in g.neighbors(v)) for v in g)
    dom_a = nx.dominating_set(g, start_with="A", backend="spark")
    assert "A" in dom_a
    assert all(v in dom_a or any(n in dom_a for n in g.neighbors(v)) for v in g)


def test_spanning_tree_dispatch(spark):
    import math
    import random

    rnd = random.Random(41)
    g = nx.gnm_random_graph(14, 26, seed=9)
    ws = rnd.sample(range(1, 500), g.number_of_edges())
    for (u, v), w in zip(g.edges, ws):
        g[u][v]["weight"] = float(w)

    t_got = nx.minimum_spanning_tree(g, backend="spark")
    t_want = nx.minimum_spanning_tree(g)
    assert set(t_got.nodes) == set(t_want.nodes)
    assert {frozenset(e) for e in t_got.edges} == {
        frozenset(e) for e in t_want.edges
    }
    assert t_got.size(weight="weight") == t_want.size(weight="weight")

    # generator form: kruskal yield order (ascending weight)
    seq = list(nx.minimum_spanning_edges(g, backend="spark"))
    assert [frozenset((u, v)) for u, v, _ in seq] == [
        frozenset((u, v)) for u, v, _ in nx.minimum_spanning_edges(g)
    ]
    assert all(isinstance(d, dict) for _, _, d in seq)

    mx = nx.maximum_spanning_tree(g, backend="spark")
    assert {frozenset(e) for e in mx.edges} == {
        frozenset(e) for e in nx.maximum_spanning_tree(g).edges
    }

    # custom weight key honored
    h = nx.Graph()
    h.add_edge("a", "b", cost=3.0)
    h.add_edge("b", "c", cost=1.0)
    h.add_edge("a", "c", cost=2.0)
    t = nx.minimum_spanning_tree(h, weight="cost", backend="spark")
    assert {frozenset(e) for e in t.edges} == {
        frozenset(("b", "c")), frozenset(("a", "c"))
    }

    # NaN contract
    h["a"]["b"]["cost"] = math.nan
    with pytest.raises(ValueError):
        nx.minimum_spanning_tree(h, weight="cost", backend="spark")
    t2 = nx.minimum_spanning_tree(h, weight="cost", ignore_nan=True, backend="spark")
    assert {frozenset(e) for e in t2.edges} == {
        frozenset(("b", "c")), frozenset(("a", "c"))
    }

    # directed refusal, nx-shaped
    with pytest.raises(nx.NetworkXNotImplemented):
        list(nx.minimum_spanning_edges(nx.DiGraph([(0, 1)]), backend="spark"))


def test_dag_reachability_dispatch(spark):
    base = nx.gnp_random_graph(30, 0.12, seed=13, directed=True)
    dag = nx.DiGraph((u, v) for u, v in base.edges() if u < v)
    dag.add_nodes_from(base.nodes())

    assert nx.is_directed_acyclic_graph(dag, backend="spark") is True
    cyc = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert nx.is_directed_acyclic_graph(cyc, backend="spark") is False

    got = nx.dag_longest_path(dag, backend="spark")
    assert len(got) == nx.dag_longest_path_length(dag) + 1
    for u, v in zip(got, got[1:]):
        assert dag.has_edge(u, v)
    assert nx.dag_longest_path_length(dag, backend="spark") == (
        nx.dag_longest_path_length(dag)
    )
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.dag_longest_path(nx.Graph([(0, 1)]), backend="spark")

    g = nx.gnp_random_graph(30, 0.06, seed=17, directed=True)
    for s, t in [(0, 5), (3, 29), (7, 7)]:
        assert nx.has_path(g, s, t, backend="spark") == nx.has_path(g, s, t)
    with pytest.raises(nx.NodeNotFound):
        nx.has_path(g, 0, 999, backend="spark")

    assert nx.single_source_shortest_path_length(
        g, 0, backend="spark"
    ) == nx.single_source_shortest_path_length(g, 0)
    assert nx.single_source_shortest_path_length(
        g, 0, cutoff=2, backend="spark"
    ) == nx.single_source_shortest_path_length(g, 0, cutoff=2)


def test_community_linkpred_dispatch(spark):
    """Soundarajan–Hopcroft / WIC / CCPA dispatch parity, incl. the
    default all-non-edges ebunch, an explicit ebunch naming adjacent
    pairs, string community labels, and the delta/alpha kwargs."""
    g = two_triangles_bridge()
    for i, n in enumerate(sorted(g.nodes)):
        g.nodes[n]["community"] = "left" if i < 3 else "right"

    def pairs(it):
        return sorted((tuple(sorted((u, v))), round(p, 12)) for u, v, p in it)

    assert pairs(nx.cn_soundarajan_hopcroft(g, backend="spark")) == pairs(
        nx.cn_soundarajan_hopcroft(g)
    )
    assert pairs(nx.ra_index_soundarajan_hopcroft(g, backend="spark")) == pairs(
        nx.ra_index_soundarajan_hopcroft(g)
    )
    assert pairs(nx.within_inter_cluster(g, delta=0.5, backend="spark")) == pairs(
        nx.within_inter_cluster(g, delta=0.5)
    )
    eb = [("A", "B"), ("A", "E"), ("B", "F")]  # (A,B) is an existing edge
    assert pairs(nx.cn_soundarajan_hopcroft(g, eb, backend="spark")) == pairs(
        nx.cn_soundarajan_hopcroft(g, eb)
    )
    assert pairs(
        nx.common_neighbor_centrality(g, alpha=0.7, backend="spark")
    ) == pairs(nx.common_neighbor_centrality(g, alpha=0.7))
    assert pairs(
        nx.common_neighbor_centrality(g, eb, backend="spark")
    ) == pairs(nx.common_neighbor_centrality(g, eb))
    assert pairs(
        nx.common_neighbor_centrality(g, eb, alpha=1, backend="spark")
    ) == pairs(nx.common_neighbor_centrality(g, eb, alpha=1))


def test_community_linkpred_missing_attr_raises(spark):
    g = two_triangles_bridge()
    g.nodes["A"]["community"] = 0  # others lack the attribute
    with pytest.raises(nx.NetworkXAlgorithmError):
        list(nx.cn_soundarajan_hopcroft(g, backend="spark"))


def test_bridges_dispatch(spark):
    g = two_triangles_bridge()
    got = {frozenset(e) for e in nx.bridges(g, backend="spark")}
    want = {frozenset(e) for e in nx.bridges(g)}
    assert got == want == {frozenset(("C", "D"))}
    assert nx.has_bridges(g, backend="spark") is True
    assert nx.has_bridges(nx.cycle_graph(5), backend="spark") is False
    # root scoping: bridges of root's component only; NodeNotFound else
    h = nx.disjoint_union(nx.cycle_graph(4), nx.path_graph(3))
    got_r = {frozenset(e) for e in nx.bridges(h, root=4, backend="spark")}
    want_r = {frozenset(e) for e in nx.bridges(h, root=4)}
    assert got_r == want_r
    with pytest.raises(nx.NodeNotFound):
        list(nx.bridges(h, root=99, backend="spark"))


def test_local_bridges_dispatch(spark):
    g = nx.cycle_graph(6)
    got = sorted((min(u, v), max(u, v), s) for u, v, s in nx.local_bridges(g, backend="spark"))
    want = sorted((min(u, v), max(u, v), s) for u, v, s in nx.local_bridges(g))
    assert got == want
    g2 = two_triangles_bridge()
    got2 = {frozenset((u, v)) for u, v, _ in nx.local_bridges(g2, backend="spark")}
    want2 = {frozenset((u, v)) for u, v, _ in nx.local_bridges(g2)}
    assert got2 == want2


def test_k_edge_components_dispatch(spark):
    g = nx.barbell_graph(4, 2)
    got = {frozenset(c) for c in nx.k_edge_components(g, k=2, backend="spark")}
    want = {frozenset(c) for c in nx.k_edge_components(g, k=2)}
    assert got == want
    got1 = {frozenset(c) for c in nx.k_edge_components(g, k=1, backend="spark")}
    want1 = {frozenset(c) for c in nx.k_edge_components(g, k=1)}
    assert got1 == want1
    with pytest.raises(ValueError):
        list(nx.k_edge_components(g, k=0, backend="spark"))


def test_onion_layers_dispatch(spark):
    g = two_triangles_bridge()
    g.add_node("ISO")
    got = nx.onion_layers(g, backend="spark")
    want = nx.onion_layers(g)
    assert got == want
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.onion_layers(nx.DiGraph([(1, 2)]), backend="spark")


def test_percolation_centrality_dispatch(spark):
    g = two_triangles_bridge()
    states = {n: (i % 4 + 1) / 4.0 for i, n in enumerate(sorted(g.nodes))}
    got = nx.percolation_centrality(g, states=states, backend="spark")
    want = nx.percolation_centrality(g, states=states)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12)
    # attribute path: states read from node data
    h = nx.path_graph(5)
    nx.set_node_attributes(h, {n: 0.2 * (n + 1) for n in h.nodes}, "percolation")
    got_a = nx.percolation_centrality(h, backend="spark")
    want_a = nx.percolation_centrality(h)
    for k in want_a:
        assert math.isclose(got_a[k], want_a[k], rel_tol=1e-9, abs_tol=1e-12)


def test_bipartite_projection_dispatch(spark):
    from networkx.algorithms import bipartite as nxb

    g = nx.Graph()
    left = [f"u{i}" for i in range(6)]
    for i in range(6):
        for k in (0, 1):
            g.add_edge(f"u{i}", f"m{(i * 3 + k) % 5}")
    got = nxb.weighted_projected_graph(g, left, backend="spark")
    want = nxb.weighted_projected_graph(g, left)
    assert set(got.nodes) == set(want.nodes)
    assert {frozenset(e) for e in got.edges} == {frozenset(e) for e in want.edges}
    for u, v, d in want.edges(data=True):
        assert got[u][v]["weight"] == d["weight"]
    got_c = nxb.collaboration_weighted_projected_graph(g, left, backend="spark")
    want_c = nxb.collaboration_weighted_projected_graph(g, left)
    for u, v, d in want_c.edges(data=True):
        assert math.isclose(got_c[u][v]["weight"], d["weight"])
    got_p = nxb.projected_graph(g, left, backend="spark")
    want_p = nxb.projected_graph(g, left)
    assert {frozenset(e) for e in got_p.edges} == {frozenset(e) for e in want_p.edges}


def test_simrank_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.simrank_similarity(g, backend="spark")
    want = nx.simrank_similarity(g)
    for u in want:
        for v in want[u]:
            assert math.isclose(got[u][v], want[u][v], rel_tol=1e-9, abs_tol=1e-12)
    gs = nx.simrank_similarity(g, source="A", backend="spark")
    ws = nx.simrank_similarity(g, source="A")
    for v in ws:
        assert math.isclose(gs[v], ws[v], rel_tol=1e-9, abs_tol=1e-12)
    gt = nx.simrank_similarity(g, source="A", target="D", backend="spark")
    wt = nx.simrank_similarity(g, source="A", target="D")
    assert math.isclose(gt, wt, rel_tol=1e-9, abs_tol=1e-12)
    with pytest.raises(nx.NodeNotFound):
        nx.simrank_similarity(g, source="ZZ", backend="spark")


def test_load_centrality_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.load_centrality(g, backend="spark")
    want = nx.load_centrality(g)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12)
    gv = nx.load_centrality(g, v="C", backend="spark")
    assert math.isclose(gv, want["C"], rel_tol=1e-9, abs_tol=1e-12)


def test_attribute_assortativity_dispatch(spark):
    g = nx.Graph()
    g.add_nodes_from([0, 1], color="red")
    g.add_nodes_from([2, 3], color="blue")
    g.add_edges_from([(0, 1), (2, 3), (1, 2)])
    got = nx.attribute_assortativity_coefficient(g, "color", backend="spark")
    want = nx.attribute_assortativity_coefficient(g, "color")
    assert math.isclose(got, want, rel_tol=1e-9)
    nx.set_node_attributes(g, {n: n + 1 for n in g.nodes}, "size")
    got_n = nx.numeric_assortativity_coefficient(g, "size", backend="spark")
    want_n = nx.numeric_assortativity_coefficient(g, "size")
    assert math.isclose(got_n, want_n, rel_tol=1e-9)


def test_eulerian_dispatch(spark):
    cases = [
        nx.cycle_graph(5),                       # eulerian
        nx.path_graph(4),                        # semi (2 odd)
        nx.star_graph(3),                        # neither (>2 odd... 3 odd +1? star_graph(3): center deg3, leaves deg1 -> 4 odd)
        nx.DiGraph([(0, 1), (1, 2), (2, 0)]),    # eulerian directed
        nx.DiGraph([(0, 1), (1, 2)]),            # directed path: semi
        nx.DiGraph([(0, 1), (2, 3)]),            # disconnected
        nx.disjoint_union(nx.cycle_graph(3), nx.cycle_graph(3)),
    ]
    for g in cases:
        assert nx.is_eulerian(g, backend="spark") == nx.is_eulerian(g), g.edges
        assert nx.has_eulerian_path(g, backend="spark") == nx.has_eulerian_path(g), g.edges
        assert nx.is_semieulerian(g, backend="spark") == nx.is_semieulerian(g), g.edges
    # source-pinned path check
    p = nx.path_graph(4)
    assert nx.has_eulerian_path(p, source=0, backend="spark") == nx.has_eulerian_path(p, source=0)
    assert nx.has_eulerian_path(p, source=1, backend="spark") == nx.has_eulerian_path(p, source=1)


def test_transitive_closure_dispatch(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0), (3, 4), (5, 5)])
    for refl in (False, True, None):
        got = set(nx.transitive_closure(g, reflexive=refl, backend="spark").edges)
        want = set(nx.transitive_closure(g, reflexive=refl).edges)
        assert got == want, refl
    dag = nx.DiGraph([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)])
    got_r = set(nx.transitive_reduction(dag, backend="spark").edges)
    want_r = set(nx.transitive_reduction(dag).edges)
    assert got_r == want_r
    got_d = set(nx.transitive_closure_dag(dag, backend="spark").edges)
    want_d = set(nx.transitive_closure_dag(dag).edges)
    assert got_d == want_d
    with pytest.raises(nx.NetworkXError):
        nx.transitive_reduction(g, backend="spark")


def test_weighted_closeness_dispatch(spark):
    g = two_triangles_bridge()
    for i, (u, v) in enumerate(g.edges):
        g[u][v]["w"] = float(i + 1)
    got = nx.closeness_centrality(g, distance="w", backend="spark")
    want = nx.closeness_centrality(g, distance="w")
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)
    gu = nx.closeness_centrality(g, u="C", distance="w", backend="spark")
    assert math.isclose(gu, want["C"], rel_tol=1e-9)


def test_dispersion_dispatch(spark):
    g = nx.barbell_graph(4, 1)
    got = nx.dispersion(g, backend="spark")
    want = nx.dispersion(g)
    assert set(got) == set(want)
    for u in want:
        assert set(got[u]) == set(want[u])
        for v in want[u]:
            assert math.isclose(got[u][v], want[u][v], rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(
        nx.dispersion(g, u=0, v=1, backend="spark"), nx.dispersion(g, u=0, v=1),
        rel_tol=1e-9, abs_tol=1e-12,
    )
    gu = nx.dispersion(g, u=0, backend="spark")
    wu = nx.dispersion(g, u=0)
    for v in wu:
        assert math.isclose(gu[v], wu[v], rel_tol=1e-9, abs_tol=1e-12)


def test_girvan_newman_dispatch(spark):
    import itertools

    # level 1 has a unique max edge (the barbell bridge); deeper
    # levels are tie-dependent (nx breaks ties by dict order, the
    # backend by (score, edge) — both valid GN hierarchies)
    g = nx.barbell_graph(4, 0)
    got = next(iter(nx.community.girvan_newman(g, backend="spark")))
    want = next(iter(nx.community.girvan_newman(g)))
    assert {frozenset(c) for c in got} == {frozenset(c) for c in want}
    # custom most_valuable_edge: fully deterministic, 2 levels
    def mve(h):
        return max(h.edges, key=lambda e: (h.degree(e[0]) + h.degree(e[1]), e))

    got2 = list(
        itertools.islice(
            nx.community.girvan_newman(g, most_valuable_edge=mve, backend="spark"), 2
        )
    )
    want2 = list(
        itertools.islice(nx.community.girvan_newman(g, most_valuable_edge=mve), 2)
    )
    for gl, wl in zip(got2, want2):
        assert {frozenset(c) for c in gl} == {frozenset(c) for c in wl}


def test_efficiency_dispatch(spark):
    g = nx.disjoint_union(nx.path_graph(4), nx.path_graph(2))
    assert nx.efficiency(g, 0, 3, backend="spark") == nx.efficiency(g, 0, 3)
    assert nx.efficiency(g, 0, 5, backend="spark") == nx.efficiency(g, 0, 5) == 0
    with pytest.raises(ZeroDivisionError):
        nx.efficiency(g, 2, 2, backend="spark")


def test_generalized_degree_dispatch(spark):
    g = two_triangles_bridge()
    got = nx.generalized_degree(g, backend="spark")
    want = nx.generalized_degree(g)
    assert {k: dict(v) for k, v in got.items()} == {
        k: dict(v) for k, v in want.items()
    }
    assert dict(nx.generalized_degree(g, nodes="C", backend="spark")) == dict(
        nx.generalized_degree(g, nodes="C")
    )


def test_percolation_default_states_dispatch(spark):
    # ADVICE r5: no attributes set -> nx 3.6 default=1 (equivalent to
    # betweenness), must not raise KeyError
    g = nx.path_graph(5)
    got = nx.percolation_centrality(g, backend="spark")
    want = nx.percolation_centrality(g)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=1e-9)


def test_dispersion_nonadjacent_pair_dispatch(spark):
    # ADVICE r5: explicit (u, v) works for NON-adjacent pairs too
    g = nx.Graph([(0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4), (1, 4)])
    assert not g.has_edge(0, 1)
    assert nx.dispersion(g, u=0, v=1, backend="spark") == nx.dispersion(g, u=0, v=1)
    # adjacent explicit pair still agrees
    assert nx.dispersion(g, u=2, v=3, backend="spark") == nx.dispersion(g, u=2, v=3)
    assert nx.dispersion(
        g, u=0, v=1, normalized=False, backend="spark"
    ) == nx.dispersion(g, u=0, v=1, normalized=False)


def test_bridges_multigraph_refused(spark):
    # ADVICE r5: parallel edges flattened -> backend must refuse (under
    # priority-based dispatch nx then falls back to its multigraph-aware
    # implementation; with explicit backend= the refusal surfaces)
    g = nx.MultiGraph()
    g.add_edges_from([(0, 1), (0, 1), (1, 2)])
    with pytest.raises(nx.NetworkXNotImplemented):
        list(nx.bridges(g, backend="spark"))
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.has_bridges(g, backend="spark")
    with pytest.raises(nx.NetworkXNotImplemented):
        list(nx.local_bridges(g, backend="spark"))
    with pytest.raises(nx.NetworkXNotImplemented):
        list(nx.k_edge_components(g, 2, backend="spark"))
    # native nx correctly excludes the multiplicity-2 edge
    assert {frozenset(e) for e in nx.bridges(g)} == {frozenset((1, 2))}


def test_transitive_closure_keeps_edge_attrs(spark):
    # ADVICE r5: data on pre-existing edges survives (nx copies G)
    g = nx.DiGraph()
    g.add_edge(0, 1, weight=7, label="x")
    g.add_edge(1, 2, weight=9)
    got = nx.transitive_closure(g, backend="spark")
    want = nx.transitive_closure(g)
    assert set(got.edges) == set(want.edges)
    assert got.edges[0, 1]["weight"] == 7 and got.edges[0, 1]["label"] == "x"
    assert got.edges[1, 2]["weight"] == 9
    assert got.edges[0, 2] == want.edges[0, 2] == {}


def test_simrank_weighted_refused(spark):
    # ADVICE r5: weighted graphs diverge from nx's weighted
    # normalization -> backend refuses rather than silently diverging
    g = nx.DiGraph()
    g.add_edge(0, 2, weight=3.0)
    g.add_edge(1, 2, weight=1.0)
    g.add_edge(2, 0)
    with pytest.raises(nx.NetworkXNotImplemented):
        nx.simrank_similarity(g, backend="spark")
    # weight attrs that are all 1 are harmless and still dispatch
    h = nx.DiGraph()
    h.add_edge(0, 1, weight=1)
    h.add_edge(1, 0)
    got = nx.simrank_similarity(h, backend="spark")
    want = nx.simrank_similarity(h)
    for a in want:
        for b in want[a]:
            assert math.isclose(got[a][b], want[a][b], rel_tol=0, abs_tol=1e-9)
