"""s-metric / rich-club / effective-size / efficiency / isolates vs nx."""

import math

import networkx as nx
import pytest

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.structure import (
    effective_size,
    global_efficiency,
    isolates,
    number_of_isolates,
    rich_club_coefficient,
    s_metric,
)


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


# ---------------------------------------------------------------- s-metric


@pytest.mark.parametrize("builder", [two_triangles_bridge, barabasi])
def test_s_metric_undirected(spark, builder):
    g = builder()
    assert math.isclose(s_metric(lg(spark, g)), nx.s_metric(g), abs_tol=1e-9)


def test_s_metric_directed(spark):
    g = gnp_digraph()
    assert math.isclose(s_metric(lg(spark, g)), nx.s_metric(g), abs_tol=1e-9)


def test_s_metric_star(spark):
    g = nx.star_graph(5)  # 5 edges, each 5*1
    assert s_metric(lg(spark, g)) == 25.0


# ---------------------------------------------------------------- rich club


@pytest.mark.parametrize("builder", [two_triangles_bridge, barabasi])
def test_rich_club(spark, builder):
    g = builder()
    got = {
        int(r["k"]): r["phi"]
        for r in rich_club_coefficient(lg(spark, g)).collect()
    }
    want = nx.rich_club_coefficient(g, normalized=False)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


def test_rich_club_with_isolates(spark):
    g = two_triangles_bridge()
    g.add_nodes_from(["Z1", "Z2"])  # isolates shift N_k, never E_k
    got = {
        int(r["k"]): r["phi"]
        for r in rich_club_coefficient(lg(spark, g)).collect()
    }
    want = nx.rich_club_coefficient(g, normalized=False)
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


def test_rich_club_refusals(spark):
    with pytest.raises(ValueError):
        rich_club_coefficient(lg(spark, gnp_digraph())).collect()
    with pytest.raises(NotImplementedError):
        rich_club_coefficient(lg(spark, barabasi()), normalized=True)


# ------------------------------------------------------------ effective size


@pytest.mark.parametrize("builder", [two_triangles_bridge, barabasi])
def test_effective_size(spark, builder):
    g = builder()
    rows = effective_size(lg(spark, g)).collect()
    name_of = lg(spark, g).name_of()
    got = {name_of[r["vid"]]: r["effective_size"] for r in rows}
    want = nx.effective_size(g)
    assert got.keys() == {str(k) for k in want}
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_effective_size_isolate_null(spark):
    g = nx.path_graph(3)
    g.add_node(9)
    rows = effective_size(lg(spark, g)).collect()
    by_vid = {r["vid"]: r["effective_size"] for r in rows}
    graph = lg(spark, g)
    iso_vid = graph.vid_of()["9"]
    assert by_vid[iso_vid] is None  # nx: NaN
    want = nx.effective_size(g)
    name_of = graph.name_of()
    for vid, v in by_vid.items():
        if v is not None:
            assert math.isclose(v, want[int(name_of[vid])], abs_tol=1e-9)


def test_effective_size_nodes_param(spark):
    g = two_triangles_bridge()
    graph = lg(spark, g)
    vids = [graph.vid_of()["A"], graph.vid_of()["D"]]
    rows = effective_size(graph, nodes=vids).collect()
    assert {r["vid"] for r in rows} == set(vids)


# -------------------------------------------------------------- efficiency


@pytest.mark.parametrize("builder", [two_triangles_bridge, barabasi])
def test_global_efficiency(spark, builder):
    g = builder()
    assert math.isclose(
        global_efficiency(lg(spark, g)), nx.global_efficiency(g), abs_tol=1e-9
    )


def test_global_efficiency_disconnected(spark):
    g = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(5))
    assert math.isclose(
        global_efficiency(lg(spark, g)), nx.global_efficiency(g), abs_tol=1e-9
    )


def test_global_efficiency_directed_raises(spark):
    with pytest.raises(ValueError):
        global_efficiency(lg(spark, gnp_digraph()))


# ---------------------------------------------------------------- isolates


def test_isolates(spark):
    g = nx.path_graph(4)
    g.add_nodes_from([7, 8, 9])
    graph = lg(spark, g)
    name_of = graph.name_of()
    got = {name_of[r["vid"]] for r in isolates(graph).collect()}
    assert got == {"7", "8", "9"}
    assert number_of_isolates(graph) == 3


def test_isolates_directed_none(spark):
    g = gnp_digraph()
    assert number_of_isolates(lg(spark, g)) == len(list(nx.isolates(g)))


# ---------------------------------------------------------------- dispatch


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = barabasi()
    assert math.isclose(
        nx.s_metric(g, backend="spark"), nx.s_metric(g), abs_tol=1e-9
    )
    assert math.isclose(
        nx.global_efficiency(g, backend="spark"),
        nx.global_efficiency(g),
        abs_tol=1e-9,
    )
    got = nx.rich_club_coefficient(g, normalized=False, backend="spark")
    want = nx.rich_club_coefficient(g, normalized=False)
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12)
    es_got = nx.effective_size(g, backend="spark")
    es_want = nx.effective_size(g)
    for k, v in es_want.items():
        assert math.isclose(es_got[k], v, abs_tol=1e-9)
    assert nx.number_of_isolates(g, backend="spark") == 0
    # pearson alias routes to the exact-sum assortativity path
    assert math.isclose(
        nx.degree_pearson_correlation_coefficient(g, backend="spark"),
        nx.degree_assortativity_coefficient(g),
        abs_tol=1e-6,
    )
