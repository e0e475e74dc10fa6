"""Degree assortativity vs nx.degree_assortativity_coefficient."""

import math

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.assortativity import (
    degree_assortativity_coefficient,
    directed_assortativity_profile,
)


def spark_dac(spark, g, **kw):
    return degree_assortativity_coefficient(
        LinkGraph.from_networkx(spark, g), **kw
    )


def test_star_disassortative(spark):
    """A star is maximally disassortative: r = -1."""
    g = nx.star_graph(6)
    got = spark_dac(spark, g)
    want = nx.degree_assortativity_coefficient(g)
    assert math.isclose(got, want, abs_tol=1e-9)
    assert math.isclose(got, -1.0, abs_tol=1e-9)


def test_undirected_fixture(spark):
    g = two_triangles_bridge()
    got = spark_dac(spark, g)
    want = nx.degree_assortativity_coefficient(g)
    assert math.isclose(got, want, abs_tol=1e-9)


@pytest.mark.parametrize(
    "x,y", [("out", "in"), ("out", "out"), ("in", "in"), ("in", "out")]
)
def test_directed_xy_variants(spark, x, y):
    g = gnp_digraph()
    got = spark_dac(spark, g, x=x, y=y)
    want = nx.degree_assortativity_coefficient(g, x=x, y=y)
    assert math.isclose(got, want, abs_tol=1e-9)


def test_profile_matches_scalar_forms(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    row = directed_assortativity_profile(lg).first()
    for col, (x, y) in {
        "r_out_in": ("out", "in"),
        "r_out_out": ("out", "out"),
        "r_in_in": ("in", "in"),
        "r_in_out": ("in", "out"),
    }.items():
        want = nx.degree_assortativity_coefficient(g, x=x, y=y)
        assert math.isclose(row[col], want, abs_tol=1e-9), col


def test_constant_degree_nan(spark):
    """Zero degree variance (a cycle): nx returns nan; so do we."""
    g = nx.cycle_graph(8)
    assert math.isnan(spark_dac(spark, g))


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = nx.degree_assortativity_coefficient(g, backend="spark")
    want = nx.degree_assortativity_coefficient(g)
    assert math.isclose(got, want, abs_tol=1e-9)


# ---------------------------------------------------------- knn(k) curve


def nx_adc(g, **kw):
    return {k: float(v) for k, v in nx.average_degree_connectivity(g, **kw).items()}


def spark_adc(spark, g, **kw):
    from nx_neptune_spark import api

    return {
        k: float(v)
        for k, v in api.average_degree_connectivity(
            LinkGraph.from_networkx(spark, g), **kw
        ).items()
    }


def test_adc_undirected(spark):
    g = two_triangles_bridge()
    g.add_node("iso")  # degree-0 class: nx reports raw 0
    got, want = spark_adc(spark, g), nx_adc(g)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


@pytest.mark.parametrize(
    "src,tgt",
    [("in+out", "in+out"), ("out", "in"), ("in", "out"), ("out", "out"), ("in", "in")],
)
def test_adc_directed(spark, src, tgt):
    g = gnp_digraph()
    got = spark_adc(spark, g, source=src, target=tgt)
    want = nx_adc(g, source=src, target=tgt)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


def test_adc_undirected_rejects_source(spark):
    g = two_triangles_bridge()
    from nx_neptune_spark import api

    with pytest.raises(ValueError, match="directed"):
        api.average_degree_connectivity(LinkGraph.from_networkx(spark, g), source="in")


def test_adc_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = nx.average_degree_connectivity(g, source="out", target="in", backend="spark")
    want = nx.average_degree_connectivity(g, source="out", target="in")
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


# ------------------------------------------------------ per-node knn


def nx_and(g, **kw):
    return {str(k): float(v) for k, v in nx.average_neighbor_degree(g, **kw).items()}


def spark_and(spark, g, **kw):
    from nx_neptune_spark import api

    return {
        k: float(v)
        for k, v in api.average_neighbor_degree(
            LinkGraph.from_networkx(spark, g), **kw
        ).items()
    }


def test_and_undirected(spark):
    g = two_triangles_bridge()
    g.add_node("iso")
    got, want = spark_and(spark, g), nx_and(g)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


@pytest.mark.parametrize(
    "src,tgt",
    [("out", "out"), ("out", "in"), ("in", "out"), ("in+out", "in+out"),
     ("in+out", "in")],
)
def test_and_directed(spark, src, tgt):
    g = gnp_digraph()
    got = spark_and(spark, g, source=src, target=tgt)
    want = nx_and(g, source=src, target=tgt)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


def test_and_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = gnp_digraph()
    got = nx.average_neighbor_degree(g, source="in+out", target="out", backend="spark")
    want = nx.average_neighbor_degree(g, source="in+out", target="out")
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-12), k


# ------------------------------------------------------------ weighted forms


def weighted_digraph():
    g = nx.DiGraph()
    edges = [
        (0, 1, 2.0), (1, 2, 1.0), (2, 0, 0.5), (2, 3, 3.0),
        (3, 4, 1.5), (4, 1, 2.5), (0, 3, 1.0), (4, 0, 0.25),
    ]
    g.add_weighted_edges_from(edges)
    return g


def test_weighted_assortativity_undirected(spark):
    g = two_triangles_bridge(weighted=True)
    got = spark_dac(spark, g, weight="weight")
    want = nx.degree_assortativity_coefficient(g, weight="weight")
    assert math.isclose(got, want, abs_tol=1e-9)


def test_weighted_assortativity_directed(spark):
    g = weighted_digraph()
    got = spark_dac(spark, g, weight="weight")
    want = nx.degree_assortativity_coefficient(g, weight="weight")
    assert math.isclose(got, want, abs_tol=1e-9)


def test_weighted_adc(spark):
    g = nx.path_graph(4)
    g.edges[1, 2]["weight"] = 3
    # nx docstring example: {1: 2.0, 2: 1.75}
    got = spark_adc(spark, g, weight="weight")
    assert got == {1: 2.0, 2: 1.75}
    h = weighted_digraph()
    for src, tgt in [("in+out", "in+out"), ("in", "out"), ("out", "in")]:
        got = spark_adc(spark, h, source=src, target=tgt, weight="weight")
        want = nx_adc(h, source=src, target=tgt, weight="weight")
        assert set(got) == set(want)
        for k in want:
            assert math.isclose(got[k], want[k], abs_tol=1e-9), (src, tgt, k)


def test_weighted_neighbor_degree(spark):
    from nx_neptune_spark import api

    h = weighted_digraph()
    for src, tgt in [("in+out", "in+out"), ("out", "out"), ("in", "in")]:
        got = api.average_neighbor_degree(
            LinkGraph.from_networkx(spark, h), source=src, target=tgt,
            weight="weight",
        )
        want = nx.average_neighbor_degree(h, source=src, target=tgt, weight="weight")
        for k, v in want.items():
            assert math.isclose(got[str(k)], v, abs_tol=1e-9), (src, tgt, k)
    g = two_triangles_bridge(weighted=True)
    got = api.average_neighbor_degree(
        LinkGraph.from_networkx(spark, g), weight="weight"
    )
    want = nx.average_neighbor_degree(g, weight="weight")
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_weighted_pearson_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = weighted_digraph()
    got = nx.degree_pearson_correlation_coefficient(
        g, weight="weight", backend="spark"
    )
    # native nx pearson needs scipy (absent here); the mixing-matrix
    # form computes the identical estimator
    want = nx.degree_assortativity_coefficient(g, weight="weight")
    assert math.isclose(got, want, abs_tol=1e-6)


def test_zero_degree_endpoint_sample(spark):
    """x='in' on a pure source: nx yields a 0 sample, not nothing."""
    g = nx.DiGraph([(0, 1), (1, 2), (2, 1)])
    for x, y in [("in", "in"), ("in", "out"), ("out", "out")]:
        got = spark_dac(spark, g, x=x, y=y)
        want = nx.degree_assortativity_coefficient(g, x=x, y=y)
        if math.isnan(want):
            assert math.isnan(got), (x, y)
        else:
            assert math.isclose(got, want, abs_tol=1e-9), (x, y)
