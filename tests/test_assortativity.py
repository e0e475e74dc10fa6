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
