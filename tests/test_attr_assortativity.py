"""Attribute / numeric assortativity vs NetworkX."""

import math

import networkx as nx

from fixtures_graphs import barabasi, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.assortativity import (
    attribute_assortativity_coefficient,
    numeric_assortativity_coefficient,
)


def _with_attr(g, fn, key):
    for n in g.nodes:
        g.nodes[n][key] = fn(n)
    return g


def _spark_attr(spark, g, values, numeric=False):
    lg = LinkGraph.from_networkx(spark, g)
    vid_of = {v: k for k, v in lg.name_of().items()}
    typ = "double" if numeric else "string"
    attrs = spark.createDataFrame(
        [(vid_of[str(n)], float(x) if numeric else str(x)) for n, x in values.items()],
        f"vid long, att {typ}",
    )
    fn = (
        numeric_assortativity_coefficient
        if numeric
        else attribute_assortativity_coefficient
    )
    return fn(lg, attrs)


def test_attribute_assortativity_undirected(spark):
    g = _with_attr(barabasi(), lambda n: ["red", "blue", "green"][n % 3], "color")
    want = nx.attribute_assortativity_coefficient(g, "color")
    got = _spark_attr(spark, g, {n: g.nodes[n]["color"] for n in g.nodes})
    assert math.isclose(got, want, rel_tol=1e-9)


def test_attribute_assortativity_digraph(spark):
    g = _with_attr(social_digraph(), lambda n: str(n)[:1], "grp")
    want = nx.attribute_assortativity_coefficient(g, "grp")
    got = _spark_attr(spark, g, {n: g.nodes[n]["grp"] for n in g.nodes})
    assert math.isclose(got, want, rel_tol=1e-9)


def test_attribute_assortativity_perfect(spark):
    g = nx.Graph([(0, 1), (2, 3)])
    vals = {0: "a", 1: "a", 2: "b", 3: "b"}
    got = _spark_attr(spark, g, vals)
    assert math.isclose(got, 1.0)


def test_numeric_assortativity(spark):
    g = _with_attr(barabasi(), lambda n: (n * 3) % 7, "size")
    want = nx.numeric_assortativity_coefficient(g, "size")
    got = _spark_attr(
        spark, g, {n: g.nodes[n]["size"] for n in g.nodes}, numeric=True
    )
    assert math.isclose(got, want, rel_tol=1e-9)


def test_numeric_assortativity_digraph(spark):
    # 2 directed edges with a constant x-margin: both engines nan
    g = _with_attr(social_digraph(), lambda n: len(str(n)), "sz")
    want = nx.numeric_assortativity_coefficient(g, "sz")
    got = _spark_attr(
        spark, g, {n: g.nodes[n]["sz"] for n in g.nodes}, numeric=True
    )
    assert (math.isnan(got) and math.isnan(want)) or math.isclose(
        got, want, rel_tol=1e-9
    )


def test_numeric_assortativity_digraph_nontrivial(spark):
    g = nx.DiGraph(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 3), (3, 1)]
    )
    g = _with_attr(g, lambda n: (n * 2) % 3 + 1, "sz")
    want = nx.numeric_assortativity_coefficient(g, "sz")
    got = _spark_attr(
        spark, g, {n: g.nodes[n]["sz"] for n in g.nodes}, numeric=True
    )
    assert math.isclose(got, want, rel_tol=1e-9)
