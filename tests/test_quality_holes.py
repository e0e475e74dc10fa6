"""partition_quality and Burt constraint vs nx."""

import math

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark import api


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


# ------------------------------------------------------ partition quality


def test_partition_quality_undirected(spark):
    g = two_triangles_bridge()
    part = [{"A", "B", "C"}, {"D", "E", "F"}]
    got = api.partition_quality(lg(spark, g), part)
    want = nx.community.partition_quality(g, part)
    assert math.isclose(got[0], want[0]) and math.isclose(got[1], want[1])


def test_partition_quality_directed_three_way(spark):
    g = gnp_digraph()
    part = [
        {v for v in g if v % 3 == 0},
        {v for v in g if v % 3 == 1},
        {v for v in g if v % 3 == 2},
    ]
    got = api.partition_quality(lg(spark, g), [{str(v) for v in p} for p in part])
    want = nx.community.partition_quality(g, part)
    assert math.isclose(got[0], want[0]) and math.isclose(got[1], want[1])


def test_partition_quality_dispatch_and_validation(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    part = [{"A", "B", "C"}, {"D", "E", "F"}]
    got = nx.community.partition_quality(g, part, backend="spark")
    want = nx.community.partition_quality(g, part)
    assert math.isclose(got[0], want[0]) and math.isclose(got[1], want[1])
    with pytest.raises(nx.NetworkXError):
        nx.community.partition_quality(g, [{"A"}], backend="spark")


# ----------------------------------------------------------- constraint


@pytest.mark.parametrize("builder", [two_triangles_bridge])
def test_constraint_undirected(spark, builder):
    g = builder()
    got = api.constraint(lg(spark, g))
    want = nx.constraint(g)
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_constraint_directed_and_isolate(spark):
    g = gnp_digraph()
    g.add_node(999)
    got = api.constraint(lg(spark, g))
    want = nx.constraint(g)
    for k, v in want.items():
        if math.isnan(v):
            assert math.isnan(got[str(k)]), k
        else:
            assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_local_constraint(spark):
    g = two_triangles_bridge()
    graph = lg(spark, g)
    for u, v in [("C", "D"), ("A", "B"), ("D", "E")]:
        assert math.isclose(
            api.local_constraint(graph, u, v),
            nx.local_constraint(g, u, v),
            abs_tol=1e-9,
        ), (u, v)


def test_constraint_weighted(spark):
    g = two_triangles_bridge(weighted=True)
    got = api.constraint(lg(spark, g), weight="weight")
    want = nx.constraint(g, weight="weight")
    for k, v in want.items():
        assert math.isclose(got[str(k)], v, abs_tol=1e-9), k


def test_constraint_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    got = nx.constraint(g, backend="spark")
    want = nx.constraint(g)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9)
    assert math.isclose(
        nx.local_constraint(g, "C", "D", backend="spark"),
        nx.local_constraint(g, "C", "D"),
        abs_tol=1e-9,
    )
