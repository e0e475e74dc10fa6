"""Distance measures vs nx (eccentricity/diameter/radius/center/
periphery/barycenter/wiener_index)."""

import math

import networkx as nx
import pytest

from fixtures_graphs import airport_cycle, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.distance import (
    barycenter,
    center,
    diameter,
    eccentricity,
    periphery,
    radius,
    wiener_index,
)


def lg(spark, g):
    return LinkGraph.from_networkx(spark, g)


def ecc_dict(spark, g, sources=None):
    graph = lg(spark, g)
    name_of = graph.name_of()
    vids = None
    if sources is not None:
        vid_of = graph.vid_of()
        vids = [vid_of[str(s)] for s in sources]
    return {
        name_of[r["vid"]]: r["ecc"]
        for r in eccentricity(graph, sources=vids).collect()
    }


@pytest.mark.parametrize("builder", [two_triangles_bridge, airport_cycle])
def test_eccentricity_and_scalars(spark, builder):
    g = builder()
    got = ecc_dict(spark, g)
    want = {str(k): v for k, v in nx.eccentricity(g).items()}
    assert got == want
    graph = lg(spark, g)
    assert diameter(graph) == nx.diameter(g)
    assert radius(graph) == nx.radius(g)
    name_of = graph.name_of()
    assert sorted(name_of[r["vid"]] for r in center(graph).collect()) == sorted(
        str(v) for v in nx.center(g)
    )
    assert sorted(
        name_of[r["vid"]] for r in periphery(graph).collect()
    ) == sorted(str(v) for v in nx.periphery(g))
    assert sorted(
        name_of[r["vid"]] for r in barycenter(graph).collect()
    ) == sorted(str(v) for v in nx.barycenter(g))
    assert math.isclose(wiener_index(graph), nx.wiener_index(g), abs_tol=1e-9)


def test_eccentricity_subset(spark):
    g = nx.Graph([(1, 2), (1, 3), (1, 4), (3, 4), (3, 5), (4, 5)])
    got = ecc_dict(spark, g, sources=[1, 5])
    assert got == {"1": 2, "5": 3}


def test_directed_strongly_connected(spark):
    g = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    assert diameter(lg(spark, g)) == nx.diameter(g) == 2
    assert math.isclose(wiener_index(lg(spark, g)), nx.wiener_index(g))


def test_disconnected_raises_and_inf(spark):
    g = nx.Graph([(0, 1), (2, 3)])
    with pytest.raises(ValueError):
        diameter(lg(spark, g))
    with pytest.raises(ValueError):
        barycenter(lg(spark, g)).collect()
    assert wiener_index(lg(spark, g)) == float("inf")
    h = nx.DiGraph([(0, 1)])  # weakly but not strongly connected
    with pytest.raises(ValueError):
        eccentricity(lg(spark, h)).collect()
    assert wiener_index(lg(spark, h)) == float("inf") == nx.wiener_index(h)


def test_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = airport_cycle()
    assert nx.diameter(g, backend="spark") == nx.diameter(g)
    assert nx.radius(g, backend="spark") == nx.radius(g)
    assert sorted(nx.center(g, backend="spark")) == sorted(nx.center(g))
    assert sorted(nx.periphery(g, backend="spark")) == sorted(nx.periphery(g))
    assert sorted(nx.barycenter(g, backend="spark")) == sorted(nx.barycenter(g))
    assert math.isclose(
        nx.wiener_index(g, backend="spark"), nx.wiener_index(g), abs_tol=1e-9
    )
    got = nx.eccentricity(g, v="LAX", backend="spark")
    assert got == nx.eccentricity(g, v="LAX")
    h = nx.Graph([(0, 1), (2, 3)])
    with pytest.raises(nx.NetworkXError):
        nx.diameter(h, backend="spark")

# ---------------------------------------------------------- reaching


def test_reaching_centrality(spark):
    from nx_neptune_spark.operators.distance import (
        global_reaching_centrality,
        local_reaching_centrality,
    )

    g = nx.DiGraph()
    g.add_edge(1, 2)
    g.add_edge(1, 3)
    graph = lg(spark, g)
    assert math.isclose(global_reaching_centrality(graph), 1.0)
    g.add_edge(3, 2)
    graph = lg(spark, g)
    assert math.isclose(
        global_reaching_centrality(graph), nx.global_reaching_centrality(g)
    )
    for v in g:
        assert math.isclose(
            local_reaching_centrality(graph, graph.vid_of()[str(v)]),
            nx.local_reaching_centrality(g, v),
        ), v


def test_reaching_undirected_and_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    assert math.isclose(
        nx.global_reaching_centrality(g, backend="spark"),
        nx.global_reaching_centrality(g),
        abs_tol=1e-9,
    )
    assert math.isclose(
        nx.local_reaching_centrality(g, "C", backend="spark"),
        nx.local_reaching_centrality(g, "C"),
        abs_tol=1e-9,
    )
    h = nx.Graph()
    h.add_nodes_from([1, 2])
    with pytest.raises(nx.NetworkXError):
        nx.global_reaching_centrality(h, backend="spark")


def test_average_shortest_path_length(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = two_triangles_bridge()
    got = nx.average_shortest_path_length(g, backend="spark")
    want = nx.average_shortest_path_length(g)
    assert math.isclose(got, want, abs_tol=1e-12)
    # directed strongly connected: 4-cycle
    d = nx.DiGraph([(0, 1), (1, 2), (2, 3), (3, 0)])
    assert math.isclose(
        nx.average_shortest_path_length(d, backend="spark"),
        nx.average_shortest_path_length(d),
        abs_tol=1e-12,
    )
    # error surface
    with pytest.raises(nx.NetworkXPointlessConcept):
        nx.average_shortest_path_length(nx.Graph(), backend="spark")
    assert nx.average_shortest_path_length(
        nx.Graph([("A", "A")]), backend="spark"
    ) == 0.0
    h = nx.Graph()
    h.add_nodes_from([1, 2])
    with pytest.raises(nx.NetworkXError):
        nx.average_shortest_path_length(h, backend="spark")
    d2 = nx.DiGraph([(0, 1)])
    with pytest.raises(nx.NetworkXError):
        nx.average_shortest_path_length(d2, backend="spark")
