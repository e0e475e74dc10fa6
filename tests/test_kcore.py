"""Core decomposition (h-index iteration) vs nx.core_number, and
k_core filtering vs nx.k_core."""

import networkx as nx
import pytest

from fixtures_graphs import barabasi, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.kcore import core_number, k_core


def run_spark(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    return {names[r["vid"]]: r["core"] for r in core_number(lg, **kw).collect()}


def test_core_number_powerlaw(spark):
    g = barabasi()
    stats: dict = {}
    got = run_spark(spark, g, stats=stats)
    assert stats["converged"]
    assert got == {str(k): v for k, v in nx.core_number(g).items()}


def test_core_number_digraph_degree_semantics(spark):
    """NX DiGraph coreness peels on in+out degree (reciprocal edges
    count twice); the neighbor multiset keeps that multiplicity."""
    g = gnp_digraph()
    got = run_spark(spark, g)
    assert got == {str(k): v for k, v in nx.core_number(g).items()}


def test_core_number_bridge_and_isolate(spark):
    g = two_triangles_bridge()
    g.add_node("Z")  # isolate: core 0
    got = run_spark(spark, g)
    want = {str(k): v for k, v in nx.core_number(g).items()}
    assert got == want
    assert got["Z"] == 0


def test_core_number_rejects_self_loops(spark):
    g = nx.Graph([(0, 1), (1, 1)])
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(ValueError, match="self-loop"):
        core_number(lg)
    # strip-and-run path matches nx on the stripped graph
    names = lg.name_of()
    got = {
        names[r["vid"]]: r["core"]
        for r in core_number(lg, drop_self_loops=True).collect()
    }
    g.remove_edge(1, 1)
    assert got == {str(k): v for k, v in nx.core_number(g).items()}


def test_k_core_filters_and_main_core(spark):
    g = barabasi()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    cores = core_number(lg)
    got3 = {names[r["vid"]] for r in k_core(lg, k=3, core_numbers=cores).collect()}
    assert got3 == {str(n) for n in nx.k_core(g, k=3).nodes}
    got_main = {names[r["vid"]] for r in k_core(lg, core_numbers=cores).collect()}
    assert got_main == {str(n) for n in nx.k_core(g).nodes}


def test_core_number_hub_skew(spark):
    """One vertex carrying ~10% of all edges (the 100x-scale skew case
    the grouped-count h-index bounds): per-vid window rows must be
    distinct neighbor core VALUES, not degree, so the hub is exact."""
    g = nx.Graph()
    # hub 0 wired to 60 spokes; a 3-core clique block among 10..21;
    # chains hanging off spokes so core values are diverse
    for i in range(1, 61):
        g.add_edge(0, i)
    for a in range(10, 22):
        for b in range(a + 1, 22):
            g.add_edge(a, b)
    for i in range(30, 40):
        g.add_edge(i, i + 100)
        g.add_edge(i + 100, i + 200)
    stats: dict = {}
    got = run_spark(spark, g, stats=stats)
    assert stats["converged"]
    assert got == {str(k): v for k, v in nx.core_number(g).items()}


def test_core_number_resume_from_checkpoint(spark, tmp_path):
    """Kill after round 0, resume, and land on the same fixpoint."""
    from nx_neptune_spark.plans.checkpoint import CheckpointManager

    g = barabasi()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    cp = CheckpointManager(spark, str(tmp_path), algorithm="core_number")
    core_number(lg, max_iterations=1, checkpoint=cp)  # partial run
    cp2 = CheckpointManager(spark, str(tmp_path), algorithm="core_number")
    stats: dict = {}
    rows = core_number(lg, checkpoint=cp2, stats=stats).collect()
    got = {names[r["vid"]]: r["core"] for r in rows}
    assert stats["converged"]
    assert got == {str(k): v for k, v in nx.core_number(g).items()}


def test_k_shell_crust_corona_dispatch(spark):
    import networkx as nx
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.barbell_graph(5, 3)  # two 5-cliques (core 4) + a path (core 1)
    for k in [None, 1, 2, 4]:
        got = nx.k_shell(g, k=k, backend="spark")
        want = nx.k_shell(g, k=k)
        assert set(got.nodes) == set(want.nodes) and set(got.edges) == set(
            want.edges
        ), ("shell", k)
        got = nx.k_crust(g, k=k, backend="spark")
        want = nx.k_crust(g, k=k)
        assert set(got.nodes) == set(want.nodes) and set(got.edges) == set(
            want.edges
        ), ("crust", k)
    for k in [1, 2, 4]:
        got = nx.k_corona(g, k, backend="spark")
        want = nx.k_corona(g, k)
        assert set(got.nodes) == set(want.nodes) and set(got.edges) == set(
            want.edges
        ), ("corona", k)
