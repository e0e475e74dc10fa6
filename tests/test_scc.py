"""Strongly connected components vs nx.strongly_connected_components."""

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.scc import (
    number_strongly_connected_components,
    strongly_connected_components,
)


def spark_sccs(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    comps: dict = {}
    for r in strongly_connected_components(lg, **kw).collect():
        comps.setdefault(r["scc_id"], set()).add(names[r["vid"]])
    return {frozenset(c) for c in comps.values()}


def nx_sccs(g):
    return {
        frozenset(str(n) for n in c) for c in nx.strongly_connected_components(g)
    }


def test_scc_bowtie(spark):
    """Classic bowtie: IN -> giant SCC -> OUT plus tendrils."""
    g = nx.DiGraph()
    core = ["c0", "c1", "c2", "c3"]
    g.add_edges_from(zip(core, core[1:] + core[:1]))  # 4-cycle
    g.add_edges_from([("in0", "c0"), ("in1", "in0"), ("c2", "out0"),
                      ("out0", "out1"), ("in1", "t0"), ("t1", "out1")])
    g.add_node("iso")
    assert spark_sccs(spark, g) == nx_sccs(g)


def test_scc_chain_of_cycles(spark):
    """SCC-DAG chain exercising multiple FW-BW rounds: cycles linked
    head-to-tail with labels INCREASING along the chain (the hard
    direction for min-label pivots)."""
    g = nx.DiGraph()
    for b in range(6):
        ns = [f"v{b}_{i}" for i in range(3)]
        g.add_edges_from(zip(ns, ns[1:] + ns[:1]))
        if b:
            g.add_edge(f"v{b-1}_0", f"v{b}_0")
    stats: dict = {}
    got = spark_sccs(spark, g, stats=stats)
    assert got == nx_sccs(g)


@pytest.mark.parametrize("gf", [social_digraph, gnp_digraph])
def test_scc_fixture_digraphs(spark, gf):
    g = gf()
    assert spark_sccs(spark, g) == nx_sccs(g)


def test_scc_random_digraphs(spark):
    for seed, p in [(7, 0.05), (11, 0.12)]:
        g = nx.gnp_random_graph(40, p, seed=seed, directed=True)
        assert spark_sccs(spark, g) == nx_sccs(g), (seed, p)


def test_number_scc(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    assert number_strongly_connected_components(lg) == len(nx_sccs(g))


def test_scc_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = social_digraph()
    got = {
        frozenset(c)
        for c in nx.strongly_connected_components(g, backend="spark")
    }
    want = {frozenset(c) for c in nx.strongly_connected_components(g)}
    assert got == want
    assert nx.number_strongly_connected_components(
        g, backend="spark"
    ) == len(want)
