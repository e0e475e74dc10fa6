"""Condensation (SCC-DAG) vs nx.condensation."""

import networkx as nx
import pytest

from fixtures_graphs import gnp_digraph, social_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.condensation import (
    condensation,
    condensation_with_members,
)


def spark_cond(spark, g):
    """(partition-of-members, edge set) under min-name component
    naming — structure only, invariant to label conventions."""
    lg = LinkGraph.from_networkx(spark, g)
    cg, mapping = condensation_with_members(lg)
    names = lg.name_of()
    members: dict = {}
    for r in mapping.collect():
        members.setdefault(r["scc_id"], set()).add(names[r["vid"]])
    rep = {sid: min(ms) for sid, ms in members.items()}
    nodes = {rep[sid]: frozenset(ms) for sid, ms in members.items()}
    edges = {(rep[r["src"]], rep[r["dst"]]) for r in cg.edges.collect()}
    return nodes, edges


def nx_cond(g):
    c = nx.condensation(g)
    rep = {i: min(str(m) for m in c.nodes[i]["members"]) for i in c.nodes}
    nodes = {
        rep[i]: frozenset(str(m) for m in c.nodes[i]["members"]) for i in c.nodes
    }
    edges = {(rep[u], rep[v]) for u, v in c.edges}
    return nodes, edges


def test_condensation_bowtie(spark):
    g = nx.DiGraph()
    core = ["c0", "c1", "c2", "c3"]
    g.add_edges_from(zip(core, core[1:] + core[:1]))
    g.add_edges_from([("in0", "c0"), ("in1", "in0"), ("c2", "out0"),
                      ("out0", "out1"), ("in1", "t0")])
    g.add_node("iso")
    assert spark_cond(spark, g) == nx_cond(g)
    # the condensation is a DAG
    _, edges = spark_cond(spark, g)
    dag = nx.DiGraph(edges)
    assert nx.is_directed_acyclic_graph(dag)


def test_condensation_parallel_cross_edges_dedupe(spark):
    """Many original edges between the same two SCCs collapse to ONE
    condensation edge."""
    g = nx.DiGraph()
    g.add_edges_from([("a0", "a1"), ("a1", "a0"), ("b0", "b1"), ("b1", "b0")])
    g.add_edges_from([("a0", "b0"), ("a0", "b1"), ("a1", "b0"), ("a1", "b1")])
    nodes, edges = spark_cond(spark, g)
    assert nodes == {"a0": frozenset({"a0", "a1"}), "b0": frozenset({"b0", "b1"})}
    assert edges == {("a0", "b0")}


@pytest.mark.parametrize("gf", [social_digraph, gnp_digraph])
def test_condensation_fixture_digraphs(spark, gf):
    g = gf()
    assert spark_cond(spark, g) == nx_cond(g)


def test_condensation_reuses_labels(spark):
    """Passing precomputed scc labels skips the decomposition."""
    from nx_neptune_spark.operators.scc import strongly_connected_components

    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    labels = strongly_connected_components(lg)
    cg = condensation(lg, scc_labels=labels)
    want_edges = nx_cond(g)[1]
    names = lg.name_of()
    rep_of = {r["vid"]: r["scc_id"] for r in labels.collect()}
    min_name = {}
    for vid, sid in rep_of.items():
        n = names[vid]
        min_name[sid] = min(min_name.get(sid, n), n)
    got = {(min_name[r["src"]], min_name[r["dst"]]) for r in cg.edges.collect()}
    assert got == want_edges


def test_condensation_dispatch(spark):
    import nx_neptune_spark

    nx_neptune_spark.register_nx_backend()
    g = nx.DiGraph([(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)])
    got = nx.condensation(g, backend="spark")
    want = nx.condensation(g)
    # compare structurally (component labels are order-conventions)
    def norm(c):
        rep = {i: min(str(m) for m in c.nodes[i]["members"]) for i in c.nodes}
        return (
            {rep[i]: frozenset(str(m) for m in c.nodes[i]["members"])
             for i in c.nodes},
            {(rep[u], rep[v]) for u, v in c.edges},
        )
    assert norm(got) == norm(want)
    assert set(got.graph["mapping"]) == set(g.nodes())
    # scc= passthrough honors the caller's partition verbatim
    parts = [{0, 1}, {2, 3}, {4}]
    got2 = nx.condensation(g, scc=parts, backend="spark")
    want2 = nx.condensation(g, scc=parts)
    assert norm(got2) == norm(want2)
