"""Bridges / 2-edge-connected components / local bridges vs NetworkX."""

import math

import networkx as nx

from fixtures_graphs import barabasi, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.bridges import (
    bridges_and_components,
    has_bridges,
    local_bridges,
)


def _spark_bridges(spark, g):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    br, tecc = bridges_and_components(lg)
    bset = {frozenset((names[r["u"]], names[r["v"]])) for r in br.collect()}
    comp = {}
    for r in tecc.collect():
        comp.setdefault(r["component"], set()).add(names[r["vid"]])
    return bset, {frozenset(s) for s in comp.values()}


def _nx_bridges(g):
    gs = nx.relabel_nodes(g, str)
    bset = {frozenset(e) for e in nx.bridges(gs)}
    tecc = {frozenset(c) for c in nx.k_edge_components(gs, k=2)}
    return bset, tecc


def test_bridges_two_triangles(spark):
    g = two_triangles_bridge()
    got_b, got_c = _spark_bridges(spark, g)
    exp_b, exp_c = _nx_bridges(g)
    assert got_b == exp_b == {frozenset(("C", "D"))}
    assert got_c == exp_c


def test_bridges_barabasi_with_pendants(spark):
    g = barabasi()
    # hang a pendant path and a star off the dense core: all bridges
    nodes = sorted(g.nodes)
    g.add_edge(nodes[0], 900)
    g.add_edge(900, 901)
    g.add_edge(901, 902)
    g.add_edge(nodes[3], 910)
    g.add_edge(910, 911)
    g.add_edge(910, 912)
    got_b, got_c = _spark_bridges(spark, g)
    exp_b, exp_c = _nx_bridges(g)
    assert got_b == exp_b
    assert got_c == exp_c


def test_bridges_disconnected_multi_component(spark):
    g = nx.disjoint_union(nx.cycle_graph(6), nx.path_graph(5))
    g = nx.disjoint_union(g, nx.barbell_graph(4, 2))
    g.add_nodes_from([500, 501])  # isolates: singleton 2ecc classes
    got_b, got_c = _spark_bridges(spark, g)
    exp_b, exp_c = _nx_bridges(g)
    assert got_b == exp_b
    assert got_c == exp_c


def test_bridges_bridgeless_cycle(spark):
    g = nx.cycle_graph(8)
    lg = LinkGraph.from_networkx(spark, g)
    assert not has_bridges(lg)
    got_b, got_c = _spark_bridges(spark, g)
    assert got_b == set()
    assert got_c == {frozenset(str(i) for i in range(8))}


def test_bridges_directed_uses_undirected_view(spark):
    g = nx.DiGraph([("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")])
    got_b, got_c = _spark_bridges(spark, g)
    exp_b, exp_c = _nx_bridges(g.to_undirected())
    assert got_b == exp_b == {frozenset(("C", "D"))}
    assert got_c == exp_c


def _spark_local(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = local_bridges(lg, **kw).collect()
    out = {}
    for r in rows:
        key = frozenset((names[r["u"]], names[r["v"]]))
        if "span" in r.__fields__:
            out[key] = math.inf if r["span"] is None else r["span"]
        else:
            out[key] = None
    return out


def test_local_bridges_span_parity(spark):
    g = two_triangles_bridge()
    # nx: the C-D bridge is the only local bridge; span = inf (no
    # alternate path)
    exp = {
        frozenset((str(u), str(v))): s
        for u, v, s in nx.local_bridges(nx.relabel_nodes(g, str))
    }
    got = _spark_local(spark, g)
    assert got == exp


def test_local_bridges_finite_spans(spark):
    g = nx.cycle_graph(7)  # every edge is a local bridge with span 6
    exp = {
        frozenset((str(u), str(v))): s
        for u, v, s in nx.local_bridges(nx.relabel_nodes(g, str))
    }
    got = _spark_local(spark, g)
    assert got == exp


def test_local_bridges_without_span(spark):
    g = barabasi()
    g.add_edge(0, 990)  # pendant: a local bridge for sure
    exp = {
        frozenset((str(u), str(v)))
        for u, v in nx.local_bridges(nx.relabel_nodes(g, str), with_span=False)
    }
    got = set(_spark_local(spark, g, with_span=False))
    assert got == exp
