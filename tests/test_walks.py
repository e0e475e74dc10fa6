"""Random-walk corpus: exact differential vs a pure-Python replay of
the pinned hash rule, edge-validity, directedness, and sentence shape."""

import hashlib

import networkx as nx

from fixtures_graphs import gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.walks import random_walks, walk_sentences


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def replay(g: nx.Graph, vid_of, length, reps=1):
    """Driver-side replay of the operator's hash rule on the nx graph."""
    out = {}
    directed = g.is_directed()
    for node in g.nodes:
        s = vid_of[str(node)]
        for rep in range(reps):
            cur = node
            walk = [s]
            for t in range(length):
                nbrs = list(g.successors(cur)) if directed else list(g.neighbors(cur))
                if not nbrs:
                    break
                nxt = min(
                    nbrs,
                    key=lambda d: (
                        h60(f"walk:{s}:{rep}:{t}:{vid_of[str(d)]}"),
                        vid_of[str(d)],
                    ),
                )
                walk.append(vid_of[str(nxt)])
                cur = nxt
            out[(s, rep)] = walk
    return out


def spark_walks(spark, g, length, reps=1):
    lg = LinkGraph.from_networkx(spark, g)
    rows = random_walks(lg, length=length, walks_per_node=reps).collect()
    out = {}
    for r in rows:
        out.setdefault((r["start"], r["rep"]), {})[r["step"]] = r["vid"]
    return {
        k: [v[i] for i in range(len(v))] for k, v in out.items()
    }, lg


def test_digraph_exact_replay(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    got, lg = spark_walks(spark, g, length=6)
    want = replay(g, lg.vid_of(), length=6)
    assert got == want


def test_undirected_and_reps(spark):
    g = two_triangles_bridge()
    got, lg = spark_walks(spark, g, length=5, reps=3)
    want = replay(g, lg.vid_of(), length=5, reps=3)
    assert got == want
    # every consecutive pair must be an edge of the graph
    name_of = lg.name_of()
    for (s, rep), walk in got.items():
        for a, b in zip(walk, walk[1:]):
            assert g.has_edge(name_of[a], name_of[b])


def test_dangling_terminates(spark):
    g = nx.DiGraph([("A", "B"), ("B", "C")])  # C dangles
    got, lg = spark_walks(spark, g, length=10)
    vid_of = lg.vid_of()
    assert got[(vid_of["A"], 0)] == [vid_of["A"], vid_of["B"], vid_of["C"]]
    assert got[(vid_of["C"], 0)] == [vid_of["C"]]


def test_sentences_shape(spark):
    g = nx.DiGraph([("A", "B"), ("B", "A")])
    lg = LinkGraph.from_networkx(spark, g)
    w = random_walks(lg, length=4)
    rows = walk_sentences(w).collect()
    assert {len(r["sentence"]) for r in rows} == {5}
    walks = {r["start"]: r["sentence"] for r in rows}
    for s, sent in walks.items():
        assert sent[0] == s


# ---------------------------------------------------------------- node2vec


def n2v_replay(g: nx.Graph, vid_of, length, p, q, reps=1):
    """Exact replay of the node2vec exponential-race rule: key =
    -ln((h+1)/2^60)/alpha, argmin by (key, dst-vid)."""
    import math

    out = {}
    directed = g.is_directed()

    def nbrs(v):
        return list(g.successors(v)) if directed else list(g.neighbors(v))

    for node in g.nodes:
        s = vid_of[str(node)]
        for rep in range(reps):
            prev, cur = None, node
            walk = [s]
            for t in range(length):
                cands = nbrs(cur)
                if not cands:
                    break
                best = None
                for d in cands:
                    dv = vid_of[str(d)]
                    if prev is None:
                        alpha = 1.0
                    elif d == prev:
                        alpha = 1.0 / p
                    elif g.has_edge(prev, d):
                        alpha = 1.0
                    else:
                        alpha = 1.0 / q
                    u = (h60(f"n2v:{s}:{rep}:{t}:{dv}") + 1) / float(1 << 60)
                    key = (-math.log(u) / alpha, dv)
                    if best is None or key < best[0]:
                        best = (key, d)
                prev, cur = cur, best[1]
                walk.append(vid_of[str(cur)])
            out[(s, rep)] = walk
    return out


def spark_n2v(spark, g, length, p, q, reps=1):
    from nx_neptune_spark.operators.walks import node2vec_walks

    lg = LinkGraph.from_networkx(spark, g)
    rows = node2vec_walks(
        lg, length=length, p=p, q=q, walks_per_node=reps
    ).collect()
    out = {}
    for r in rows:
        out.setdefault((r["start"], r["rep"]), {})[r["step"]] = r["vid"]
    return {k: [v[i] for i in range(len(v))] for k, v in out.items()}, lg


def test_node2vec_exact_replay_digraph(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    got, lg = spark_n2v(spark, g, length=6, p=4.0, q=0.25)
    want = n2v_replay(g, lg.vid_of(), length=6, p=4.0, q=0.25)
    assert got == want


def test_node2vec_exact_replay_undirected_multiwalk(spark):
    g = two_triangles_bridge()
    got, lg = spark_n2v(spark, g, length=5, p=0.5, q=2.0, reps=3)
    want = n2v_replay(g, lg.vid_of(), length=5, p=0.5, q=2.0, reps=3)
    assert got == want


def test_node2vec_bias_direction(spark):
    # On an undirected cycle every non-first hop is prev (alpha=1/p)
    # or the far neighbor (alpha=1/q, distance 2): with p huge and q
    # tiny the walk must never immediately backtrack.
    n = 12
    g = nx.cycle_graph(n)
    g = nx.relabel_nodes(g, lambda i: f"{i:02d}", copy=True)
    got, lg = spark_n2v(spark, g, length=8, p=1e9, q=1e-9)
    for (s, rep), walk in got.items():
        for a, b in zip(walk, walk[2:]):
            assert a != b, f"immediate backtrack in walk {s}: {walk}"


def test_node2vec_walks_follow_edges(spark):
    g = nx.relabel_nodes(gnp_digraph(), lambda i: f"{i:04d}", copy=True)
    got, lg = spark_n2v(spark, g, length=4, p=2.0, q=0.5)
    name_of = lg.name_of()
    for (s, rep), walk in got.items():
        for a, b in zip(walk, walk[1:]):
            assert g.has_edge(name_of[a], name_of[b])
