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
