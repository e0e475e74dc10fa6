"""The reference's oracle graph fixtures (FIXTURES.md §3), as NetworkX
builders. Lifted semantically from /root/reference/integ_test/
graph_operations/* (we rebuild them, we do not import reference code).
"""

import networkx as nx


def chain_digraph() -> nx.DiGraph:
    """5-node directed chain + back-edge + isolated node X.
    Ref: integ_test/graph_operations/test_algo_page_rank.py:26-37."""
    g = nx.DiGraph()
    g.add_nodes_from(["A", "B", "C", "D", "E", "X"])
    g.add_edge("A", "B")
    g.add_edge("B", "C")
    g.add_edge("C", "D")
    g.add_edge("D", "E")
    g.add_edge("E", "C", weight=1)
    return g


def two_triangles_bridge(weighted: bool = False) -> nx.Graph:
    """Two 3-cliques joined by a bridge.
    Ref: integ_test/graph_operations/test_algo_lpa.py:26-40 (weighted:
    test_algo_louvain.py:26-39, 1.0 intra / 0.5 bridge)."""
    g = nx.Graph()
    intra = [("A", "B"), ("B", "C"), ("C", "A"), ("D", "E"), ("E", "F"), ("F", "D")]
    for u, v in intra:
        g.add_edge(u, v, weight=1.0) if weighted else g.add_edge(u, v)
    g.add_edge("C", "D", weight=0.5) if weighted else g.add_edge("C", "D")
    return g


def airport_cycle() -> nx.Graph:
    """5-airport cycle + shortcut.
    Ref: integ_test/graph_operations/test_algo_closeness.py:26-38."""
    g = nx.Graph()
    for u, v in [
        ("YVR", "LAX"),
        ("LAX", "JFK"),
        ("JFK", "ORD"),
        ("ORD", "DFW"),
        ("DFW", "YVR"),
        ("LAX", "ORD"),
    ]:
        g.add_edge(u, v)
    return g


def social_digraph() -> nx.DiGraph:
    """Alice->Bob, Alice->Carl. Ref: integ_test/.../test_algo_bfs.py:20-40."""
    g = nx.DiGraph()
    g.add_edge("Alice", "Bob")
    g.add_edge("Alice", "Carl")
    return g


def gnp_digraph() -> nx.DiGraph:
    return nx.gnp_random_graph(200, 0.05, seed=42, directed=True)


def barabasi() -> nx.Graph:
    return nx.barabasi_albert_graph(1000, 3, seed=42)


def single_node() -> nx.Graph:
    g = nx.Graph()
    g.add_node("A")
    return g
