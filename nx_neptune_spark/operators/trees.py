"""Tree / forest / branching / arborescence recognition (NetworkX
parity).

The degenerate-structure checks a crawl pipeline runs on extracted
sub-graphs (sitemap trees, redirect chains, category hierarchies)
before applying tree-only algorithms. Matches
networkx/algorithms/tree/recognition.py exactly: a tree is a
(weakly) connected graph with n−1 edges; a forest has n_c−1 edges in
every component; branchings/arborescences additionally require max
in-degree ≤ 1 (directed only).

Plan: one connected-components run (star contraction — already the
engine's cheapest whole-graph primitive) + one edges⨝labels join +
two component-keyed aggregates; the in-degree bound is one
map-side-combined max. No per-component driver loops — the "all
components are trees" check is a single anti-join emptiness test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import LinkGraph
from .components import connected_components


def _component_tree_check(graph: LinkGraph) -> tuple[bool, int]:
    """(every_component_is_a_tree, n_components) over the undirected /
    weak view, one pass."""
    comp = connected_components(graph).persist()
    edges = (
        graph.edges.select("src", "dst").distinct()
        if graph.directed
        else graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).distinct()
    )
    e_per = (
        edges.join(
            comp.select(F.col("vid").alias("src"), "component"), "src"
        )
        .groupBy("component")
        .agg(F.count("*").alias("m"))
    )
    n_per = comp.groupBy("component").agg(F.count("*").alias("n"))
    joined = n_per.join(e_per, "component", "left").select(
        "component",
        (F.coalesce("m", F.lit(0)) == F.col("n") - 1).alias("ok"),
    )
    bad = joined.where(~F.col("ok"))
    all_trees = bad.isEmpty()
    n_components = n_per.count()
    comp.unpersist(blocking=False)
    return all_trees, n_components


def is_forest(graph: LinkGraph) -> bool:
    """``nx.is_forest`` parity (raises on the null graph like nx)."""
    if graph.num_vertices() == 0:
        raise ValueError("G has no nodes.")
    ok, _ = _component_tree_check(graph)
    return ok


def is_tree(graph: LinkGraph) -> bool:
    """``nx.is_tree`` parity: (weakly) connected with n−1 edges."""
    if graph.num_vertices() == 0:
        raise ValueError("G has no nodes.")
    ok, n_comp = _component_tree_check(graph)
    return ok and n_comp == 1


def _max_in_degree(graph: LinkGraph) -> int:
    row = (
        graph.edges.select("src", "dst")
        .distinct()
        .groupBy("dst")
        .agg(F.count("*").alias("d"))
        .agg(F.coalesce(F.max("d"), F.lit(0)).alias("mx"))
        .first()
    )
    return int(row["mx"])


def is_branching(graph: LinkGraph) -> bool:
    """``nx.is_branching`` parity (directed forest, in-degree ≤ 1)."""
    if not graph.directed:
        raise ValueError("is_branching is defined for directed graphs")
    return is_forest(graph) and _max_in_degree(graph) <= 1


def is_arborescence(graph: LinkGraph) -> bool:
    """``nx.is_arborescence`` parity (directed tree, in-degree ≤ 1)."""
    if not graph.directed:
        raise ValueError("is_arborescence is defined for directed graphs")
    return is_tree(graph) and _max_in_degree(graph) <= 1
