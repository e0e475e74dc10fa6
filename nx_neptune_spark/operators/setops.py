"""Graph set operations: compose / intersection / difference /
symmetric difference (``nx.compose``, ``nx.intersection``,
``nx.difference``, ``nx.symmetric_difference``).

The web-scale use case is **crawl-snapshot diffing**: two link graphs
extracted from consecutive Common-Crawl-style snapshots share url
names but not vertex ids, so every operation here aligns on the
VERTEX NAME (url), never the vid — two independently-built graphs
have independent dense-id dictionaries. All four operations are
single-join / single-union DataFrame programs:

* edge sets are compared as ``(src_name, dst_name)`` pairs
  (canonicalized ``least/greatest`` for undirected graphs, so the
  stored orientation of an undirected edge never affects membership),
* node-set math is hash joins on the distinct name dictionaries —
  orders of magnitude smaller than the edge tables at web scale,
* results are rebuilt with a fresh dense-id dictionary
  (``LinkGraph.from_vertex_names``-style), so downstream operators
  see the same contract every engine constructor provides.

NetworkX parity notes (networkx/algorithms/operators/binary.py):
``difference``/``symmetric_difference`` REQUIRE equal node sets
(raise ``ValueError`` here, mapped to ``nx.NetworkXError`` by the
dispatch layer) and keep ALL nodes of G; ``intersection`` allows
different node sets and keeps the common nodes; ``compose`` keeps the
union of nodes and edges. Mixed directedness is rejected (nx mixes
types silently with surprising semantics; the engine refuses).

Reference scope: the reference (awslabs/nx-neptune) dispatches no
set operations; these extend the same NetworkX-backend surface its
``interface.py`` establishes, applied to the snapshot-diff need of
the north-rule corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph, assign_dense_ids


def _named_edges(g: LinkGraph) -> DataFrame:
    """Distinct (src_name, dst_name) pairs; canonical (least, greatest)
    orientation for undirected graphs."""
    v = g.vertices
    e = (
        g.edges.select("src", "dst")
        .join(v.select(F.col("vid").alias("src"), F.col("name").alias("src_name")), "src")
        .join(v.select(F.col("vid").alias("dst"), F.col("name").alias("dst_name")), "dst")
        .select("src_name", "dst_name")
    )
    if not g.directed:
        e = e.select(
            F.least("src_name", "dst_name").alias("src_name"),
            F.greatest("src_name", "dst_name").alias("dst_name"),
        )
    return e.distinct()


def _names(g: LinkGraph) -> DataFrame:
    return g.vertices.select("name").distinct()


def _check_same_kind(g1: LinkGraph, g2: LinkGraph) -> None:
    if g1.directed != g2.directed:
        raise ValueError("graphs must both be directed or both undirected")


def _check_equal_nodes(g1: LinkGraph, g2: LinkGraph) -> None:
    """nx.difference/symmetric_difference contract: node sets equal.
    One full-outer anti count — a join on the (small) name
    dictionaries, not the edge tables."""
    n1, n2 = _names(g1), _names(g2)
    mismatch = (
        n1.withColumn("a", F.lit(1))
        .join(n2.withColumn("b", F.lit(1)), "name", "full_outer")
        .where(F.col("a").isNull() | F.col("b").isNull())
    )
    if not mismatch.isEmpty():
        raise ValueError("Node sets of graphs not equal")


def _build(names: DataFrame, named_edges: DataFrame, directed: bool) -> LinkGraph:
    """Fresh dense-id dictionary over ``names`` (which must cover every
    edge endpoint), edges mapped through it. Isolated nodes survive —
    the dictionary is authoritative, not the edge endpoints."""
    vertices = assign_dense_ids(names.distinct())
    edges = (
        named_edges.join(
            vertices.select(F.col("name").alias("src_name"), F.col("vid").alias("src")),
            "src_name",
        )
        .join(
            vertices.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")),
            "dst_name",
        )
        .select("src", "dst")
    )
    return LinkGraph(edges, vertices, directed=directed, vids_non_negative=True)


def compose(g1: LinkGraph, g2: LinkGraph) -> LinkGraph:
    """``nx.compose``: union of nodes and edges (edge/node data not
    modeled; topology only)."""
    _check_same_kind(g1, g2)
    names = _names(g1).unionByName(_names(g2))
    edges = _named_edges(g1).unionByName(_named_edges(g2)).distinct()
    return _build(names, edges, g1.directed)


def intersection(g1: LinkGraph, g2: LinkGraph) -> LinkGraph:
    """``nx.intersection``: nodes common to both graphs, edges present
    in both (an edge in both graphs necessarily has both endpoints in
    the common node set)."""
    _check_same_kind(g1, g2)
    names = _names(g1).join(_names(g2), "name")
    edges = _named_edges(g1).join(_named_edges(g2), ["src_name", "dst_name"])
    return _build(names, edges, g1.directed)


def difference(g1: LinkGraph, g2: LinkGraph) -> LinkGraph:
    """``nx.difference``: all of g1's nodes, edges of g1 absent from
    g2. Raises ``ValueError`` when the node sets differ (nx
    contract)."""
    _check_same_kind(g1, g2)
    _check_equal_nodes(g1, g2)
    edges = _named_edges(g1).join(
        _named_edges(g2), ["src_name", "dst_name"], "left_anti"
    )
    return _build(_names(g1), edges, g1.directed)


def symmetric_difference(g1: LinkGraph, g2: LinkGraph) -> LinkGraph:
    """``nx.symmetric_difference``: all nodes (sets must be equal),
    edges in exactly one of the graphs — the crawl-diff primitive
    (links added + links removed between snapshots)."""
    _check_same_kind(g1, g2)
    _check_equal_nodes(g1, g2)
    e1, e2 = _named_edges(g1), _named_edges(g2)
    edges = e1.join(e2, ["src_name", "dst_name"], "left_anti").unionByName(
        e2.join(e1, ["src_name", "dst_name"], "left_anti")
    )
    return _build(_names(g1), edges, g1.directed)
