"""Condensation: the SCC-DAG of a directed graph (NetworkX parity).

The web graph's macro structure (Broder et al. 2000's bowtie) is a
statement about the CONDENSATION — the acyclic graph whose nodes are
the strongly connected components and whose edges are the distinct
cross-component links. The reference dispatches directed algorithms
(nx_plugin DiGraph surface) but has no component-DAG view; this
extends the §2.9 directed-analysis surface alongside
``operators/scc.py``. Semantics match ``nx.condensation``: one node
per SCC, an edge C1 -> C2 iff some original edge crosses C1 -> C2,
self-edges dropped (the condensation is a DAG). Component naming is
the engine's deterministic min-representative convention (``scc_id``
= min vid of the component) rather than NetworkX's generator-order
integers — the adapter layer restores NX's 0..k-1 labels +
``members``/``mapping`` attributes for dispatch parity.

Plan (the scale story): one SCC decomposition (see scc.py), then TWO
key-partitioned vid joins tag every deduplicated edge with its
endpoint components, a cross-component filter, and ONE distinct on
(src_scc, dst_scc) — a map-side-combined aggregate whose output
cardinality is component-pairs, orders below the edge count on web
graphs (the giant SCC collapses to a single node). The component
vertex table is one more distinct on scc_id. Nothing iterates beyond
the SCC call; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .scc import strongly_connected_components


def condensation(
    graph: LinkGraph,
    scc_labels: DataFrame | None = None,
    **scc_kw,
) -> "LinkGraph":
    """Directed LinkGraph over the SCCs of ``graph``: vertices are the
    distinct component representatives (vid = scc_id = min member
    vid), edges the distinct cross-component links. Pass
    ``scc_labels`` (vid, scc_id) to reuse a precomputed decomposition.
    """
    labels = (
        scc_labels
        if scc_labels is not None
        else strongly_connected_components(graph, **scc_kw)
    )
    labels = labels.localCheckpoint(eager=False)
    e = graph.edges.select("src", "dst").distinct()
    tagged = (
        e.join(
            labels.select(F.col("vid").alias("src"), F.col("scc_id").alias("sc")),
            "src",
        )
        .join(
            labels.select(F.col("vid").alias("dst"), F.col("scc_id").alias("dc")),
            "dst",
        )
        .where(F.col("sc") != F.col("dc"))
        .select(F.col("sc").alias("src"), F.col("dc").alias("dst"))
        .distinct()
    )
    comp_vertices = labels.select(F.col("scc_id").alias("vid")).distinct()
    return LinkGraph(tagged, comp_vertices, directed=True)


def condensation_with_members(
    graph: LinkGraph, **scc_kw
) -> tuple["LinkGraph", DataFrame]:
    """(condensation LinkGraph, mapping DataFrame(vid, scc_id)) —
    the distributed analog of nx.condensation's ``mapping`` /
    ``members`` attributes; the mapping stays a DataFrame so member
    sets of a 10^11-vertex graph never centralize."""
    labels = strongly_connected_components(graph, **scc_kw)
    labels = labels.localCheckpoint(eager=False)
    return condensation(graph, scc_labels=labels), labels


def attracting_components(graph: LinkGraph, **scc_kw) -> DataFrame:
    """DataFrame(vid, scc_id) restricted to ATTRACTING components —
    SCCs with no outgoing cross-component edge (``nx.
    attracting_components`` parity): once a random walk enters one it
    never leaves, the absorbing states of the link graph's Markov
    chain (where PageRank mass pools without damping). Plan: the
    condensation's edge build + one anti-join of the component list
    against the distinct condensation sources + one semi-join back
    onto the mapping — nothing beyond the SCC cost."""
    cg, labels = condensation_with_members(graph, **scc_kw)
    sinks = cg.vertices.join(
        cg.edges.select(F.col("src").alias("vid")).distinct(),
        "vid",
        "left_anti",
    )
    return labels.join(
        sinks.select(F.col("vid").alias("scc_id")), "scc_id", "left_semi"
    ).select("vid", "scc_id")
