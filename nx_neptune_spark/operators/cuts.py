"""Cuts, boundaries and expansion measures (NetworkX parity).

Partition-quality scoring — given a vertex set S (a community, a
crawl shard, a host group), how many edges leave it, how big is its
boundary, what is its conductance (Shi-Malik / Kannan-Vempala-Vetta).
This is the evaluation side of the community surface (Louvain/LPA
detect, modularity and THESE score): conductance sweeps are the
standard web-graph community diagnostic (Leskovec et al. 2009,
"Community structure in large networks").

Semantics match networkx/algorithms/{boundary,cuts}.py exactly:
edge_boundary/cut_size count each undirected boundary edge once and
BOTH directions on digraphs; volume uses out-degree on digraphs;
node_expansion's neighborhood is N(S) WITHOUT removing S;
boundary_expansion uses node_boundary (which removes S). ``weight=``
sums the edge weight column when the graph carries one.

Plan (the scale story): S and T are DataFrames (callers with driver
lists get them wrapped); every measure is 1-2 semi/anti-joins of the
edge table against S/T plus ONE scalar partial aggregate — no
iteration, no driver state beyond the scalar. S can therefore be a
billion-row community assignment slice; nothing here collects it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _as_vid_df(graph: LinkGraph, s) -> DataFrame:
    if isinstance(s, DataFrame):
        return s.select(F.col(s.columns[0]).alias("vid")).distinct()
    return graph.spark.createDataFrame(
        [(int(v),) for v in s], "vid long"
    ).distinct()


def _s_t(graph: LinkGraph, S, T) -> tuple[DataFrame, DataFrame]:
    s_df = _as_vid_df(graph, S)
    if T is None:
        t_df = graph.vertices.select("vid").join(s_df, "vid", "left_anti")
    else:
        t_df = _as_vid_df(graph, T)
    return s_df, t_df


def _edges(graph: LinkGraph, weight: str | None) -> DataFrame:
    e = graph.edges if graph.directed else (
        graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            *(["weight"] if "weight" in graph.edges.columns else []),
        )
    )
    if weight is not None and "weight" in e.columns:
        e = e.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    else:
        e = e.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    return e


def edge_boundary(
    graph: LinkGraph, S, T=None, weight: str | None = None
) -> DataFrame:
    """``nx.edge_boundary`` analog: DataFrame(src, dst, w) of edges
    with one endpoint in S and the other in T (default complement);
    digraphs keep only the S→T orientation, like nx."""
    s_df, t_df = _s_t(graph, S, T)
    e = _edges(graph, weight)
    if graph.directed:
        return (
            e.join(s_df.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(t_df.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        )
    fwd = e.join(s_df.withColumnRenamed("vid", "src"), "src", "left_semi").join(
        t_df.withColumnRenamed("vid", "dst"), "dst", "left_semi"
    )
    rev = e.join(t_df.withColumnRenamed("vid", "src"), "src", "left_semi").join(
        s_df.withColumnRenamed("vid", "dst"), "dst", "left_semi"
    )
    return fwd.unionByName(rev)


def node_boundary(graph: LinkGraph, S, T=None) -> DataFrame:
    """``nx.node_boundary`` analog: DataFrame(vid) of vertices outside
    S adjacent to S (successors on digraphs, nx's G[v]); intersected
    with T when given."""
    s_df, _ = _s_t(graph, S, None)
    adj = (
        graph.edges.select("src", "dst")
        if graph.directed
        else graph.symmetric_edges().select("src", "dst")
    )
    bdy = (
        adj.join(s_df.withColumnRenamed("vid", "src"), "src", "left_semi")
        .select(F.col("dst").alias("vid"))
        .distinct()
        .join(s_df, "vid", "left_anti")
    )
    if T is not None:
        bdy = bdy.join(_as_vid_df(graph, T), "vid", "left_semi")
    return bdy


def cut_size(graph: LinkGraph, S, T=None, weight: str | None = None) -> float:
    """``nx.cut_size`` parity (digraphs sum both orientations)."""
    s_df, t_df = _s_t(graph, S, T)
    bdy = edge_boundary(graph, s_df, t_df, weight=weight)
    if graph.directed:
        bdy = bdy.unionByName(edge_boundary(graph, t_df, s_df, weight=weight))
    row = bdy.agg(F.coalesce(F.sum("w"), F.lit(0.0)).alias("s")).first()
    return float(row["s"])


def volume(graph: LinkGraph, S, weight: str | None = None) -> float:
    """``nx.volume`` parity: Σ (out-)degree over S (undirected degree
    = both orientations of the symmetric view)."""
    s_df = _as_vid_df(graph, S)
    base = graph.edges if graph.directed else graph.symmetric_edges()
    if weight is not None and "weight" in base.columns:
        per = base.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    else:
        per = base.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    row = (
        per.join(s_df.withColumnRenamed("vid", "src"), "src", "left_semi")
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)).alias("s"))
        .first()
    )
    return float(row["s"])


def conductance(graph: LinkGraph, S, T=None, weight: str | None = None) -> float:
    """``nx.conductance`` parity: cut / min(vol S, vol T)."""
    s_df, t_df = _s_t(graph, S, T)
    cut = cut_size(graph, s_df, t_df, weight=weight)
    return cut / min(volume(graph, s_df, weight), volume(graph, t_df, weight))


def normalized_cut_size(
    graph: LinkGraph, S, T=None, weight: str | None = None
) -> float:
    """``nx.normalized_cut_size`` parity: cut·(1/volS + 1/volT)."""
    s_df, t_df = _s_t(graph, S, T)
    cut = cut_size(graph, s_df, t_df, weight=weight)
    return cut * (
        1.0 / volume(graph, s_df, weight) + 1.0 / volume(graph, t_df, weight)
    )


def edge_expansion(
    graph: LinkGraph, S, T=None, weight: str | None = None
) -> float:
    """``nx.edge_expansion`` parity: cut / min(|S|, |T|)."""
    s_df, t_df = _s_t(graph, S, T)
    cut = cut_size(graph, s_df, t_df, weight=weight)
    return cut / min(s_df.count(), t_df.count())


def mixing_expansion(
    graph: LinkGraph, S, T=None, weight: str | None = None
) -> float:
    """``nx.mixing_expansion`` parity: cut / (2·|E|)."""
    s_df, t_df = _s_t(graph, S, T)
    cut = cut_size(graph, s_df, t_df, weight=weight)
    m = (
        graph.edges.select("src", "dst").distinct().count()
        if graph.directed
        else graph.edges.select(
            F.least("src", "dst"), F.greatest("src", "dst")
        ).distinct().count()
    )
    return cut / (2 * m)


def node_expansion(graph: LinkGraph, S) -> float:
    """``nx.node_expansion`` parity: |N(S)| / |S| — the neighborhood
    keeps members of S that are adjacent to S (nx does NOT subtract)."""
    s_df = _as_vid_df(graph, S)
    adj = (
        graph.edges.select("src", "dst")
        if graph.directed
        else graph.symmetric_edges().select("src", "dst")
    )
    nbhd = (
        adj.join(s_df.withColumnRenamed("vid", "src"), "src", "left_semi")
        .select(F.col("dst").alias("vid"))
        .distinct()
        .count()
    )
    return nbhd / s_df.count()


def boundary_expansion(graph: LinkGraph, S) -> float:
    """``nx.boundary_expansion`` parity: |node_boundary(S)| / |S|."""
    s_df = _as_vid_df(graph, S)
    return node_boundary(graph, s_df).count() / s_df.count()
