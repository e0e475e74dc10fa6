"""Graph distance measures: eccentricity, diameter, radius, center,
periphery, barycenter, Wiener index (NetworkX parity).

The classic whole-graph distance summaries (Harary 1969 for
eccentricity/center; Wiener 1947): the crawl-depth and
"how far is the farthest page" questions over a link graph. The
reference's closeness dispatch is the only distance surface it has;
this module completes the family over the SAME batched multi-source
BFS (operators/closeness.py / harmonic.py), with OUTGOING hop
distances — nx's ``shortest_path_length(G, source=v)`` orientation,
the mirror of closeness's incoming walk.

Parity notes (nx distance_measures.py):
- ``eccentricity`` raises when any requested source cannot reach the
  whole graph (directed: strong connectivity), with nx's message.
- ``barycenter`` raises on disconnected input; ``wiener_index``
  returns +inf instead (nx's asymmetry, mirrored).
- center/periphery/barycenter return node lists; order here is by vid
  (nx uses node-insertion order — same whenever insertion is sorted).
- ``weight=`` (Dijkstra distances) is NotImplemented: all-sources
  weighted APSP belongs to a different budget class than one
  SSSP (operators/sssp.py covers the single-source weighted case).

Plan (the scale story): ALL sources batched in ONE (source, vid)-keyed
frontier — per level one key-partitioned join + distinct + anti-join,
per-level lineage truncation. Exact mode is O(V·E) state like exact
closeness and fires the same loud ResourceWarning past 100k vertices;
pass ``sources`` (eccentricity of a sample / pivots) at web scale —
the standard iFUB-style practice.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager
from .closeness import EXACT_MODE_WARN_VERTICES


def distance_profile(
    graph: LinkGraph, sources: list[int] | None = None
) -> DataFrame:
    """DataFrame(vid, ecc long, total_dist long, reached long): per
    requested source, the max outgoing hop distance, the sum of
    distances, and how many vertices were reached (source included).
    The building block every measure below derives from."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="distance")
    vertices = graph.vertices.select("vid")
    if graph.directed:
        edges = graph.edges.select("src", "dst")
    else:
        edges = graph.symmetric_edges().select("src", "dst")
    edges = edges.distinct().persist(StorageLevel.MEMORY_AND_DISK)

    if sources is not None:
        roots_df = spark.createDataFrame([(int(v),) for v in sources], "vid long")
        roots = vertices.join(roots_df, "vid", "left_semi")
    else:
        roots = vertices
        n = vertices.count()
        if n > EXACT_MODE_WARN_VERTICES:
            import warnings

            warnings.warn(
                f"exact distance profile on {n:,} vertices is O(V*E); "
                "pass sources=[...] at this scale",
                ResourceWarning,
                stacklevel=2,
            )

    frontier = roots.select(F.col("vid").alias("source"), F.col("vid").alias("vid"))
    visited = cp.truncate(frontier.withColumn("dist", F.lit(0)))
    frontier = cp.truncate(frontier)
    d = 0
    while True:
        nxt = (
            edges.join(frontier, edges.src == frontier.vid)
            .select("source", F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("source", "vid"), ["source", "vid"], "left_anti")
        )
        nxt = cp.truncate(nxt)
        if nxt.isEmpty():
            break
        d += 1
        visited = cp.truncate(visited.unionByName(nxt.withColumn("dist", F.lit(d))))
        frontier = nxt
    edges.unpersist()
    return visited.groupBy(F.col("source").alias("vid")).agg(
        F.max("dist").alias("ecc"),
        F.sum("dist").alias("total_dist"),
        F.count("*").alias("reached"),
    )


def _full_profile_or_raise(graph: LinkGraph, what: str) -> DataFrame:
    profile = distance_profile(graph).persist()
    n = graph.num_vertices()
    if n == 0:
        profile.unpersist()
        raise ValueError(f"{what} is undefined for the null graph")
    if not profile.where(F.col("reached") < n).isEmpty():
        profile.unpersist()
        if graph.directed:
            raise ValueError(
                "Found infinite path length because the digraph is not"
                " strongly connected"
            )
        raise ValueError(
            "Found infinite path length because the graph is not connected"
        )
    return profile


def eccentricity(
    graph: LinkGraph, sources: list[int] | None = None
) -> DataFrame:
    """``nx.eccentricity`` parity: DataFrame(vid, ecc long); raises
    exactly where nx raises (a source that cannot reach every
    vertex)."""
    n = graph.num_vertices()
    profile = distance_profile(graph, sources=sources).persist()
    try:
        if not profile.where(F.col("reached") < n).isEmpty():
            if graph.directed:
                raise ValueError(
                    "Found infinite path length because the digraph is not"
                    " strongly connected"
                )
            raise ValueError(
                "Found infinite path length because the graph is not connected"
            )
        return profile.select("vid", "ecc")
    finally:
        profile.unpersist(blocking=False)


def diameter(graph: LinkGraph) -> int:
    """``nx.diameter`` parity (max eccentricity)."""
    profile = _full_profile_or_raise(graph, "diameter")
    row = profile.agg(F.max("ecc").alias("d")).first()
    profile.unpersist()
    return int(row["d"])


def radius(graph: LinkGraph) -> int:
    """``nx.radius`` parity (min eccentricity)."""
    profile = _full_profile_or_raise(graph, "radius")
    row = profile.agg(F.min("ecc").alias("r")).first()
    profile.unpersist()
    return int(row["r"])


def center(graph: LinkGraph) -> DataFrame:
    """``nx.center`` parity: DataFrame(vid) with ecc == radius."""
    profile = _full_profile_or_raise(graph, "center")
    rad = profile.agg(F.min("ecc").alias("r"))
    out = profile.crossJoin(rad).where(F.col("ecc") == F.col("r")).select("vid")
    profile.unpersist(blocking=False)
    return out


def periphery(graph: LinkGraph) -> DataFrame:
    """``nx.periphery`` parity: DataFrame(vid) with ecc == diameter."""
    profile = _full_profile_or_raise(graph, "periphery")
    dia = profile.agg(F.max("ecc").alias("d"))
    out = profile.crossJoin(dia).where(F.col("ecc") == F.col("d")).select("vid")
    profile.unpersist(blocking=False)
    return out


def barycenter(graph: LinkGraph) -> DataFrame:
    """``nx.barycenter`` parity (weight=None): DataFrame(vid) of the
    total-distance minimizers; raises on disconnected input like nx
    (NetworkXNoPath — mapped at the dispatch layer)."""
    profile = _full_profile_or_raise(graph, "barycenter")
    best = profile.agg(F.min("total_dist").alias("b"))
    out = (
        profile.crossJoin(best)
        .where(F.col("total_dist") == F.col("b"))
        .select("vid")
    )
    profile.unpersist(blocking=False)
    return out


def average_shortest_path_length(graph: LinkGraph) -> float:
    """``nx.average_shortest_path_length`` parity (weight=None): mean
    hop distance over ordered reachable pairs, with nx's exact error
    surface — null graph raises, single vertex returns 0, disconnected
    (or not strongly connected) input raises with nx's message. Rides
    the same all-sources BFS profile as the other distance measures
    (O(V·E) exact mode with the same loud warning past the guard)."""
    n = graph.num_vertices()
    if n == 0:
        raise ValueError(
            "the null graph has no paths, thus there is no average shortest path length"
        )
    if n == 1:
        return 0.0
    profile = distance_profile(graph).persist()
    try:
        if not profile.where(F.col("reached") < n).isEmpty():
            if graph.directed:
                raise ValueError("Graph is not strongly connected.")
            raise ValueError("Graph is not connected.")
        row = profile.agg(F.sum("total_dist").alias("s")).first()
        return float(row["s"]) / (n * (n - 1))
    finally:
        profile.unpersist(blocking=False)


def _lrc_frame(graph: LinkGraph, sources: list[int] | None = None) -> DataFrame:
    """DataFrame(vid, lrc double): nx's unweighted local reaching
    centrality. Directed: (reached−1)/(n−1) (fraction reachable).
    Undirected: nx's average-path-weight form degenerates to
    Σ_j 1/d(v,j) / (n−1) — exactly harmonic centrality scaled (the
    orientations coincide on an undirected graph)."""
    n = graph.num_vertices()
    if graph.directed:
        return distance_profile(graph, sources=sources).select(
            "vid",
            ((F.col("reached") - 1).cast("double") / (n - 1)).alias("lrc"),
        )
    from .harmonic import harmonic_centrality

    return harmonic_centrality(graph, nbunch=sources).select(
        "vid", (F.col("harmonic") / (n - 1)).alias("lrc")
    )


def _reaching_guard(graph: LinkGraph) -> None:
    if graph.edges.isEmpty():
        raise ValueError("Size of G must be positive")
    if graph.num_vertices() == 1:
        raise ValueError(
            "local_reaching_centrality of a single node with self-loop "
            "not well-defined"
        )


def local_reaching_centrality(graph: LinkGraph, vid: int) -> float:
    """``nx.local_reaching_centrality`` parity for the UNWEIGHTED case
    (Mones et al. 2012). Weighted reaching is NotImplemented at the
    API layer."""
    _reaching_guard(graph)
    row = _lrc_frame(graph, sources=[vid]).first()
    return float(row["lrc"]) if row is not None else 0.0


def global_reaching_centrality(graph: LinkGraph) -> float:
    """``nx.global_reaching_centrality`` parity (unweighted):
    GRC = Σ_v (max LRC − LRC(v)) / (n−1) — the Mones hierarchy
    measure of a link graph. One all-sources BFS profile (exact-mode
    warning applies) + two 1-row aggregates; the subtraction folds
    in-plan via a broadcast max row."""
    n = graph.num_vertices()
    _reaching_guard(graph)
    lrc = _lrc_frame(graph).persist()
    try:
        mx = lrc.agg(F.max("lrc").alias("mx"))
        row = (
            lrc.crossJoin(mx)
            .agg(F.sum(F.col("mx") - F.col("lrc")).alias("s"))
            .first()
        )
        return float(row["s"]) / (n - 1)
    finally:
        lrc.unpersist(blocking=False)


def wiener_index(graph: LinkGraph) -> float:
    """``nx.wiener_index`` parity (weight=None): Σ pairwise distances
    (ordered pairs for digraphs, each unordered pair once otherwise);
    +inf on disconnected/not-strongly-connected input — nx returns
    inf here rather than raising."""
    n = graph.num_vertices()
    profile = distance_profile(graph).persist()
    try:
        if not profile.where(F.col("reached") < n).isEmpty():
            return float("inf")
        row = profile.agg(F.sum("total_dist").alias("s")).first()
        total = float(row["s"]) if row["s"] is not None else 0.0
        return total if graph.directed else total / 2.0
    finally:
        profile.unpersist(blocking=False)
