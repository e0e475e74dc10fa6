"""Closeness centrality via multi-source BFS.

Parity with /root/reference/nx_neptune/algorithms/centrality/
closeness.py:44-129: `wf_improved` -> normalize (Wasserman-Faust
scaling), `num_sources` samples sources for approximation, with the
int64-max sentinel meaning exact (closeness.py:104-109,
neptune_constants.py:69). Exact mode is O(V*E) -- feasible on test
graphs; at web scale use num_sources sampling exactly like the
reference.

NetworkX semantics (incoming-distance closeness):
  closeness(u) = (n_reach-1) / sum_dist(u), scaled by
  (n_reach-1)/(N-1) when wf_improved (default True).

Implementation: run BFS levels from each (sampled) source, all levels
unioned into one (source, vid, dist) table; aggregate per vid. Each
BFS level is one join; sources could also be batched into a single
multi-source frontier carrying a source column -- done here by
unioning frontiers and keying visited by (source, vid)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager

MAX_INT64 = 9223372036854775807  # reference "exact" sentinel

#: exact mode is O(V*E); past this vertex count it is almost certainly
#: a mistake at cluster scale, so the engine warns loudly (mirroring
#: the LinkGraph.max_adapter_rows guard pattern, graph.py:332-348 --
#: a warning rather than a raise because exact mode IS the reference's
#: documented default semantics, closeness.py:104-109)
EXACT_MODE_WARN_VERTICES = 100_000


def closeness_centrality(
    graph: LinkGraph,
    wf_improved: bool = True,
    num_sources: int = MAX_INT64,
    reverse: bool = False,
    sources: list[int] | None = None,
) -> DataFrame:
    """DataFrame(vid long, closeness double).

    Distances follow NetworkX: for digraphs, closeness of u uses
    *incoming* distance (BFS over reversed edges from u reaching v means
    v->u paths). We therefore BFS on reversed edges unless `reverse`.
    """
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="closeness")
    vertices = graph.vertices.select("vid")
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, closeness double")

    if graph.directed:
        edges = graph.edges.select("src", "dst")
        if not reverse:  # incoming distances: walk edges backwards
            edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        edges = graph.symmetric_edges().select("src", "dst")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    if sources is None and num_sources >= n > EXACT_MODE_WARN_VERTICES:
        import warnings

        warnings.warn(
            f"closeness_centrality exact mode on {n:,} vertices is "
            "O(V*E) (one BFS per vertex); pass num_sources (sampled "
            "approximation, reference semantics) or sources=[...] at "
            "this scale",
            ResourceWarning,
            stacklevel=2,
        )

    explicit_sources = sources is not None
    if explicit_sources:
        # source-list fast path (reference single-source/source-list
        # query form, opencypher_builder.py:860-905): BFS only from the
        # requested vertices -- one BFS for a single u
        src_df = spark.createDataFrame([(int(s),) for s in sources], "vid long")
        sources = vertices.join(src_df, "vid", "left_semi")
    elif num_sources < n:
        # deterministic sample: lowest vids (stable across runs/cluster sizes)
        sources = vertices.orderBy("vid").limit(int(num_sources))
    else:
        sources = vertices

    # multi-source BFS keyed by (source, vid)
    frontier = sources.select(F.col("vid").alias("source"), F.col("vid").alias("vid"))
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
        visited = cp.truncate(
            visited.unionByName(nxt.withColumn("dist", F.lit(d)))
        )
        frontier = nxt
    edges.unpersist()

    # closeness from the perspective of the BFS *source*: distances from
    # source s reach v; for incoming closeness we flipped edges, so the
    # distance table is dist(v -> s in original graph). Aggregate per source.
    agg = visited.groupBy("source").agg(
        F.sum("dist").alias("sum_dist"), (F.count("*") - 1).alias("reach")
    )
    scale = (
        (F.col("reach") / F.col("sum_dist"))
        * (F.col("reach") / F.lit(float(n - 1)) if wf_improved and n > 1 else F.lit(1.0))
    )
    out = agg.select(
        F.col("source").alias("vid"),
        F.when(F.col("sum_dist") > 0, scale).otherwise(F.lit(0.0)).alias("closeness"),
    )
    base = sources if explicit_sources else vertices
    return (
        base.select("vid").join(out, "vid", "left")
        .select("vid", F.coalesce("closeness", F.lit(0.0)).alias("closeness"))
    )


def weighted_closeness_centrality(
    graph: LinkGraph,
    weight: str = "weight",
    wf_improved: bool = True,
    sources: list[int] | None = None,
    reverse: bool = False,
    check_every: int = 4,
    max_iterations: int = 10_000,
    stats: dict | None = None,
) -> DataFrame:
    """Weighted (Dijkstra-semantics) closeness — the ``distance=``
    form of ``nx.closeness_centrality`` the REFERENCE leaves
    unsupported (closeness.py:89 warn-and-ignore); implemented here as
    a superset via batched multi-source label-correcting relaxation.

    ALL pivots relax in ONE (s, vid)-keyed state — each round is one
    key-partitioned join + one (s, vid) min-aggregate + one full-outer
    merge, `check_every` rounds chained lazily per action (the sssp.py
    blocked discipline). Incoming distances for digraphs (nx parity:
    edges walked backwards unless ``reverse``); missing weight column
    → hop counts. Returns DataFrame(vid, closeness) over the pivots
    (or all vertices), zeros for unreached, nx's
    (reach/sum)·(reach/(n−1)) Wasserman-Faust form when
    ``wf_improved``."""
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    n = graph.num_vertices()
    if graph.directed:
        e = graph.edges
        if not reverse:
            cols = [c for c in e.columns if c not in ("src", "dst")]
            e = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                *[F.col(c) for c in cols],
            )
    else:
        e = graph.symmetric_edges()
    if weight is not None and weight in e.columns:
        links = e.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        links = e.select("src", "dst", F.lit(1.0).alias("w"))
    neg = links.where(F.col("w") < 0).limit(1).count()
    if neg:
        raise ValueError("weighted closeness: negative edge weight found")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)

    if sources is not None:
        pivots = spark.createDataFrame(
            [(int(s),) for s in sources], "s long"
        ).distinct()
        explicit = True
    else:
        pivots = vertices.select(F.col("vid").alias("s"))
        explicit = False
        if n > 50_000:
            import warnings

            warnings.warn(
                f"exact weighted closeness on {n:,} vertices is O(V*E); "
                "pass sources=[...] to sample",
                stacklevel=2,
            )
    dist = pivots.select("s", F.col("s").alias("vid"), F.lit(0.0).alias("distance"))
    dist = dist.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = dist
    rounds, converged = 0, False
    check_every = max(1, int(check_every))
    while rounds < max_iterations and not converged:
        block = min(check_every, max_iterations - rounds)
        new_dist, new_frontier = dist, frontier
        for _ in range(block):
            cand = (
                links.join(
                    new_frontier.select(
                        "s", F.col("vid").alias("src"),
                        F.col("distance").alias("d"),
                    ),
                    "src",
                )
                .groupBy("s", F.col("dst").alias("vid"))
                .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
            )
            merged = (
                new_dist.join(cand, ["s", "vid"], "full_outer")
                .select(
                    "s",
                    "vid",
                    F.least(
                        F.coalesce("distance", F.lit(float("inf"))),
                        F.coalesce("nd", F.lit(float("inf"))),
                    ).alias("distance"),
                    (
                        F.col("nd").isNotNull()
                        & (
                            F.col("distance").isNull()
                            | (F.col("nd") < F.col("distance"))
                        )
                    ).alias("improved"),
                )
                .localCheckpoint(eager=False)
            )
            new_frontier = merged.where("improved").select("s", "vid", "distance")
            new_dist = merged.select("s", "vid", "distance")
        new_dist = new_dist.persist(StorageLevel.MEMORY_AND_DISK)
        new_frontier = new_frontier.persist(StorageLevel.MEMORY_AND_DISK)
        n_improved = new_frontier.limit(1).count()
        dist.unpersist()
        frontier.unpersist()
        dist, frontier = new_dist, new_frontier
        rounds += block
        if n_improved == 0:
            converged = True
    frontier.unpersist()
    links.unpersist()
    if stats is not None:
        stats.update(rounds=rounds, converged=converged)
    agg = dist.groupBy("s").agg(
        F.sum("distance").alias("sum_dist"), (F.count("*") - 1).alias("reach")
    )
    scale = (F.col("reach") / F.col("sum_dist")) * (
        F.col("reach") / F.lit(float(n - 1))
        if wf_improved and n > 1
        else F.lit(1.0)
    )
    out = agg.select(
        F.col("s").alias("vid"),
        F.when(F.col("sum_dist") > 0, scale).otherwise(F.lit(0.0)).alias(
            "closeness"
        ),
    )
    base = pivots.select(F.col("s").alias("vid")) if explicit else vertices
    res = base.join(out, "vid", "left").select(
        "vid", F.coalesce("closeness", F.lit(0.0)).alias("closeness")
    )
    res = res.localCheckpoint(eager=True)
    dist.unpersist()
    return res
