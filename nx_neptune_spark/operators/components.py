"""Connected components (exact, NetworkX-`connected_components` parity).

Required by the north rule as a canonical extension of the reference's
dispatch surface (SURVEY.md §2.9); the reference delegates no explicit
CC operator, so NetworkX semantics are the oracle.

Two algorithms, both pure DataFrame joins/aggregates:

  * ``two-phase`` (default): alternating **large-star / small-star**
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -- converges in O(log^2 n) rounds regardless of component
    diameter, the right choice for web graphs whose largest component
    spans billions of vertices. Each round is two self-join-free
    group-by-min passes over the (deduplicated) edge set.

  * ``minlabel``: classic min-label propagation (labels' = min(label,
    min over neighbors)), O(diameter) rounds; simpler plan per round,
    useful as a cross-check and for low-diameter graphs.

Returns DataFrame(vid long, component long) where component is the
minimum vid in each component (deterministic representative).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, IterationMetrics


def connected_components(
    graph: LinkGraph,
    algorithm: str = "two-phase",
    max_iter: int = 200,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Exact connected components of the *undirected* view of the graph
    (weakly connected components for digraphs, matching
    ``nx.connected_components`` on ``g.to_undirected()``)."""
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    # undirected view regardless of graph.directed (WCC semantics)
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
    )
    cp = checkpoint or CheckpointManager(spark, algorithm="connected_components")
    if algorithm == "two-phase":
        # NO input .distinct(): round 0's min-aggregates are
        # dup-insensitive and the round ends in a distinct, so the
        # up-front dedup would be a pure extra exchange over the
        # RAW edge table -- the largest shuffle of the whole run at
        # web scale (measured ~9% total wall-clock at 200k pages,
        # min-of-3; grows with |E|/memory-bandwidth at cluster scale)
        labels = _star_contraction(edges, cp, max_iter)
    elif algorithm == "minlabel":
        # minlabel rejoins the same edge set every round: dedup once
        labels = _min_label_propagation(vertices, edges.distinct(), cp, max_iter)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # attach isolated vertices (their own component)
    return (
        vertices.join(labels, "vid", "left")
        .select("vid", F.coalesce("component", F.col("vid")).alias("component"))
    )


def _star_contraction(
    edges: DataFrame, cp: CheckpointManager, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star until the edge set is a stable
    star forest; then every non-root points at its component minimum.

    large-star: for each u, hang every neighbor v > u onto
                m = min(N(u) ∪ {u}).
    small-star: orient edges (hi -> lo); for each hi-node u, hang u and
                all its lo-neighbors onto m = min(N_lo(u) ∪ {u}).
    """
    spark = edges.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame([], "vid long, component long")
    e = edges.localCheckpoint(eager=False)
    # resume from a durable checkpoint (the state IS the contracted edge
    # set; a completed manifest means e is already the star forest)
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        e = state.select("u", "v").localCheckpoint(eager=False)
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))

    # Convergence = the edge set IS a star forest (every edge root->leaf
    # with u<v, no vertex both parent and child, every child unique) --
    # the exact fixpoint of the alternating contraction. Checking the
    # structural property directly instead of fingerprint-comparing
    # consecutive edge sets saves BOTH the pre-loop fingerprint scan and
    # the final confirm round (the fixpoint is recognized the moment it
    # is produced, not one contraction later). One groupBy-aggregate
    # action per round, which also materializes that round's
    # lazily-checkpointed edge set.
    def star_stats(df):
        """ONE action, three signals: star-forest-ness (both/multi) and
        the round's edge count (recorded in the manifest metrics)."""
        tagged = df.select(
            F.col("u").alias("vid"), F.lit(1).alias("pp"), F.lit(0).alias("cc")
        ).unionAll(
            df.select(F.col("v").alias("vid"), F.lit(0).alias("pp"), F.lit(1).alias("cc"))
        )
        return (
            tagged.groupBy("vid")
            .agg(F.max("pp").alias("p"), F.max("cc").alias("c"), F.sum("cc").alias("nc"))
            .agg(
                F.count(F.when((F.col("p") == 1) & (F.col("c") == 1), 1)).alias("both"),
                F.count(F.when(F.col("nc") > 1, 1)).alias("multi"),
                F.coalesce(F.sum("nc"), F.lit(0)).cast("long").alias("n_edges"),
            )
            .first()
        )

    for it in range(start_iter, 0 if already_done else max_iter):
        # ---- large-star ----
        sym = e.select("u", "v").unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # NOTE: no intermediate distinct -- duplicates are harmless to
        # small-star (its min-aggregate is dup-insensitive and the round
        # ends in a distinct anyway) and the row count is bounded by
        # 2|e|; dropping the exchange is ~25% off the round wall-clock.
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # ---- small-star ----
        lo = large.select(F.col("v").alias("hi"), F.col("u").alias("lo"))
        m2 = lo.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            lo.join(m2, "hi")
            .select(
                F.col("lo").alias("a"), F.col("m").alias("b")
            )  # hang lo-neighbors on m
            .unionAll(
                m2.select(F.col("hi").alias("a"), F.col("m").alias("b"))
            )  # hang hi on m
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        metrics = IterationMetrics(iteration=it)
        new_e = cp.checkpoint(small, metrics, lazy=True)
        e = new_e
        if it == start_iter == 0 and max_iter > 1:
            # a multi-edge graph never contracts to a star forest in
            # one round, so round 0's check is a wasted 2|E|-row
            # exchange over the LARGEST intermediate of the run --
            # skip it and let round 1's single action materialize
            # both rounds in one job. (A graph that WAS already a
            # star forest pays one extra cheap no-op round; round 0's
            # manifest carries no n_edges metric -- round 1's does.)
            # max_iter == 1 means this is the ONLY round: check and
            # finalize normally so a converged single-round run does
            # not leave an incomplete manifest.
            continue
        row = star_stats(new_e)
        metrics.extra["n_edges"] = int(row["n_edges"])
        cp.update_metrics(metrics)
        if row["both"] == 0 and row["multi"] == 0:
            cp.finalize(it, metrics, state=new_e)
            break
    # star forest: v (child) -> u (root/min); roots map to themselves
    child = e.select(F.col("v").alias("vid"), F.col("u").alias("component"))
    root = e.select(F.col("u").alias("vid"), F.col("u").alias("component")).distinct()
    return child.unionAll(root).groupBy("vid").agg(F.min("component").alias("component"))


def _min_label_propagation(
    vertices: DataFrame, edges: DataFrame, cp: CheckpointManager, max_iter: int
) -> DataFrame:
    spark = edges.sparkSession
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = vertices.select("vid", F.col("vid").alias("component"))
    labels = cp.truncate(labels)
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        labels = cp.truncate(state.select("vid", "component"))
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))
    for it in range(start_iter, 0 if already_done else max_iter):
        nbr_min = (
            sym.join(labels, sym.u == labels.vid)
            .groupBy("v")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vid == nbr_min.v, "left")
            .select(
                "vid",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
        )
        # NOTE: not lazy -- the changed-check below is a short-circuit
        # limit(1).count() that would leave the cache only partially
        # materialized.
        new_labels = cp.checkpoint(new_labels, IterationMetrics(iteration=it))
        changed = (
            new_labels.alias("n")
            .join(labels.select("vid", F.col("component").alias("old")), "vid")
            .where("component != old")
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            cp.finalize(it, state=labels)
            break
    sym.unpersist()
    return labels
