"""DAG longest path (critical path) over the Kahn layering.

``nx.dag_longest_path`` / ``nx.dag_longest_path_length`` on a link
graph answer "what is the deepest dependency / crawl chain" — on the
web bowtie the natural input is the condensation (see
``operators/condensation.py``), where the longest path is the deepest
SCC-to-SCC link chain.

Algorithm: **layered DP**. ``topological_generations`` (bulk Kahn
peeling, operators/toposort.py) already yields generation(v) = longest
UNWEIGHTED path from any source, so for the default ``weight=1`` case
dist(v) == generation(v) and the table is one pass. For weighted
edges we run one DP round per generation g >= 1: the edges entering
layer g join the finalized dist table (all layers < g — in a Kahn
layering every predecessor of a layer-g vertex lives in an earlier
layer), take the per-destination max of dist(src) + w, and the layer's
rows are finalized. NetworkX's negative-total clamp is honored:
``dist[v] = (0, v)`` when the best incoming total is negative
(nx/algorithms/dag.py ``dag_longest_path``), i.e. a vertex restarts
as its own source rather than inherit a negative prefix.

Determinism: NetworkX's predecessor choice on ties follows dict
order (unspecified); here pred = argmax by (score, src-vid), a
deterministic refinement, and the endpoint of the reported path is
argmax by (dist, vid).

Plan per round (the scale story): one key-partitioned join of the
layer-g in-edges against the finalized dist table + one partial-agg
max per destination; lineage cut per round, consumed round state
released (the betweenness discipline). Round count = DAG depth —
short on web condensations (the giant SCC collapses to one node).
Backtracking the path itself is depth x O(1) lookups against the
persisted dist table; the path is only ever depth-long, so this
driver loop is bounded by the same quantity that bounds the DP.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .toposort import topological_generations


def dag_longest_path_table(
    graph: LinkGraph,
    weight: str | None = "weight",
    default_weight: float = 1.0,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, dist double, pred long) — dist = weighted
    longest-path-from-any-source ending at vid, pred = the chosen
    predecessor on that path (null for path starts). Raises
    ``ValueError`` on cycles (from the underlying Kahn peel)."""
    st: dict = {}
    gens = topological_generations(graph, stats=st).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    depth = st.get("depth", 0)
    if stats is not None:
        stats.update(depth=depth)

    e = graph.edges.select("src", "dst")
    if weight is not None and weight in graph.edges.columns:
        e = graph.edges.select(
            "src", "dst", F.col(weight).cast("double").alias("w")
        )
    else:
        e = e.withColumn("w", F.lit(float(default_weight)))
    # annotate each edge with its destination's generation once; the
    # per-round filter then prunes to the edges entering that layer.
    e = (
        e.join(gens.select(F.col("vid").alias("dst"), "generation"), "dst")
        .select("src", "dst", "w", F.col("generation").alias("gdst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    dist = (
        gens.where(F.col("generation") == 0)
        .select(
            "vid",
            F.lit(0.0).alias("dist"),
            F.lit(None).cast("long").alias("pred"),
        )
        .localCheckpoint(eager=True)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for g in range(1, depth):
        cand = (
            e.where(F.col("gdst") == g)
            .join(dist.select(F.col("vid").alias("src"), "dist"), "src")
            .groupBy("dst")
            .agg(F.max(F.struct((F.col("dist") + F.col("w")).alias("s"), F.col("src"))).alias("best"))
            .select(
                F.col("dst").alias("vid"),
                # nx negative clamp: a negative best total restarts the
                # vertex as its own source (dist 0, no predecessor).
                F.when(F.col("best.s") >= 0, F.col("best.s")).otherwise(F.lit(0.0)).alias("dist"),
                F.when(F.col("best.s") >= 0, F.col("best.src")).cast("long").alias("pred"),
            )
        )
        new_dist = (
            dist.unionByName(cand)
            .localCheckpoint(eager=True)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        dist.unpersist()
        dist = new_dist
    e.unpersist()
    gens.unpersist()
    return dist


def dag_longest_path_length(
    graph: LinkGraph,
    weight: str | None = "weight",
    default_weight: float = 1.0,
) -> float:
    """``nx.dag_longest_path_length``: total weight of the longest
    path (0.0 for an empty/edgeless DAG)."""
    t = dag_longest_path_table(graph, weight, default_weight)
    row = t.agg(F.max("dist").alias("m")).first()
    return float(row["m"]) if row["m"] is not None else 0.0


def dag_longest_path(
    graph: LinkGraph,
    weight: str | None = "weight",
    default_weight: float = 1.0,
    stats: dict | None = None,
) -> list[int]:
    """Longest path as a vid list (``nx.dag_longest_path`` shape; the
    endpoint and per-step predecessor ties break deterministically by
    vid). Driver work is O(depth) single-row probes of the persisted
    dist table."""
    t = dag_longest_path_table(graph, weight, default_weight, stats=stats)
    t = t.persist(StorageLevel.MEMORY_AND_DISK)
    end = t.orderBy(F.desc("dist"), F.desc("vid")).select("vid", "pred").first()
    if end is None:
        t.unpersist()
        return []
    path = [end["vid"]]
    pred = end["pred"]
    while pred is not None:
        path.append(pred)
        row = t.where(F.col("vid") == int(pred)).select("pred").first()
        pred = row["pred"] if row is not None else None
    t.unpersist()
    path.reverse()
    return path
