"""Onion decomposition (onion layers) over the undirected view.

The reference exposes only the Neptune Analytics algorithm set (no
onion decomposition: /root/reference/nx_neptune/algorithms has
pagerank/centrality/community/traversal only); included as the
peeling-family completion next to k-core/k-truss (SURVEY.md §2.9) —
the onion spectrum (Hebert-Dufresne, Grochow & Allard, Scientific
Reports 2016) refines coreness with HOW DEEP inside its core each
vertex sits, the standard structural fingerprint of a crawl graph.

Semantics match ``nx.onion_layers`` exactly:

  * initially isolated vertices form layer 1 (and shift later layers
    by one) — nx's explicit special case;
  * per round, the peel threshold is max(previous threshold, minimum
    remaining degree) and EVERY vertex at or below it is removed as
    one layer (vertices isolated mid-peel have degree 0 and fall into
    the next layer automatically).

Plan shape (the k-truss bulk-peeling discipline): per round ONE
map-side-combined degree aggregate over the shrinking remaining edge
set, one scalar min (a bounded driver action, the per-round gate),
one threshold filter for the layer, and two semi-joins that shrink
the edge table. Round count = number of onion layers — bounded by
~2x the degeneracy times the depth of each core's peel sequence on
power-law crawl graphs (tens), worst-case O(V) on a path (the same
bound as BFS diameter rounds). Per-round lineage cuts with immediate
release of the consumed round's blocks.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def onion_layers(
    graph: LinkGraph,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(vid long, layer long): the onion layer of every
    vertex (``nx.onion_layers`` parity on the undirected simple view;
    self-loops dropped)."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="onion")
    canon = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    edges = cp.truncate(canon)
    touched = edges.select(F.col("u").alias("vid")).unionByName(
        edges.select(F.col("v").alias("vid"))
    ).distinct()
    vertices = graph.vertices.select("vid")
    isolates = cp.truncate(vertices.join(touched, "vid", "left_anti"))
    layer = 1
    parts: list[DataFrame] = []
    if not isolates.isEmpty():
        parts.append(
            cp.truncate(isolates.select("vid", F.lit(1).cast("long").alias("layer")))
        )
        layer = 2
    remaining = cp.truncate(vertices.join(isolates, "vid", "left_anti"))
    release_local_checkpoint(isolates)
    core = 1
    rounds = 0
    while True:
        if remaining.isEmpty():
            break
        deg = (
            edges.select(F.col("u").alias("vid"))
            .unionByName(edges.select(F.col("v").alias("vid")))
            .groupBy("vid")
            .agg(F.count("*").alias("deg"))
        )
        deg = cp.truncate(
            remaining.join(deg, "vid", "left").select(
                "vid", F.coalesce("deg", F.lit(0)).alias("deg")
            )
        )
        min_deg = deg.agg(F.min("deg")).collect()[0][0]
        core = max(core, int(min_deg))
        peel = deg.where(F.col("deg") <= core).select("vid")
        # materialize the layer before deg's blocks are released below
        parts.append(
            cp.truncate(peel.select("vid", F.lit(layer).cast("long").alias("layer")))
        )
        old_remaining, old_edges = remaining, edges
        remaining = cp.truncate(remaining.join(peel, "vid", "left_anti"))
        edges = cp.truncate(
            edges.join(
                remaining.select(F.col("vid").alias("u")), "u", "left_semi"
            ).join(remaining.select(F.col("vid").alias("v")), "v", "left_semi")
        )
        release_local_checkpoint(old_remaining)
        release_local_checkpoint(old_edges)
        release_local_checkpoint(deg)
        layer += 1
        rounds += 1
    if stats is not None:
        stats["rounds"] = rounds
        stats["layers"] = layer - 1
        stats["max_core_threshold"] = core
    if not parts:
        return vertices.select(
            "vid", F.lit(1).cast("long").alias("layer")
        ).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
