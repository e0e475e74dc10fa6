"""Label propagation communities (synchronous, deterministic).

Reference surface: three NetworkX entry points all dispatch to one
remote implementation (`label_propagation_communities`,
`fast_label_propagation_communities`, `asyn_lpa_communities`;
/root/reference/nx_neptune/algorithms/community/label_propagation.py:48-362),
with `seed` warned-and-ignored (:103,176) -- i.e. the reference already
gives up NetworkX's randomized semantics. We therefore fix deterministic
semantics (SURVEY.md §7.2): synchronous updates, each vertex adopts the
label with the highest total incident weight among its neighbors *and
itself*, ties broken by minimum label. Weighted parity with the
reference's vertex/edge weight combination (label_propagation.py:216-228:
effective weight = vertex_weight x edge_weight when both given).

Plan per iteration (one shuffle): messages = sym_edges ⨝ labels on src
-> groupBy(dst, label).sum(weight) + self-vote -> per-dst argmax via
max(struct(weight, -label)) (no window / no row_number: a single
partial+final aggregate).

Returns DataFrame(vid long, label long); communities = groupBy(label).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, IterationMetrics


def label_propagation(
    graph: LinkGraph,
    max_iterations: int = 20,
    weight: str | None = None,
    vertex_weight: DataFrame | None = None,
    include_self: bool = True,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Deterministic synchronous LPA. Returns (vid, label).

    max_iterations mirrors the reference's maxIterations param
    (label_propagation.py:338-339; Neptune default 10 -- we default to
    20 to converge on larger test graphs; sync LPA may oscillate on
    bipartite structures, so the cap is part of the semantics).
    """
    spark = graph.spark
    vertices = graph.vertices.select("vid")
    edges = graph.symmetric_edges() if not graph.directed else (
        # undirected view for community detection, reference double-insert style
        graph.edges.unionByName(graph.reversed_edges())
    )
    if weight is not None and weight in edges.columns:
        edges = edges.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        edges = edges.select("src", "dst", F.lit(1.0).alias("w"))
    edges = edges.where(F.col("src") != F.col("dst"))
    if graph.directed:
        # NetworkX to_undirected() semantics: a digraph holding BOTH
        # (a,b) and (b,a) contributes ONE undirected neighbor edge, not
        # a double-weight vote. Collapse reciprocal duplicates (max
        # weight, deterministic; distinct for the unweighted w=1 case).
        edges = edges.groupBy("src", "dst").agg(F.max("w").alias("w"))
    if vertex_weight is not None:
        # effective message weight = vertex_weight(src) * edge_weight
        edges = edges.join(
            vertex_weight.select(F.col("vid").alias("src"), F.col("vw")), "src", "left"
        ).select("src", "dst", (F.col("w") * F.coalesce("vw", F.lit(1.0))).alias("w"))
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    cp = checkpoint or CheckpointManager(spark, algorithm="label_propagation")
    labels = cp.truncate(vertices.select("vid", F.col("vid").alias("label")))
    # resume from a durable checkpoint (state = current label vector)
    start_iter, already_done = 0, False
    resumed = cp.resume()
    if resumed is not None:
        state, manifest = resumed
        labels = cp.truncate(state.select("vid", "label"))
        start_iter = int(manifest["metrics"]["iteration"]) + 1
        already_done = bool(manifest.get("complete"))
    for it in range(start_iter, 0 if already_done else max_iterations):
        msgs = (
            edges.join(labels, edges.src == labels.vid)
            .select(F.col("dst").alias("vid"), "label", "w")
        )
        if include_self:
            msgs = msgs.unionByName(
                labels.select("vid", "label", F.lit(1.0).alias("w"))
            )
        votes = msgs.groupBy("vid", "label").agg(F.sum("w").alias("wt"))
        new_labels = (
            votes.groupBy("vid")
            .agg(F.max(F.struct(F.col("wt"), (-F.col("label")).alias("nl"))).alias("b"))
            .select("vid", (-F.col("b.nl")).cast("long").alias("label"))
        )
        new_labels = cp.checkpoint(new_labels, IterationMetrics(iteration=it))
        changed = (
            new_labels.join(labels.select("vid", F.col("label").alias("old")), "vid")
            .where("label != old")
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            cp.finalize(it, state=labels)
            break
    edges.unpersist()
    return labels


def communities(labels: DataFrame) -> DataFrame:
    """Result shaping to the reference's community-members form
    (collect(nodeId) per community, opencypher_builder.py:745-753)."""
    return labels.groupBy("label").agg(
        F.sort_array(F.collect_list("vid")).alias("members")
    )
