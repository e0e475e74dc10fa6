"""Transitive closure / transitive reduction (path-doubling).

The reference has no reachability-materialization surface; the
closure is the standard "can page u reach page v" table for crawl
DAG analyses (redirect chains, category hierarchies, the SCC
condensation), and the reduction is its minimal generator — the
canonical de-noising step before drawing or mining a dependency DAG.

Semantics match NetworkX:

  * ``transitive_closure(G)`` — edge (u, v) iff a nonempty path
    u ⇝ v exists; ``reflexive`` mirrors nx's three-valued contract
    (measured against nx directly, tests/test_closure.py): False =
    the raw path semantics (vertices on cycles DO reach themselves),
    True additionally adds EVERY self-loop, None strips the
    cycle-derived self-pairs but keeps self-loops present in G.
  * ``transitive_reduction(G)`` — DAGs only (nx raises NetworkXError
    otherwise); the unique minimal edge set with the same closure:
    (u, v) survives iff NO w has (u, w) ∈ E and w ⇝ v.

Plan: the closure runs PATH DOUBLING — R₀ = E, R_{t+1} = R_t ∪
(R_t ∘ R_t) — so the round count is log₂(longest path), not the
diameter (the classic parallel transitive-closure recurrence,
Valiant-style). Each round is one self-join + distinct, lineage-cut
and released. The closure table is |reachable pairs| rows — output-
sized, the inherent cost of materializing reachability; on web-scale
graphs run it on the SCC condensation (operators/condensation.py),
which is exactly how the engine's DAG family is meant to compose.
The reduction is ONE join of E against the closure + one anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


def transitive_closure(
    graph: LinkGraph,
    reflexive=False,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(src long, dst long): the reachability pairs."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="closure")
    e = graph.edges.select("src", "dst").distinct()
    r = cp.truncate(e)
    n = r.count()
    rounds = 0
    while True:
        hop = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        new_r = cp.truncate(r.unionByName(hop).distinct())
        m = new_r.count()
        rounds += 1
        if m == n:
            release_local_checkpoint(r)
            r = new_r
            break
        release_local_checkpoint(r)
        r, n = new_r, m
    if stats is not None:
        stats["rounds"] = rounds
        stats["pairs"] = n
    if reflexive is True:
        r = r.unionByName(
            graph.vertices.select(
                F.col("vid").alias("src"), F.col("vid").alias("dst")
            )
        ).distinct()
    elif reflexive is None:
        # nx: drop cycle-derived self-pairs, keep G's own self-loops
        r = r.where(F.col("src") != F.col("dst")).unionByName(
            graph.edges.select("src", "dst")
            .where(F.col("src") == F.col("dst"))
            .distinct()
        )
    # reflexive=False: the raw path semantics as computed
    return r


def transitive_reduction(
    graph: LinkGraph,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """DataFrame(src long, dst long): the unique minimal DAG edge set
    with the same closure. Raises ValueError on cyclic input (the
    adapter maps it to nx.NetworkXError)."""
    closure = transitive_closure(graph, reflexive=False, checkpoint=checkpoint)
    if not closure.where(F.col("src") == F.col("dst")).isEmpty():
        raise ValueError(
            "Directed Acyclic Graph required for transitive_reduction"
        )
    e = graph.edges.select("src", "dst").distinct()
    redundant = (
        e.alias("e")
        .join(e.alias("f"), F.col("e.src") == F.col("f.src"))
        .join(
            closure.alias("c"),
            (F.col("f.dst") == F.col("c.src"))
            & (F.col("c.dst") == F.col("e.dst")),
        )
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .distinct()
    )
    return e.join(redundant, ["src", "dst"], "left_anti")
