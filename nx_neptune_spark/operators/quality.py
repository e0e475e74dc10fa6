"""Partition quality: coverage and performance (NetworkX parity).

``nx.community.partition_quality`` — the two classic partition scores
(Fortunato 2010 §3.3.2): coverage = intra-community edge fraction,
performance = fraction of correctly classified vertex pairs
(intra edges + absent inter pairs). The scoring complement of
modularity (operators/modularity.py) for evaluating Louvain/LPA
output at crawl scale.

Plan (the scale story): the assignment is a DataFrame(vid, community)
— never collected. intra = two key-partitioned joins tagging each
edge's endpoint communities + one scalar agg; the possible-inter-pair
count folds to (N² − Σ size²)/2 over the community-size aggregate
(community-domain cardinality), so the quadratic-over-communities loop
nx runs never materializes. Exact integers throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def partition_quality(
    graph: LinkGraph, assignment: DataFrame
) -> tuple[float, float]:
    """``nx.community.partition_quality`` parity:
    (coverage, performance). ``assignment`` = DataFrame(vid,
    community) covering every vertex (the NotAPartition validation
    lives in the dispatch layer, like modularity's)."""
    if graph.directed:
        edges = graph.edges.select("src", "dst").distinct()
    else:
        edges = (
            graph.edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
        )
    a = assignment.select("vid", "community")
    tagged = (
        edges.join(
            a.select(F.col("vid").alias("src"), F.col("community").alias("cs")),
            "src",
        )
        .join(
            a.select(F.col("vid").alias("dst"), F.col("community").alias("cd")),
            "dst",
        )
    )
    row = tagged.agg(
        F.count("*").alias("m"),
        F.coalesce(
            F.sum((F.col("cs") == F.col("cd")).cast("long")), F.lit(0)
        ).alias("intra"),
    ).first()
    m, intra = int(row["m"]), int(row["intra"])
    sizes = a.groupBy("community").agg(F.count("*").alias("s"))
    srow = sizes.agg(
        F.coalesce(F.sum("s"), F.lit(0)).alias("n"),
        F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).alias("sq"),
    ).first()
    n, sq = int(srow["n"]), int(srow["sq"])
    possible_inter = (n * n - sq) // 2
    total_pairs = n * (n - 1)
    if graph.directed:
        possible_inter *= 2
    else:
        total_pairs //= 2
    inter_edges = m - intra
    inter_non_edges = possible_inter - inter_edges
    coverage = intra / m if m else float("nan")
    performance = (intra + inter_non_edges) / total_pairs if total_pairs else 0.0
    return coverage, performance
