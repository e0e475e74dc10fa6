"""Modularity of a community assignment (NetworkX parity).

The reference dispatches community DETECTION (Louvain, LPA) to Neptune
Analytics but exposes no quality metric for the result; modularity is
the standard one (Newman 2004, "Finding and evaluating community
structure in networks") and the objective Louvain itself optimizes, so
it completes the community surface (SURVEY.md §2.9 extension class:
detect with louvain/label_propagation, score with this).

Semantics match ``nx.community.modularity`` on the undirected simple
projection (the same neighbor-set convention the other community
operators use):

    Q = Σ_c [ Σ_in(c) / (2m) − γ · (Σ_tot(c) / (2m))² ]

where Σ_in(c) is the total weight of BOTH directions of the edges
inside community c (each internal edge counted twice, the standard
2·L_c), Σ_tot(c) the summed degrees of c's members, m the total
undirected edge weight, and γ the resolution parameter.

Plan (the scale story): two key-partitioned joins tagging each
symmetric edge row with its endpoint communities (src side, then dst
side) feeding ONE map-side-combined aggregate keyed on community —
the result has at most #communities rows. 2m folds in as a broadcast
1-row cross-join, so the whole computation is lazy with zero driver
actions. No driver-side state at any vertex/edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def modularity_stats(
    graph: LinkGraph,
    communities: DataFrame,
    weight: str | None = None,
    resolution: float = 1.0,
) -> DataFrame:
    """Per-community modularity contributions:
    DataFrame(community long, in_w double, tot_w double,
    contribution double) with Q = sum(contribution).

    ``communities``: DataFrame(vid, community) covering every vertex
    (a partition — NetworkX raises for non-partitions; here uncovered
    vertices simply contribute nothing, which the api adapter guards).
    ``weight``: edge-weight column on graph.edges; None = 1.0.
    Self-loops are dropped (the simple-graph convention the other
    community operators use).
    """
    e = graph.edges.where(F.col("src") != F.col("dst"))
    if weight is not None and weight in e.columns:
        e = e.select("src", "dst", F.col(weight).cast("double").alias("w"))
    else:
        e = e.select("src", "dst", F.lit(1.0).alias("w"))
    # undirected simple projection: both directions, duplicates collapse
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).dropDuplicates(["src", "dst"])

    com = communities.select(
        F.col("vid"), F.col("community").cast("long").alias("community")
    )
    tagged = sym.join(
        com.select(F.col("vid").alias("src"), F.col("community").alias("cs")), "src"
    ).join(
        com.select(F.col("vid").alias("dst"), F.col("community").alias("cd")), "dst"
    )
    per_c = tagged.groupBy(F.col("cs").alias("community")).agg(
        F.sum(F.when(F.col("cs") == F.col("cd"), F.col("w")).otherwise(0.0)).alias(
            "in_w"
        ),
        F.sum("w").alias("tot_w"),
    )
    two_m = sym.agg(F.sum("w").alias("two_m"))
    return per_c.crossJoin(F.broadcast(two_m)).select(
        "community",
        "in_w",
        "tot_w",
        (
            F.col("in_w") / F.col("two_m")
            - F.lit(float(resolution))
            * (F.col("tot_w") / F.col("two_m"))
            * (F.col("tot_w") / F.col("two_m"))
        ).alias("contribution"),
    )


def modularity(
    graph: LinkGraph,
    communities: DataFrame,
    weight: str | None = None,
    resolution: float = 1.0,
) -> float:
    """Scalar Q (``nx.community.modularity`` return shape): one
    #communities-row aggregate collapsed to a single double."""
    row = (
        modularity_stats(graph, communities, weight=weight, resolution=resolution)
        .agg(F.sum("contribution").alias("q"))
        .first()
    )
    return float(row["q"]) if row["q"] is not None else 0.0
