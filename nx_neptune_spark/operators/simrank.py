"""SimRank similarity (Jeh & Widom, KDD 2002) as sparse pair-state
iteration.

The reference has no similarity surface beyond link prediction
(/root/reference/nx_neptune/algorithms); SimRank is the classic
"two pages are similar if similar pages link to them" recursion — the
structural-similarity member of the link-prediction family
(SURVEY.md §2.9) and the standard related-page / related-query
measure on click and link graphs.

Semantics match ``nx.simrank_similarity`` exactly:

    S(u,u) = 1
    S(u,v) = C / (|I(u)||I(v)|) · Σ_{a∈I(u), b∈I(v)} S(a,b)

with I = predecessors on digraphs, neighbors on undirected graphs
(nx's ``G.pred`` / ``G.adj`` choice), nx's *numpy-path* stopping rule
``np.allclose(prev, new, atol=tolerance)`` — i.e.
|new − old| ≤ tolerance + 1e-5·|new| over every pair (the variant the
installed nx actually runs whenever numpy is importable; the
pedagogical pure-python variant uses a different relative rule), and
nx's ExceededMaxIterations quirk (raised whenever the final permitted
iteration runs, even if that iteration converged) mirrored
bit-for-bit in the control flow.

State is the SPARSE nonzero pair set (a, b, s) — absent pairs are 0.
Support only grows (a pair enters when its in-neighbor pairs meet:
it is exactly the pairs joined by equal-length path pairs ≤ t), so
the convergence check is one left join of the new state against the
old plus one scalar max — no dense V×V matrix anywhere.

Plan per iteration: two key-partitioned joins against the in-neighbor
table (hub in-lists fan out — the inherent O(Σ|I|²) SimRank cost every
published distributed treatment pays), one (u,v) partial+final
aggregate with the degree product folded in, one union with the
diagonal. ``prune_below`` truncates the support at a similarity floor
(the standard practical SimRank cutoff) for web-scale use;
``fixed_iterations`` skips the convergence action entirely and chains
lazily with periodic lineage cuts (the PageRank discipline).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager, release_local_checkpoint


class ExceededMaxIterations(Exception):
    pass


def simrank_similarity(
    graph: LinkGraph,
    importance_factor: float = 0.9,
    max_iterations: int = 1000,
    tolerance: float = 1e-4,
    fixed_iterations: int | None = None,
    prune_below: float | None = None,
    checkpoint: CheckpointManager | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame(a long, b long, sim double): the SPARSE SimRank
    support (pairs with nonzero similarity, diagonal included; both
    orientations of each off-diagonal pair are present, matching the
    symmetric definition). Absent pairs are exactly 0."""
    spark = graph.spark
    cp = checkpoint or CheckpointManager(spark, algorithm="simrank")
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if graph.directed:
        inn = e.select(F.col("src").alias("nbr"), F.col("dst").alias("u")).distinct()
    else:
        inn = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .select(F.col("src").alias("nbr"), F.col("dst").alias("u"))
            .distinct()
        )
    inn = inn.persist(StorageLevel.MEMORY_AND_DISK)
    deg = inn.groupBy("u").agg(F.count("*").alias("d")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    diag = graph.vertices.select(
        F.col("vid").alias("a"), F.col("vid").alias("b"), F.lit(1.0).alias("sim")
    )
    s = cp.truncate(diag)
    its_run = 0
    converged = False
    n_iter = fixed_iterations if fixed_iterations is not None else max_iterations
    for it in range(n_iter):
        contrib = (
            s.join(inn.select(F.col("nbr").alias("a"), F.col("u").alias("nu")), "a")
            .join(inn.select(F.col("nbr").alias("b"), F.col("u").alias("nv")), "b")
            .where(F.col("nu") != F.col("nv"))
            .groupBy("nu", "nv")
            .agg(F.sum("sim").alias("t"))
        )
        off = (
            contrib.join(deg.select(F.col("u").alias("nu"), F.col("d").alias("du")), "nu")
            .join(deg.select(F.col("u").alias("nv"), F.col("d").alias("dv")), "nv")
            .select(
                F.col("nu").alias("a"),
                F.col("nv").alias("b"),
                (
                    F.lit(float(importance_factor))
                    * F.col("t")
                    / (F.col("du") * F.col("dv"))
                ).alias("sim"),
            )
        )
        if prune_below is not None:
            off = off.where(F.col("sim") >= prune_below)
        new_s = cp.truncate(diag.unionByName(off))
        its_run = it + 1
        if fixed_iterations is None:
            # np.allclose(prev, new, atol=tol, rtol=1e-5) over every
            # pair; support only grows, so the new-vs-old left join
            # covers all changed pairs (0==0 elsewhere)
            viol = (
                new_s.join(
                    s.select("a", "b", F.col("sim").alias("old")), ["a", "b"], "left"
                )
                .select(
                    (
                        F.abs(F.coalesce("old", F.lit(0.0)) - F.col("sim"))
                        - (
                            F.lit(float(tolerance))
                            + F.lit(1e-5) * F.abs(F.col("sim"))
                        )
                    ).alias("x")
                )
                .agg(F.max("x"))
                .collect()[0][0]
            )
            release_local_checkpoint(s)
            s = new_s
            if viol is not None and viol <= 0:
                converged = True
                break
        else:
            release_local_checkpoint(s)
            s = new_s
    if stats is not None:
        stats["iterations"] = its_run
        stats["converged"] = converged or fixed_iterations is not None
    if fixed_iterations is None and its_run == max_iterations:
        # nx raises whenever the final permitted iteration runs, even
        # if that iteration converged — mirrored exactly
        raise ExceededMaxIterations(
            f"simrank did not converge after {max_iterations} iterations."
        )
    inn.unpersist()
    deg.unpersist()
    return s
