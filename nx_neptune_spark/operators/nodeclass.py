"""Semi-supervised node classification: harmonic function and
local-and-global consistency (NetworkX parity).

Zhu, Ghahramani & Lafferty ICML'03 (harmonic function) and Zhou et
al. NIPS'04 (local and global consistency): spread a handful of seed
labels over the graph by iterated neighborhood averaging — at crawl
scale this IS distributed weak labeling (spread language/topic/spam
seeds over the link graph), the graph-side sibling of the dedup/
quality operators the driver mandates.

Matches ``nx.node_classification.harmonic_function`` /
``local_and_global_consistency``:

    harmonic: P = D⁻¹·A with labeled ROWS zeroed; F ← P·F + 1·onehot
    lgc:      P = α·D^{−1/2}·A·D^{−1/2};          F ← P·F + (1−α)·onehot

run for exactly ``max_iter`` iterations (nx default 30), then
argmax per vertex with nx's tie rule (np.argmax = lowest class index,
classes indexed by sorted label; an all-zero row falls to class 0).
Undirected graphs only — nx's directed behavior silently normalizes
rows by COLUMN sums (an adjacency-orientation artifact), so digraphs
raise here.

Plan (the scale story): label state F is a SPARSE DataFrame
(vid, cls, f) — rows only where mass is nonzero, so k seed classes
cost ≤ |V|·k rows and typically far less. Each iteration is ONE
key-partitioned edges⨝F join + one (vid, cls) partial aggregate +
a unionByName with the broadcast-size seed frame — the LPA/PageRank
exchange budget times one — with per-iteration lineage cuts. The
argmax is one max_by aggregate. No driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.checkpoint import CheckpointManager


def _prep(graph: LinkGraph, labels: DataFrame, weight: str | None):
    """(edges(u,v,w), deg(vid,d), seeds(vid, cls), classes) — shared
    setup; classes = sorted distinct labels (nx's np.unique order)."""
    if graph.directed:
        raise NotImplementedError(
            "node classification is implemented for undirected graphs "
            "(nx's directed form normalizes rows by column sums — an "
            "adjacency artifact, not a semantics)"
        )
    sym = graph.symmetric_edges()
    if weight is not None and "weight" in sym.columns:
        e = sym.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    else:
        e = sym.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    deg = e.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("d"))
    classes = [
        r["label"] for r in labels.select("label").distinct().orderBy("label").collect()
    ]
    if not classes:
        raise ValueError("No node on the input graph is labeled")
    cls_idx = {c: i for i, c in enumerate(classes)}
    mapping = F.create_map(
        *[x for c, i in cls_idx.items() for x in (F.lit(c), F.lit(i))]
    )
    seeds = labels.select("vid", mapping[F.col("label")].alias("cls"))
    return e, deg, seeds, classes


def _argmax_labels(
    graph: LinkGraph, state: DataFrame, classes: list
) -> DataFrame:
    """DataFrame(vid, label): np.argmax semantics — highest f, ties to
    the lowest class index, vertices with no positive mass to class 0."""
    best = (
        state.where(F.col("f") > 0)
        .groupBy("vid")
        .agg(
            F.max(
                F.struct(F.col("f"), (-F.col("cls")).alias("neg"))
            ).alias("m")
        )
        .select("vid", (-F.col("m.neg")).cast("int").alias("cls"))
    )
    arr = F.array(*[F.lit(c) for c in classes])
    return (
        graph.vertices.select("vid")
        .join(best, "vid", "left")
        .select(
            "vid",
            F.element_at(arr, F.coalesce(F.col("cls"), F.lit(0)) + 1).alias(
                "label"
            ),
        )
    )


def harmonic_function(
    graph: LinkGraph,
    labels: DataFrame,
    max_iter: int = 30,
    weight: str | None = "weight",
) -> DataFrame:
    """``nx.node_classification.harmonic_function`` parity:
    DataFrame(vid, label). ``labels`` = DataFrame(vid, label) of the
    seed assignments."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="harmonic_function")
    e, deg, seeds, classes = _prep(graph, labels, weight)
    # P rows for UNLABELED sources only (labeled rows zeroed)
    p = (
        e.join(deg.select(F.col("vid").alias("src"), "d"), "src")
        .join(seeds.select(F.col("vid").alias("src")), "src", "left_anti")
        .select("src", "dst", (F.col("w") / F.col("d")).alias("p"))
        .persist()
    )
    b = seeds.select("vid", "cls", F.lit(1.0).alias("f"))
    # nx starts from F = 0, so its first iteration yields exactly B:
    # seed the state with B and run max_iter - 1 further iterations
    if max_iter <= 0:
        return _argmax_labels(graph, b.where(F.lit(False)), classes)
    state = cp.truncate(b)
    for _ in range(max_iter - 1):
        spread = (
            p.join(
                state.select(F.col("vid").alias("dst"), "cls", "f"), "dst"
            )
            .groupBy(F.col("src").alias("vid"), "cls")
            .agg(F.sum(F.col("p") * F.col("f")).alias("f"))
        )
        state = cp.truncate(
            spread.unionByName(b)
            .groupBy("vid", "cls")
            .agg(F.sum("f").alias("f"))
        )
    p.unpersist(blocking=False)
    return _argmax_labels(graph, state, classes)


def local_and_global_consistency(
    graph: LinkGraph,
    labels: DataFrame,
    alpha: float = 0.99,
    max_iter: int = 30,
    weight: str | None = "weight",
) -> DataFrame:
    """``nx.node_classification.local_and_global_consistency`` parity:
    DataFrame(vid, label)."""
    spark = graph.spark
    cp = CheckpointManager(spark, algorithm="lgc")
    e, deg, seeds, classes = _prep(graph, labels, weight)
    p = (
        e.join(
            deg.select(F.col("vid").alias("src"), F.col("d").alias("ds")), "src"
        )
        .join(
            deg.select(F.col("vid").alias("dst"), F.col("d").alias("dd")), "dst"
        )
        .select(
            "src",
            "dst",
            (
                F.lit(alpha) * F.col("w") / (F.sqrt("ds") * F.sqrt("dd"))
            ).alias("p"),
        )
        .persist()
    )
    b = seeds.select("vid", "cls", F.lit(1.0 - alpha).alias("f"))
    if max_iter <= 0:
        return _argmax_labels(graph, b.where(F.lit(False)), classes)
    state = cp.truncate(b)
    for _ in range(max_iter - 1):
        spread = (
            p.join(
                state.select(F.col("vid").alias("dst"), "cls", "f"), "dst"
            )
            .groupBy(F.col("src").alias("vid"), "cls")
            .agg(F.sum(F.col("p") * F.col("f")).alias("f"))
        )
        state = cp.truncate(
            spread.unionByName(b)
            .groupBy("vid", "cls")
            .agg(F.sum("f").alias("f"))
        )
    p.unpersist(blocking=False)
    return _argmax_labels(graph, state, classes)
