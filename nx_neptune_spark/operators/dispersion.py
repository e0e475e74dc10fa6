"""Dispersion (Backstrom & Kleinberg, CSCW 2014): the
"romantic-partner" tie-strength predictor.

The reference has no tie-strength surface; dispersion is the classic
beyond-embeddedness link feature — for an ego u and neighbor v, how
STRUCTURALLY SPREAD OUT their mutual neighbors are: pairs of mutual
neighbors that are neither adjacent nor short-circuited through
another of u's neighbors score 1. High dispersion + low embeddedness
is the signature of a bridge tie (for a link graph: a navigational
hub ↔ content cluster link rather than an intra-cluster one).

Semantics match ``nx.dispersion`` exactly (undirected):

    ST(u,v)   = N(u) ∩ N(v)
    disp(u,v) = |{ {s,t} ⊆ ST : t ∉ N(s)
                   and ¬∃ w ∈ N(u)∖{u,v}: w ∈ N(s) ∩ N(t) }|

with nx's normalization (total + b)^alpha / (embeddedness + c)
(division skipped when the denominator is 0). The measure is
ASYMMETRIC (the witness set lives in N(u)), so every ORIENTED
adjacent pair gets a row — exactly nx's results[u][v] table.

Plan: mutual neighbors are the linkpred wedge join; candidate pairs
are one (u,v)-keyed self-join of the ST rows (cost Σ emb², the
inherent fourth-order dispersion cost — ``max_embeddedness`` is the
stop-shingle cap for hub edges); the adjacency test is one anti-join
against the canonical edge set; the witness test is one join chain
(u,w)⨝(w,s)⨝(w,t) followed by an anti-join. Everything is
key-partitioned joins + one final (u,v) aggregate; no driver state.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def dispersion(
    graph: LinkGraph,
    normalized: bool = True,
    alpha: float = 1.0,
    b: float = 0.0,
    c: float = 0.0,
    max_embeddedness: int | None = None,
) -> DataFrame:
    """DataFrame(u long, v long, total long, emb long,
    dispersion double) — one row per ORIENTED adjacent pair
    (``nx.dispersion`` table parity; zero-dispersion pairs included)."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    canon = canon.persist(StorageLevel.MEMORY_AND_DISK)
    sym = canon.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        canon.select(F.col("b").alias("x"), F.col("a").alias("y"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # mutual neighbors: (u, v, s) with s ~ u and s ~ v, for each
    # oriented adjacent pair (u, v)
    st = (
        sym.select(F.col("x").alias("u"), F.col("y").alias("v"))
        .join(
            sym.select(F.col("x").alias("u"), F.col("y").alias("s")), "u"
        )
        .join(
            sym.select(F.col("x").alias("v"), F.col("y").alias("s")),
            ["v", "s"],
            "left_semi",
        )
        .where(F.col("s") != F.col("v"))
    )
    emb = st.groupBy("u", "v").agg(F.count("*").alias("emb"))
    if max_embeddedness is not None:
        emb = emb.where(F.col("emb") <= max_embeddedness)
        st = st.join(emb.select("u", "v"), ["u", "v"], "left_semi")
    st = st.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = (
        st.alias("l")
        .join(st.alias("r"), ["u", "v"])
        .where(F.col("l.s") < F.col("r.s"))
        .select("u", "v", F.col("l.s").alias("s"), F.col("r.s").alias("t"))
    )
    # s, t not directly connected
    pairs = pairs.join(
        canon.select(F.col("a").alias("s"), F.col("b").alias("t")),
        ["s", "t"],
        "left_anti",
    )
    # no witness w ∈ N(u) ∖ {u, v} adjacent to both s and t
    witnessed = (
        pairs.join(
            sym.select(F.col("x").alias("u"), F.col("y").alias("w")), "u"
        )
        .where(F.col("w") != F.col("v"))
        .join(
            sym.select(F.col("x").alias("w"), F.col("y").alias("s")),
            ["w", "s"],
            "left_semi",
        )
        .join(
            sym.select(F.col("x").alias("w"), F.col("y").alias("t")),
            ["w", "t"],
            "left_semi",
        )
        .select("u", "v", "s", "t")
        .distinct()
    )
    good = pairs.join(witnessed, ["u", "v", "s", "t"], "left_anti")
    totals = good.groupBy("u", "v").agg(F.count("*").alias("total"))

    base = sym.select(F.col("x").alias("u"), F.col("y").alias("v"))
    out = (
        base.join(emb, ["u", "v"], "left")
        .join(totals, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce("total", F.lit(0)).cast("long").alias("total"),
            F.coalesce("emb", F.lit(0)).cast("long").alias("emb"),
        )
    )
    if normalized:
        num = F.pow(F.col("total") + F.lit(float(b)), F.lit(float(alpha)))
        den = F.col("emb") + F.lit(float(c))
        disp = F.when(den != 0, num / den).otherwise(num)
    else:
        disp = F.col("total").cast("double")
    res = out.select("u", "v", "total", "emb", disp.alias("dispersion"))
    res = res.localCheckpoint(eager=True)
    canon.unpersist()
    sym.unpersist()
    st.unpersist()
    return res
