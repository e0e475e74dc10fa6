"""Triadic census of a directed graph (NetworkX parity).

The Davis-Leinhardt triad census — counts of the 16 isomorphism
classes of 3-vertex directed graphs (003, 012, 102, 021D/U/C,
111D/U, 030T/C, 201, 120D/U/C, 210, 300) — is the classic local
structure profile of a directed network (Davis & Leinhardt 1972;
Batagelj & Mrvar 2001 "A subquadratic triad census algorithm"). The
reference has no triad surface; web link graphs are where the census
originated at scale (hierarchy vs reciprocity in link formation).

Semantics match ``nx.triadic_census(G)`` (DiGraph, no nodelist):
every unordered vertex triple counted exactly once. Self-loops are
dropped (they have no triad class). ``nodelist`` is not implemented.

Plan (the scale story, after Batagelj-Mrvar): only triples with >= 2
LINKED DYADS are enumerated — one wedge self-join of the linked-dyad
adjacency (the triangle-count exchange pattern), then THREE
key-partitioned dyad joins classify each triple via a 64-entry
literal code table (pure Catalyst, no Python). The two
single-link classes fall out by subtraction:

    012 = A·(n−2) − Σ_triples #asym-dyads-in-triple
    102 = M·(n−2) − Σ_triples #mutual-dyads-in-triple
    003 = C(n,3) − everything else

with A/M the global asym/mutual dyad counts — three bounded scalar
aggregates, no driver-side per-row state. Enumeration cost is
Σ_v deg_linked(v)² (wedges over the linked-dyad graph) — the same
budget class as triangle counting but unorientable (classification
needs every linked wedge); a super-hub of degree d contributes d²
candidate triples, so at web scale either census the host-collapsed
graph (functions/web.py) or pre-cap hub degrees explicitly.

Counts are DECIMAL(38,0): C(n,3) overflows int64 past n ≈ 3.8M
vertices, and 10¹²-document graphs need ~36 digits.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

# Ordered-pair bit layout for the triple (x < y < z):
#   bit0 x->y, bit1 y->x, bit2 x->z, bit3 z->x, bit4 y->z, bit5 z->y
# CODE_NAMES[code] = Davis-Leinhardt class of the 3-vertex digraph the
# code encodes. Derived by permutation canonicalization of the 64
# codes onto the 16 classes (each code's class = class of its minimal
# relabeling; validated against nx.triadic_census in
# tests/test_triads.py, which rebuilds the table independently).
CODE_NAMES = [
    "003", "012", "012", "102", "012", "021D", "021C", "111U",
    "012", "021C", "021U", "111D", "102", "111U", "111D", "201",
    "012", "021C", "021D", "111U", "021U", "030T", "030T", "120U",
    "021C", "030C", "030T", "120C", "111D", "120C", "120D", "210",
    "012", "021U", "021C", "111D", "021C", "030T", "030C", "120C",
    "021D", "030T", "030T", "120D", "111U", "120U", "120C", "210",
    "102", "111D", "111U", "201", "111D", "120D", "120C", "210",
    "111U", "120C", "120U", "210", "201", "210", "210", "300",
]

TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _linked_dyads(graph: LinkGraph) -> DataFrame:
    """DataFrame(a, b, fwd, rev) with a < b, one row per unordered
    vertex pair joined by >=1 edge; fwd = a->b exists, rev = b->a."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(
            F.max((F.col("src") < F.col("dst")).cast("int")).alias("fwd"),
            F.max((F.col("src") > F.col("dst")).cast("int")).alias("rev"),
        )
    )


def triadic_census(graph: LinkGraph) -> DataFrame:
    """``nx.triadic_census`` parity: DataFrame(triad string,
    count decimal(38,0)), all 16 classes present (zeros included)."""
    if not graph.directed:
        raise ValueError("triadic census is not defined for undirected graphs")
    spark = graph.spark
    dyads = _linked_dyads(graph).persist()
    # adjacency over linked dyads, both perspectives
    adj = dyads.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        dyads.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    # wedge enumeration: triples with >=2 linked dyads, found at their
    # shared vertex; a triple with 3 linked dyads appears at all three
    # centers -> distinct on the sorted triple
    w1 = adj.select("v", F.col("w").alias("w1"))
    w2 = adj.select("v", F.col("w").alias("w2"))
    triples = (
        w1.join(w2, "v")
        .where(F.col("w1") < F.col("w2"))
        .select(F.array_sort(F.array("v", "w1", "w2")).alias("t"))
        .select(
            F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
        )
        .distinct()
    )

    def dy(xc, yc, fa, ra):
        return dyads.select(
            F.col("a").alias(xc),
            F.col("b").alias(yc),
            F.col("fwd").alias(fa),
            F.col("rev").alias(ra),
        )

    coded = (
        triples.join(dy("x", "y", "f_xy", "r_xy"), ["x", "y"], "left")
        .join(dy("x", "z", "f_xz", "r_xz"), ["x", "z"], "left")
        .join(dy("y", "z", "f_yz", "r_yz"), ["y", "z"], "left")
    )
    b = {c: F.coalesce(F.col(c), F.lit(0)) for c in
         ["f_xy", "r_xy", "f_xz", "r_xz", "f_yz", "r_yz"]}
    code = (
        b["f_xy"] + b["r_xy"] * 2 + b["f_xz"] * 4 + b["r_xz"] * 8
        + b["f_yz"] * 16 + b["r_yz"] * 32
    )
    linked = [
        (b["f_xy"], b["r_xy"]), (b["f_xz"], b["r_xz"]), (b["f_yz"], b["r_yz"])
    ]
    asym_d = sum(
        ((f + r) == 1).cast("int") for f, r in linked
    )
    mut_d = sum(((f + r) == 2).cast("int") for f, r in linked)
    name_arr = F.array(*[F.lit(nm) for nm in CODE_NAMES])
    classified = coded.select(
        F.element_at(name_arr, code.cast("int") + 1).alias("triad"),
        asym_d.alias("asym_d"),
        mut_d.alias("mut_d"),
    ).persist()

    counted = {
        r["triad"]: int(r["cnt"])
        for r in classified.groupBy("triad").agg(F.count("*").alias("cnt")).collect()
    }
    sums = classified.agg(
        F.coalesce(F.sum("asym_d"), F.lit(0)).alias("sa"),
        F.coalesce(F.sum("mut_d"), F.lit(0)).alias("sm"),
    ).first()
    dyad_counts = dyads.agg(
        F.coalesce(
            F.sum(((F.col("fwd") + F.col("rev")) == 1).cast("long")), F.lit(0)
        ).alias("A"),
        F.coalesce(
            F.sum(((F.col("fwd") + F.col("rev")) == 2).cast("long")), F.lit(0)
        ).alias("M"),
    ).first()
    classified.unpersist()
    dyads.unpersist()

    n = graph.num_vertices()
    a_cnt, m_cnt = int(dyad_counts["A"]), int(dyad_counts["M"])
    census: dict[str, int] = {nm: 0 for nm in TRIAD_NAMES}
    census.update(counted)
    census["012"] = a_cnt * (n - 2) - int(sums["sa"]) if n >= 2 else 0
    census["102"] = m_cnt * (n - 2) - int(sums["sm"]) if n >= 2 else 0
    total_linked = sum(v for k, v in census.items() if k != "003")
    census["003"] = n * (n - 1) * (n - 2) // 6 - total_linked
    rows = [(nm, Decimal(census[nm])) for nm in TRIAD_NAMES]
    return spark.createDataFrame(rows, "triad string, count decimal(38,0)")
