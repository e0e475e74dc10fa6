"""Degree assortativity (NetworkX parity).

Degree assortativity — the Pearson correlation of endpoint degrees
across edges (Newman 2002, "Assortative mixing in networks") — is the
standard one-number summary of hub wiring in a link graph: the web is
famously DISassortative (hubs link to leaves), and the reference's
directed dispatch surface has no measure of it. Semantics match
``nx.degree_assortativity_coefficient(G, x, y)`` with ``weight=None``:

  directed:   one (x_deg(u), y_deg(v)) sample per directed edge,
              x/y each 'in' or 'out' (nx default x='out', y='in')
  undirected: each edge sampled in BOTH orientations (nx's
              ``degree_mixing_xy`` appends (y, x) too)

Self-loops follow the simple-graph reading (a self-loop adds 1 to
each directional degree); NetworkX's undirected degree counts a
self-loop twice, so differential fixtures are self-loop-free.

Plan (the scale story): degrees are TWO map-side-combined aggregates
over the deduplicated edge set; two key-partitioned vid joins tag each
edge with its endpoint degrees; the coefficient collapses in ONE
partial aggregate of five integer sums (n, Σx, Σy, Σxy, Σx², Σy²) —
exact in int64/double far past web scale — and the final arithmetic

    r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))

is a fixed IEEE sequence, reproducible bit-for-bit by any engine that
computes the same integer sums (the device the DuckDB oracle uses).
No windows, no iteration, no driver state beyond the one result row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _directed_degrees(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    out_deg = e.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    return out_deg, in_deg


def degree_pairs(graph: LinkGraph, x: str = "out", y: str = "in") -> DataFrame:
    """DataFrame(x long, y long): one endpoint-degree sample per edge
    (both orientations when undirected) — the joint distribution nx
    calls ``degree_mixing_xy``."""
    if x not in ("in", "out") or y not in ("in", "out"):
        raise ValueError("x and y must be 'in' or 'out'")
    if graph.directed:
        e = graph.edges.select("src", "dst").distinct()
        out_deg, in_deg = _directed_degrees(e)
        xd = out_deg if x == "out" else in_deg
        yd = out_deg if y == "out" else in_deg
    else:
        # both orientations of every undirected edge: degree of both
        # ends, each edge contributing two samples (nx parity)
        e = graph.symmetric_edges().select("src", "dst").distinct()
        deg = e.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").alias("deg")
        )
        xd = yd = deg
    return (
        e.join(xd.select(F.col("vid").alias("src"), F.col("deg").alias("x")), "src")
        .join(yd.select(F.col("vid").alias("dst"), F.col("deg").alias("y")), "dst")
        .select("x", "y")
    )


def assortativity_from_pairs(pairs: DataFrame) -> float:
    """Pearson r from exact integer sums (see module docstring)."""
    row = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n, sx, sy = row["n"], row["sx"], row["sy"]
    if n == 0:
        raise ValueError("assortativity undefined on an empty edge set")
    num = float(n * row["sxy"] - sx * sy)
    vx = float(n * row["sxx"] - sx * sx)
    vy = float(n * row["syy"] - sy * sy)
    if vx <= 0.0 or vy <= 0.0:
        return float("nan")  # constant margin: nx returns nan too
    return num / (vx ** 0.5 * vy ** 0.5)


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in"
) -> float:
    """``nx.degree_assortativity_coefficient`` (weight=None)."""
    return assortativity_from_pairs(degree_pairs(graph, x, y))


def directed_assortativity_profile(graph: LinkGraph) -> DataFrame:
    """All four directed coefficients in ONE lazy plan / one pass:
    1-row DataFrame(r_out_in, r_out_out, r_in_in, r_in_out double).
    Two degree aggregates + two key-partitioned joins tag each edge
    with (src out/in, dst out/in); one partial aggregate collapses the
    13 exact integer sums; the coefficients are a driverless select."""
    if not graph.directed:
        raise ValueError("profile is for directed graphs")
    e = graph.edges.select("src", "dst").distinct()
    out_deg, in_deg = _directed_degrees(e)
    tagged = (
        e.join(out_deg.select(F.col("vid").alias("src"), F.col("deg").alias("xo")), "src")
        .join(
            in_deg.select(F.col("vid").alias("src"), F.col("deg").alias("xi")),
            "src",
            "left",
        )
        .join(in_deg.select(F.col("vid").alias("dst"), F.col("deg").alias("yi")), "dst")
        .join(
            out_deg.select(F.col("vid").alias("dst"), F.col("deg").alias("yo")),
            "dst",
            "left",
        )
        .select(
            "xo",
            F.coalesce("xi", F.lit(0)).alias("xi"),
            F.coalesce("yo", F.lit(0)).alias("yo"),
            "yi",
        )
    )
    sums = tagged.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.col(c)).alias(f"s_{c}")
            for c in ("xo", "xi", "yo", "yi")
        ],
        *[
            F.sum(F.col(c) * F.col(c)).alias(f"s_{c}2")
            for c in ("xo", "xi", "yo", "yi")
        ],
        F.sum(F.col("xo") * F.col("yi")).alias("s_xo_yi"),
        F.sum(F.col("xo") * F.col("yo")).alias("s_xo_yo"),
        F.sum(F.col("xi") * F.col("yi")).alias("s_xi_yi"),
        F.sum(F.col("xi") * F.col("yo")).alias("s_xi_yo"),
    )

    def r(xc: str, yc: str, cross: str):
        num = (F.col("n") * F.col(cross) - F.col(f"s_{xc}") * F.col(f"s_{yc}")).cast(
            "double"
        )
        vx = (
            F.col("n") * F.col(f"s_{xc}2") - F.col(f"s_{xc}") * F.col(f"s_{xc}")
        ).cast("double")
        vy = (
            F.col("n") * F.col(f"s_{yc}2") - F.col(f"s_{yc}") * F.col(f"s_{yc}")
        ).cast("double")
        return num / (F.sqrt(vx) * F.sqrt(vy))

    return sums.select(
        r("xo", "yi", "s_xo_yi").alias("r_out_in"),
        r("xo", "yo", "s_xo_yo").alias("r_out_out"),
        r("xi", "yi", "s_xi_yi").alias("r_in_in"),
        r("xi", "yo", "s_xi_yo").alias("r_in_out"),
    )
