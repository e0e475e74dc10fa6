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
    # LEFT joins: an endpoint can have zero x/y-degree (e.g. x="in" on
    # a pure source) — nx yields a 0 sample there, not nothing
    return (
        e.join(
            xd.select(F.col("vid").alias("src"), F.col("deg").alias("x")),
            "src",
            "left",
        )
        .join(
            yd.select(F.col("vid").alias("dst"), F.col("deg").alias("y")),
            "dst",
            "left",
        )
        .select(
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
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


def _weighted_edges(graph: LinkGraph, symmetric: bool = False) -> DataFrame:
    """DataFrame(src, dst, w): deduplicated (symmetric when asked)
    edges with their weight, defaulting to 1.0 when the graph carries
    no weight column (nx's ``.get(weight, 1)``)."""
    base = graph.symmetric_edges() if symmetric else graph.edges
    if "weight" in base.columns:
        return base.groupBy("src", "dst").agg(F.max("weight").alias("w"))
    return base.select("src", "dst").distinct().withColumn("w", F.lit(1.0))


def weighted_degree_pairs(graph: LinkGraph, x: str = "out", y: str = "in") -> DataFrame:
    """DataFrame(x double, y double): one endpoint-STRENGTH sample per
    edge (both orientations when undirected) — nx's
    ``node_degree_xy(G, weight=...)``: the degree VALUES are weighted
    (strength = Σ incident edge weights) but each edge still counts
    once in the joint distribution (``mixing_dict`` adds 1 per pair)."""
    if x not in ("in", "out") or y not in ("in", "out"):
        raise ValueError("x and y must be 'in' or 'out'")
    if graph.directed:
        we = _weighted_edges(graph)
        out_s = we.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("deg"))
        in_s = we.groupBy(F.col("dst").alias("vid")).agg(F.sum("w").alias("deg"))
        xd = out_s if x == "out" else in_s
        yd = out_s if y == "out" else in_s
    else:
        we = _weighted_edges(graph, symmetric=True)
        deg = we.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("deg"))
        xd = yd = deg
    return (
        we.join(
            xd.select(F.col("vid").alias("src"), F.col("deg").alias("x")),
            "src",
            "left",
        )
        .join(
            yd.select(F.col("vid").alias("dst"), F.col("deg").alias("y")),
            "dst",
            "left",
        )
        .select(
            F.coalesce("x", F.lit(0.0)).alias("x"),
            F.coalesce("y", F.lit(0.0)).alias("y"),
        )
    )


def assortativity_from_weighted_pairs(pairs: DataFrame) -> float:
    """Pearson r over float strength samples (same five-sum device as
    the exact-integer path; differential-tolerance territory)."""
    row = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    if row["n"] == 0:
        raise ValueError("assortativity undefined on an empty edge set")
    n, sx, sy = float(row["n"]), float(row["sx"]), float(row["sy"])
    num = n * float(row["sxy"]) - sx * sy
    vx = n * float(row["sxx"]) - sx * sx
    vy = n * float(row["syy"]) - sy * sy
    if vx <= 0.0 or vy <= 0.0:
        return float("nan")
    return num / (vx ** 0.5 * vy ** 0.5)


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in", weight: str | None = None
) -> float:
    """``nx.degree_assortativity_coefficient`` (weighted form uses
    strengths as values and edge weight as sample multiplicity)."""
    if weight is not None:
        return assortativity_from_weighted_pairs(
            weighted_degree_pairs(graph, x, y)
        )
    return assortativity_from_pairs(degree_pairs(graph, x, y))


def average_degree_connectivity(
    graph: LinkGraph,
    source: str = "in+out",
    target: str = "in+out",
    weight: str | None = None,
) -> DataFrame:
    """``nx.average_degree_connectivity`` (nodes=None):
    DataFrame(degree long, avg_nbr_degree double) — the knn(k) curve,
    average target-degree of neighbors over all nodes of source-degree
    k. NetworkX quirks mirrored exactly: on DiGraphs the neighbor set
    for source="out" AND source="in+out" is the SUCCESSORS (nx's
    ``G.neighbors``), only source="in" walks predecessors; and a
    degree class with zero total source-degree (k=0) reports the raw
    sum (always 0) rather than dividing.

    Weighted form (Barrat et al. 2004): the grouping key k and the
    neighbor target-degrees stay UNWEIGHTED; each neighbor's degree is
    multiplied by the connecting edge's weight and the divisor becomes
    the node's strength — exactly nx's dsum/dnorm bookkeeping.

    Plan: degree tables are map-side-combined aggregates; ONE
    key-partitioned join tags each neighbor perspective with the
    target degree, one partial agg per node, one dense left join onto
    the vertex set, ONE final partial agg keyed by the (small-domain)
    degree value. Output cardinality = distinct degrees."""
    if not graph.directed and (source != "in+out" or target != "in+out"):
        raise ValueError(
            "source and target arguments are only supported for directed graphs"
        )
    if source not in ("in", "out", "in+out") or target not in (
        "in",
        "out",
        "in+out",
    ):
        raise ValueError('source/target must be "in", "out", or "in+out"')
    vertices = graph.vertices.select("vid")
    if graph.directed:
        e = graph.edges.select("src", "dst").distinct()
        out_deg, in_deg = _directed_degrees(e)
        tot_deg = (
            out_deg.withColumnRenamed("deg", "o")
            .join(in_deg.withColumnRenamed("deg", "i"), "vid", "full")
            .select(
                "vid",
                (F.coalesce("o", F.lit(0)) + F.coalesce("i", F.lit(0))).alias("deg"),
            )
        )
        pick = {"out": out_deg, "in": in_deg, "in+out": tot_deg}
        sdeg, tdeg = pick[source], pick[target]
        # nx walks successors for "out" AND "in+out" (G.neighbors on a
        # DiGraph), predecessors only for "in"
        persp = (
            e.select(F.col("dst").alias("vid"), F.col("src").alias("nbr"))
            if source == "in"
            else e.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"))
        )
    else:
        e = graph.symmetric_edges().select("src", "dst").distinct()
        deg = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
        sdeg = tdeg = deg
        persp = e.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"))
    if weight is None:
        nbr_sum = (
            persp.join(
                tdeg.select(F.col("vid").alias("nbr"), F.col("deg").alias("td")),
                "nbr",
            )
            .groupBy("vid")
            .agg(F.sum("td").alias("s"))
        )
        per_node = (
            vertices.join(sdeg, "vid", "left")
            .join(nbr_sum, "vid", "left")
            .select(
                F.coalesce("deg", F.lit(0)).alias("k"),
                F.coalesce("s", F.lit(0)).alias("s"),
            )
        )
        grouped = per_node.groupBy(F.col("k").alias("degree")).agg(
            F.sum("s").alias("dsum"), F.sum("k").alias("dnorm")
        )
        return grouped.select(
            "degree",
            F.when(F.col("dnorm") == 0, F.col("dsum").cast("double"))
            .otherwise(F.col("dsum").cast("double") / F.col("dnorm").cast("double"))
            .alias("avg_nbr_degree"),
        )
    # weighted: same topology tables; neighbor degrees scaled by the
    # connecting edge weight, divisor = strength per k class
    if graph.directed:
        we = _weighted_edges(graph)
        out_s = we.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("st"))
        in_s = we.groupBy(F.col("dst").alias("vid")).agg(F.sum("w").alias("st"))
        tot_s = (
            out_s.withColumnRenamed("st", "o")
            .join(in_s.withColumnRenamed("st", "i"), "vid", "full")
            .select(
                "vid",
                (
                    F.coalesce("o", F.lit(0.0)) + F.coalesce("i", F.lit(0.0))
                ).alias("st"),
            )
        )
        strength = {"out": out_s, "in": in_s, "in+out": tot_s}[source]
        perspw = (
            we.select(F.col("dst").alias("vid"), F.col("src").alias("nbr"), "w")
            if source == "in"
            else we.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"), "w")
        )
    else:
        we = _weighted_edges(graph, symmetric=True)
        strength = we.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("st"))
        perspw = we.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"), "w")
    nbr_sum = (
        perspw.join(
            tdeg.select(F.col("vid").alias("nbr"), F.col("deg").alias("td")), "nbr"
        )
        .groupBy("vid")
        .agg(F.sum(F.col("w") * F.col("td")).alias("s"))
    )
    per_node = (
        vertices.join(sdeg, "vid", "left")
        .join(strength, "vid", "left")
        .join(nbr_sum, "vid", "left")
        .select(
            F.coalesce("deg", F.lit(0)).alias("k"),
            F.coalesce("st", F.lit(0.0)).alias("st"),
            F.coalesce("s", F.lit(0.0)).alias("s"),
        )
    )
    grouped = per_node.groupBy(F.col("k").alias("degree")).agg(
        F.sum("s").alias("dsum"), F.sum("st").alias("dnorm")
    )
    return grouped.select(
        "degree",
        F.when(F.col("dnorm") == 0, F.col("dsum"))
        .otherwise(F.col("dsum") / F.col("dnorm"))
        .alias("avg_nbr_degree"),
    )


def average_neighbor_degree(
    graph: LinkGraph,
    source: str = "out",
    target: str = "out",
    weight: str | None = None,
) -> DataFrame:
    """``nx.average_neighbor_degree`` (nodes=None):
    DataFrame(vid long, avg_nbr_degree double) — per-node average
    target-degree over the source-direction neighbor set. NX
    semantics mirrored exactly: neighbors are predecessors when "in"
    ∈ source, successors when "out" ∈ source, BOTH for "in+out" (this
    differs from average_degree_connectivity's successors-only walk);
    the divisor is source_degree(n); degree-0 nodes report 0.0.
    Weighted form: neighbor target-degrees stay UNWEIGHTED, each
    scaled by the connecting edge weight, divisor = strength.

    Plan: same machinery as the knn(k) curve minus the final degree
    grouping — output cardinality = V."""
    if not graph.directed and (source != "out" or target != "out"):
        # nx ignores source/target on undirected graphs (adjacency
        # walk, plain degree); accept only to mirror defaults loosely
        pass
    if graph.directed and (
        source not in ("in", "out", "in+out")
        or target not in ("in", "out", "in+out")
    ):
        raise ValueError('source/target must be "in", "out", or "in+out"')
    vertices = graph.vertices.select("vid")
    if graph.directed:
        e = graph.edges.select("src", "dst").distinct()
        out_deg, in_deg = _directed_degrees(e)
        tot_deg = (
            out_deg.withColumnRenamed("deg", "o")
            .join(in_deg.withColumnRenamed("deg", "i"), "vid", "full")
            .select(
                "vid",
                (F.coalesce("o", F.lit(0)) + F.coalesce("i", F.lit(0))).alias("deg"),
            )
        )
        pick = {"out": out_deg, "in": in_deg, "in+out": tot_deg}
        sdeg, tdeg = pick[source], pick[target]
        parts = []
        if "out" in source:
            parts.append(
                e.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"))
            )
        if "in" in source:
            parts.append(
                e.select(F.col("dst").alias("vid"), F.col("src").alias("nbr"))
            )
        persp = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    else:
        e = graph.symmetric_edges().select("src", "dst").distinct()
        deg = e.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
        sdeg = tdeg = deg
        persp = e.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"))
    if weight is None:
        nbr_sum = (
            persp.join(
                tdeg.select(F.col("vid").alias("nbr"), F.col("deg").alias("td")),
                "nbr",
            )
            .groupBy("vid")
            .agg(F.sum("td").alias("s"))
        )
        return (
            vertices.join(sdeg, "vid", "left")
            .join(nbr_sum, "vid", "left")
            .select(
                "vid",
                F.when(F.coalesce("deg", F.lit(0)) == 0, F.lit(0.0))
                .otherwise(
                    F.coalesce("s", F.lit(0)).cast("double")
                    / F.col("deg").cast("double")
                )
                .alias("avg_nbr_degree"),
            )
        )
    # weighted: w-scaled unweighted target degrees / source strength
    if graph.directed:
        we = _weighted_edges(graph)
        parts = []
        if "out" in source:
            parts.append(
                we.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"), "w")
            )
        if "in" in source:
            parts.append(
                we.select(F.col("dst").alias("vid"), F.col("src").alias("nbr"), "w")
            )
        perspw = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    else:
        we = _weighted_edges(graph, symmetric=True)
        perspw = we.select(F.col("src").alias("vid"), F.col("dst").alias("nbr"), "w")
    strength = perspw.groupBy("vid").agg(F.sum("w").alias("st"))
    nbr_sum = (
        perspw.join(
            tdeg.select(F.col("vid").alias("nbr"), F.col("deg").alias("td")), "nbr"
        )
        .groupBy("vid")
        .agg(F.sum(F.col("w") * F.col("td")).alias("s"))
    )
    return (
        vertices.join(strength, "vid", "left")
        .join(nbr_sum, "vid", "left")
        .select(
            "vid",
            F.when(F.coalesce("st", F.lit(0.0)) == 0.0, F.lit(0.0))
            .otherwise(F.coalesce("s", F.lit(0.0)) / F.col("st"))
            .alias("avg_nbr_degree"),
        )
    )


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


def _attribute_pairs(
    graph: LinkGraph, attrs: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """(x, y) attribute pairs per nx.node_attribute_xy: directed edges
    once, undirected both orientations EXCEPT self-loops (once), and
    the ``nodes`` filter applies to the FIRST endpoint only."""
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        nonself = e.where(F.col("src") != F.col("dst"))
        e = e.unionByName(
            nonself.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    if nodes is not None:
        e = e.join(
            nodes.select(F.col(nodes.columns[0]).alias("src")).distinct(),
            "src",
            "left_semi",
        )
    a = attrs.select(F.col(attrs.columns[0]).alias("vid"), F.col(attrs.columns[1]).alias("att"))
    return (
        e.join(a.select(F.col("vid").alias("src"), F.col("att").alias("x")), "src")
        .join(a.select(F.col("vid").alias("dst"), F.col("att").alias("y")), "dst")
        .select("x", "y")
    )


def attribute_assortativity_coefficient(
    graph: LinkGraph, attrs: DataFrame, nodes: DataFrame | None = None
) -> float:
    """Newman Eq. (2): (tr M − ΣM²)/(1 − ΣM²) over the categorical
    mixing matrix (nx.attribute_assortativity_coefficient parity).
    Exact integer arithmetic up to the final division: with integer
    counts, r = (t·tot − s)/(tot² − s) where t = Σ diagonal counts,
    s = Σ_x rowsum_x·colsum_x — both engines reproduce the double
    bit-for-bit. The count matrix is attribute-domain-sized (never
    collected; the three aggregates below are over it)."""
    cnt = _attribute_pairs(graph, attrs, nodes).groupBy("x", "y").count()
    cnt = cnt.persist()
    row = cnt.agg(
        F.sum("count").alias("tot"),
        F.sum(F.when(F.col("x") == F.col("y"), F.col("count")).otherwise(0)).alias(
            "t"
        ),
    ).first()
    tot, t = row["tot"], row["t"]
    if tot is None or tot == 0:
        cnt.unpersist()
        return float("nan")
    rows = cnt.groupBy("x").agg(F.sum("count").alias("a"))
    cols = cnt.groupBy("y").agg(F.sum("count").alias("b"))
    s = (
        rows.join(cols, rows.x == cols.y)
        .agg(F.sum(F.col("a") * F.col("b")))
        .first()[0]
    ) or 0
    cnt.unpersist()
    denom = tot * tot - s
    if denom == 0:
        return float("nan")
    return float(t * tot - s) / float(denom)


def numeric_assortativity_coefficient(
    graph: LinkGraph, vals: DataFrame, nodes: DataFrame | None = None
) -> float:
    """Pearson r of a scalar node attribute across edges (Newman Eq.
    21; nx.numeric_assortativity_coefficient parity) — reuses the
    exact-sum Pearson of the degree machinery."""
    pairs = _attribute_pairs(graph, vals, nodes)
    return assortativity_from_pairs(pairs)
