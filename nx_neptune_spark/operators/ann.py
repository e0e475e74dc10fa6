"""Similarity search over embedding columns (array<float>).

Two paths (SURVEY/driver requirement for training-data pipelines):

  * brute_force_topk -- exact cosine top-k: broadcast the (small) query
    set against the corpus, dot products via zip_with/aggregate
    (JVM-side higher-order functions, no UDF), per-query top-k via a
    window. The baseline and the verifier for the approximate path.

  * lsh_topk -- random-hyperplane LSH: embeddings are quantized to
    integers (round(x*1000)) and hashed against deterministic integer
    hyperplanes, so bucket assignment is exact integer math --
    reproducible across engines and cluster sizes (no float-sum
    ordering hazards). Candidates = same bucket in any of L tables;
    exact cosine re-rank within candidates. At 10^9 vectors this is the
    scale path: bucket join instead of cross join.

  * near_duplicate_pairs -- embedding-cosine near-dup (pairs above a
    cosine threshold) via the same LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Q_SCALE = 1000  # quantization for integer LSH


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, cosine, rank). Self-matches
    (same id) are excluded. Queries are broadcast (they are the small
    side by construction)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplane(dim: int, table: int, plane: int) -> list[int]:
    """Deterministic integer hyperplane in [-500, 500]^dim (pseudo-random
    via multiplicative hashing of (table, plane, i); reproducible in SQL)."""
    return [
        ((((i + 1) * 2654435761 + (table * 97 + plane) * 40503 + 12345) % 1009) - 504)
        for i in range(dim)
    ]


def lsh_bucket_keys(
    vec: Column, dim: int, tables: int = 4, planes: int = 8
) -> Column:
    """Array of `tables` bucket keys; key = bit-string of hyperplane
    signs over the *quantized* vector (exact integer dot products).
    Thin public wrapper over the single key encoder
    (_plane_dots/_keys_from_dots) so the key format has exactly one
    source of truth."""
    return _keys_from_dots(_plane_dots(vec, dim, tables, planes), tables, planes, 0)


def _plane_dots(vec: Column, dim: int, tables: int, planes: int) -> Column:
    """All tables*planes quantized hyperplane dot products in ONE array
    column: one zip_with/aggregate pass per plane over a SHARED
    quantized-vector subexpression. Materializing this array behind a
    projection barrier means downstream key expressions are cheap bit
    ops instead of re-embedded 64-dim aggregates (which Catalyst would
    otherwise re-evaluate per key variant -- the difference between
    O(planes) and O(planes * probe-variants) dot products per row)."""
    qv = F.transform(vec, lambda x: F.round(x.cast("double") * Q_SCALE).cast("long"))
    hps = F.array(
        *[
            F.array(*[F.lit(v) for v in _hyperplane(dim, t, p)])
            for t in range(tables)
            for p in range(planes)
        ]
    )
    return F.transform(
        hps,
        lambda hp: F.aggregate(
            F.zip_with(qv, hp, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _keys_from_dots(
    dots: Column, tables: int, planes: int, probe_bits: int
) -> Column:
    """Bucket-key array from the materialized dot array. probe_bits=0
    -> the exact keys only (corpus side); >=1 adds all Hamming-<=probe_bits
    variants (query side). Key format matches lsh_bucket_keys."""
    from itertools import combinations

    flip_sets: list[tuple[int, ...]] = [()]
    if probe_bits >= 1:
        flip_sets += [(i,) for i in range(planes)]
    if probe_bits >= 2:
        flip_sets += list(combinations(range(planes), 2))
    keys = []
    for t in range(tables):
        base_bits = [
            F.element_at(dots, t * planes + p + 1) > 0 for p in range(planes)
        ]
        for flips in flip_sets:
            keys.append(
                F.concat(
                    F.lit(f"t{t}:"),
                    *[
                        F.when(
                            ~b if p in flips else b, F.lit("1")
                        ).otherwise(F.lit("0"))
                        for p, b in enumerate(base_bits)
                    ],
                )
            )
    return F.array(*keys)


def _exploded_buckets(
    df: DataFrame,
    dim: int,
    tables: int,
    planes: int,
    probe_bits: int,
    out_cols: list,
    vec_col: str,
) -> DataFrame:
    """(out_cols..., bucket) with one row per (row, bucket key); the
    plane-dot array is materialized by an intermediate projection."""
    with_dots = df.select(
        *out_cols, _plane_dots(F.col(vec_col), dim, tables, planes).alias("__dots")
    )
    return with_dots.select(
        *with_dots.columns[:-1],
        F.explode(
            _keys_from_dots(F.col("__dots"), tables, planes, probe_bits)
        ).alias("bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    tables: int = 4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
    probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: same output shape as brute_force_topk but only
    scoring candidates that share an LSH bucket in any table (queries
    additionally probe all buckets within Hamming distance
    ``probe_bits`` when ``multiprobe``)."""
    c = _exploded_buckets(
        corpus,
        dim,
        tables,
        planes,
        0,
        [F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")],
        vec_col,
    )
    q = _exploded_buckets(
        queries,
        dim,
        tables,
        planes,
        probe_bits if multiprobe else 0,
        [F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")],
        vec_col,
    )
    cand = (
        c.join(q, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "cv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def near_duplicate_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    tables: int = 4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    probe_bits: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a, b, cosine >= threshold),
    candidates restricted to shared LSH buckets. With ``multiprobe`` the
    left join side emits 1-bit-adjacent probe keys too, so any pair
    whose table keys differ by <= probe_bits becomes a candidate
    (Hamming adjacency is symmetric, so probing one side covers both
    orders)."""
    # one plane-dot pass for the whole corpus; the lazy localCheckpoint
    # materializes it at job time serving BOTH join sides (otherwise
    # Catalyst re-evaluates the tables*planes dot products per side)
    wd = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _plane_dots(F.col(vec_col), dim, tables, planes).alias("__dots"),
    ).localCheckpoint(eager=False)
    c = wd.select(
        "id", "v",
        F.explode(_keys_from_dots(F.col("__dots"), tables, planes, 0)).alias("bucket"),
    )
    cl = (
        wd.select(
            "id", "v",
            F.explode(
                _keys_from_dots(F.col("__dots"), tables, planes, probe_bits)
            ).alias("bucket"),
        )
        if multiprobe
        else c
    )
    pairs = (
        cl.alias("l")
        .join(c.alias("r"), "bucket")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    return (
        pairs.select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
