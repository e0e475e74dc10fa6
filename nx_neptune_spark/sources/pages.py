"""Deterministic synthetic Common-Crawl-style page table.

BASELINE.json input_hint schema: (url string, warc_ts timestamp,
html binary, text string, lang string). The generator is pure Catalyst
(spark.range + column expressions, zero Python in the data path), so a
10^12-row table generates distributed with no driver loop and no UDF --
the same generator runs at sf0.001 for tests and at any scale for bench.

The link structure is seeded and power-law-skewed: each page links to
1..MAX_OUT targets; a slice of targets is squashed toward low page ids
(quadratic transform), making low-id pages hubs -- this exercises the
engine's skew handling exactly like a real web crawl would.

``text`` is the *golden* extraction output: generate_pages builds html
FROM the text parts, and the pandas-UDF extractor
(functions/extraction.py) must recover ``text`` byte-identically
(north-rule per-row invariant).

Hash split (deliberate): the LINK STRUCTURE (out-degree + target ids)
is seeded with the portable md5-based :func:`~nx_neptune_spark.
functions.hashing.hash60`, so a DuckDB oracle can regenerate the exact
edge set and verify the full extract -> dictionary -> PageRank pipeline
end-to-end (:func:`link_edges_sql` below IS that oracle CTE -- kept
adjacent to the Spark recipe so the two cannot drift). The text/lang
PAYLOAD stays on ``xxhash64`` (JVM-side, ~20x cheaper per word at
10^12-row scale); its invariant -- extractor output byte-identical to
the golden ``text`` column -- is verified Spark-side by
tests/test_extraction.py and never needs a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql

VOCAB = [
    "web", "graph", "page", "rank", "link", "crawl", "index", "query",
    "node", "edge", "data", "lake", "spark", "scale", "shard", "merge",
    "hash", "join", "score", "walk",
]
LANGS = ["en", "de", "fr", "es", "zh", "ja"]
MAX_OUT = 8
HUB_FRACTION_MOD = 5  # every 5th link is squashed toward hub ids


#: bound on the uniform draw for target selection; fits h**3 in a double
TARGET_RES = 1_000_000


def _word(seed: Column) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(vocab, (F.pmod(F.xxhash64(seed), F.lit(len(VOCAB))) + 1).cast("int"))


def _h60(prefix: str, *cols: Column) -> Column:
    """Portable seed hash: hash60('<prefix>:' || c1 || ':' || c2 ...)."""
    parts: list[Column] = [F.lit(prefix)]
    for c in cols:
        parts.append(c.cast("string"))
    return hash60(F.concat_ws(":", *parts))


def generate_pages(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """DataFrame(url, warc_ts, html, text, lang) with n rows, deterministic."""
    df = spark.range(n).withColumnRenamed("id", "pid")
    s = F.lit(seed)

    title = F.concat(F.lit("Page "), F.col("pid").cast("string"))
    n_words = (F.pmod(F.xxhash64("pid", s + 1), F.lit(24)) + 8).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: _word(F.col("pid") * 1000 + i * 7 + s),
        ),
        " ",
    )
    n_links = (F.pmod(_h60("nl", F.col("pid"), s), F.lit(MAX_OUT)) + 1).cast("int")
    # target id: mostly uniform, every HUB_FRACTION_MOD-th squashed
    # quadratically. Mirrored EXACTLY by link_edges_sql below (same md5
    # seed strings, same left-assoc double arithmetic) -- edit both.
    def target(j: Column) -> Column:
        h = F.pmod(_h60("tg", F.col("pid"), j, s), F.lit(TARGET_RES))
        u = h / F.lit(float(TARGET_RES))
        uniform = F.floor(u * n).cast("long")
        hubbed = F.floor(u * u * u * n).cast("long")
        t = F.when(F.pmod(j, F.lit(HUB_FRACTION_MOD)) == 0, hubbed).otherwise(uniform)
        return F.least(t, F.lit(n - 1))

    link_ids = F.filter(
        F.transform(F.sequence(F.lit(1), n_links), target),
        lambda t: t != F.col("pid"),  # no self-links
    )
    anchors_html = F.array_join(
        F.transform(
            link_ids,
            lambda t, i: F.concat(
                F.lit('<a href="/page/'),
                t.cast("string"),
                F.lit('">ref '),
                t.cast("string"),
                F.lit("</a> "),
            ),
        ),
        "",
    )
    anchor_texts = F.array_join(
        F.transform(link_ids, lambda t: F.concat(F.lit("ref "), t.cast("string"))),
        " ",
    )
    html_str = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit('</title><style>body{margin:0}</style><script>var x=1;</script>'
              "</head><body><h1>"),
        title,
        F.lit("</h1><p>"),
        body,
        F.lit("</p><div>"),
        anchors_html,
        F.lit("</div></body></html>"),
    )
    # golden text: what the extractor's spec produces from html_str
    text = F.trim(
        F.concat(
            title, F.lit(" "), title, F.lit(" "), body,
            F.when(F.size(link_ids) > 0, F.concat(F.lit(" "), anchor_texts)).otherwise(F.lit("")),
        )
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64("pid", s + 4), F.lit(len(LANGS))) + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("https://example.org/page/"), F.col("pid").cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("pid"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def link_edges_sql(n: int, seed: int = 42) -> str:
    """DuckDB CTE body regenerating generate_pages' exact edge set.

    Produces ``ids(pid)`` and ``edges(src, dst)`` -- the same DISTINCT
    self-link-free pairs that generate_pages -> extract_links ->
    LinkGraph.from_pages yields. The md5 seed strings and the
    left-associated double arithmetic mirror :func:`generate_pages`
    line-for-line; IEEE-754 ops are bit-deterministic across engines,
    so the edge sets are identical (oracle-verified per round).
    """
    h_nl = hash60_sql(f"concat_ws(':', 'nl', pid, {seed})")
    h_tg = hash60_sql(f"concat_ws(':', 'tg', pid, j, {seed})")
    return f"""
ids AS (SELECT unnest(generate_series(0, {n - 1})) AS pid),
nl AS (SELECT pid, ({h_nl} % {MAX_OUT}) + 1 AS k FROM ids),
lnk AS (SELECT pid, unnest(generate_series(1, k)) AS j FROM nl),
tg AS (SELECT pid, j, ({h_tg} % {TARGET_RES}) / {float(TARGET_RES)} AS u FROM lnk),
tpick AS (
  SELECT pid,
         least(CAST(CASE WHEN j % {HUB_FRACTION_MOD} = 0
                         THEN floor(u * u * u * {n})
                         ELSE floor(u * {n}) END AS BIGINT),
               {n - 1}) AS t
  FROM tg
),
edges AS (SELECT DISTINCT pid AS src, t AS dst FROM tpick WHERE t <> pid)
"""
