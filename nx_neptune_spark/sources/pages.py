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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "web", "graph", "page", "rank", "link", "crawl", "index", "query",
    "node", "edge", "data", "lake", "spark", "scale", "shard", "merge",
    "hash", "join", "score", "walk",
]
LANGS = ["en", "de", "fr", "es", "zh", "ja"]
MAX_OUT = 8
HUB_FRACTION_MOD = 5  # every 5th link is squashed toward hub ids


def _word(seed: Column) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(vocab, (F.pmod(F.xxhash64(seed), F.lit(len(VOCAB))) + 1).cast("int"))


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
    n_links = (F.pmod(F.xxhash64("pid", s + 2), F.lit(MAX_OUT)) + 1).cast("int")
    # target id: mostly uniform, every HUB_FRACTION_MOD-th squashed quadratically
    def target(j: Column) -> Column:
        h = F.pmod(F.xxhash64(F.col("pid") * 131 + j * 17, s + 3), F.lit(1000000))
        u = h / F.lit(1000000.0)
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
