"""Gopher repetition filters (functions/text.py) vs hand-computed
values on pinned strings."""

import math

from pyspark.sql import functions as F

from nx_neptune_spark.functions.text import (
    dup_line_char_frac,
    dup_line_frac,
    dup_ngram_char_frac,
    gopher_repetition_pass,
    top_ngram_char_frac,
)


def _stats(spark, text, n_top=2, n_dup=5):
    df = spark.createDataFrame([(text,)], "t string")
    r = df.select(
        dup_line_frac(F.col("t")).alias("dlf"),
        dup_line_char_frac(F.col("t")).alias("dlcf"),
        top_ngram_char_frac(F.col("t"), n_top).alias("top"),
        dup_ngram_char_frac(F.col("t"), n_dup).alias("dup"),
        gopher_repetition_pass(F.col("t")).alias("ok"),
    ).collect()[0]
    return r


def test_dup_lines(spark):
    # 3 lines, one duplicated: (3-2)/3; chars (9+9+3 - 9-3)/21
    r = _stats(spark, "a b a b c\na b a b c\nx y")
    assert math.isclose(r["dlf"], 1 / 3)
    assert math.isclose(r["dlcf"], 9 / 21)
    assert r["ok"] is False


def test_top_ngram_coverage(spark):
    # tokens: a b a b c a b a b c x y -> top 2-gram "a b" x4, len 3;
    # content chars = 12 tokens + 11 spaces = 23
    r = _stats(spark, "a b a b c a b a b c x y")
    assert math.isclose(r["top"], 12 / 23)


def test_top_ngram_tiebreak_prefers_longest(spark):
    # all 2-grams unique -> tie on count, take longest ("three four")
    r = _stats(spark, "one two three four five")
    assert math.isclose(r["top"], 10 / 23)


def test_dup_ngram_and_cap(spark):
    # "w w w w w w": every 5-gram identical ("w w w w w" x2), cov
    # 2*9=18 > content 11 -> capped at 1.0
    r = _stats(spark, "w w w w w w")
    assert r["dup"] == 1.0
    assert r["ok"] is False


def test_clean_and_empty_docs_pass(spark):
    long_clean = " ".join(f"tok{i}" for i in range(40))
    assert _stats(spark, long_clean)["ok"] is True
    r = _stats(spark, "")
    assert r["ok"] is True
    assert r["top"] == 0.0 and r["dup"] == 0.0


def test_short_docs_no_ngrams(spark):
    # fewer tokens than n -> zero fractions, no nulls
    r = _stats(spark, "single")
    assert r["top"] == 0.0 and r["dup"] == 0.0


def test_cross_doc_chunk_stats(spark):
    from nx_neptune_spark.operators.dedup import cross_doc_chunk_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x y"),      # chunk1 shared with doc 2
            (2, "a b c d e f g h q r"),
            (3, "totally different words here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cross_doc_chunk_stats(docs).collect()}
    assert rows[1]["n_chunks"] == 2 and rows[1]["dup_chunks"] == 1
    assert rows[2]["n_chunks"] == 2 and rows[2]["dup_chunks"] == 1
    assert rows[3]["dup_chunks"] == 0
    assert rows[4]["n_chunks"] == 0 and rows[4]["dup_chunk_frac"] == 0.0
    assert abs(rows[1]["dup_chunk_frac"] - 0.5) < 1e-12
