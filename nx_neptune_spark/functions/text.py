"""Text-analysis columns for training-data pipelines.

All of these are pure Catalyst column expressions (JVM-side,
whole-stage-codegen; zero Python) so they run at 100 TB scan speed:

  * token counting: whitespace tokens + a BPE-ish regex token count
  * quality scoring: length / word-length / stopword / punctuation /
    repetition signals combined into one [0,1] score
  * language id: stopword-marker heuristic over a small per-language
    marker table
  * fingerprinting: md5 content fingerprint + sorted-token "shape"
    fingerprint (the classic fingerprint/near-dup-key trick)

Each helper returns a Column so callers compose them into selects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return punct / F.greatest(F.length(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length documents,
    3-9 char mean word length, some stopwords, low punctuation noise."""
    n = F.length(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    mwl = mean_word_length(text)
    word_score = F.when((mwl >= 3) & (mwl <= 9), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - punct_ratio(text) * 5, F.lit(0.0))
    return (len_score + word_score + sw_score + punct_penalty) / 4


def language_id(text: Column) -> Column:
    """Marker-stopword language guess; 'und' (undetermined) when no
    marker hits. Deterministic tie-break: highest count, then language
    code order."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")

    def marker_hits(lang: str):
        markers = LANG_MARKERS[lang]
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    scored = F.array(
        *[
            F.struct(
                marker_hits(lang).alias("hits"),
                F.lit(idx).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for idx, lang in enumerate(sorted(LANG_MARKERS))
        ]
    )
    best = F.array_max(
        F.transform(
            scored,
            lambda s: F.struct(s["hits"].alias("hits"), (-s["ord"]).alias("nord"), s["lang"].alias("lang")),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def content_fingerprint(text: Column) -> Column:
    """md5 of the exact content (exact-dup key)."""
    return F.md5(text)


def shape_fingerprint(text: Column) -> Column:
    """md5 of the sorted lowercase token set -- robust to word order and
    duplication (the 'rolling/shape' fingerprint for near-dup keys)."""
    toks = F.array_distinct(F.array_sort(F.split(F.lower(F.trim(text)), r"\s+")))
    return F.md5(F.array_join(toks, " "))


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021, Table A1; the
# Dolma / RedPajama reproduction conventions). All pure Catalyst
# higher-order array expressions — zero Python, whole-stage codegen —
# so they run at full scan speed per document. The per-document cost
# of the n-gram statistics is O(L^2) in the (capped) token count, the
# same budget every reproduction pays; `max_tokens` bounds it.
#
# Definitions (documented here because reproductions differ):
#   * lines = split on '\n' (empties kept);
#     dup_line_frac      = (n_lines - n_distinct_lines) / n_lines
#     dup_line_char_frac = excess duplicate-line chars / total line chars
#   * words = whitespace-split non-empty tokens, capped at max_tokens;
#     content chars      = length of the single-space re-join
#   * word n-grams keep internal spaces in their char length;
#     top_ngram_char_frac = count(top) * len(top) / content_chars where
#       "top" maximizes (count, len, ngram) lexicographically
#     dup_ngram_char_frac = sum over ngrams with count >= 2 of
#       count * len / content_chars
#     both capped at 1.0 (overlap-insensitive approximation).
# ---------------------------------------------------------------------------


def _gopher_words(text: Column, max_tokens: int) -> Column:
    ws = F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))
    return F.slice(ws, 1, max_tokens)


def _ngrams(ws: Column, n: int) -> Column:
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - n + 1),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _ngram_scan(ws: Column, n: int) -> Column:
    """struct<has: boolean, top: bigint, dup: bigint>: top = count·len
    of the most frequent n-gram (ties broken by (count, len, gram)
    max), dup = Σ count·len over n-grams with count >= 2.

    ONE pass over the SORTED gram array (run-length scan via
    ``aggregate``) instead of the naive distinct×filter nest — the
    nested form re-evaluates the gram array (and its underlying
    split) once per distinct gram under interpreted higher-order
    evaluation, turning O(L) documents into O(L²) regex work; the
    sorted scan evaluates the array exactly once."""
    g = F.array_sort(_ngrams(ws, n))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.struct(
            F.lit(0).cast("long").alias("c"),
            F.lit(0).cast("int").alias("l"),
            F.lit("").alias("g"),
        ).alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def _fold(acc, x):
        run_done = F.struct(
            acc["run"].alias("c"),
            F.length(acc["prev"]).alias("l"),
            acc["prev"].alias("g"),
        )
        new_best = F.when(
            (acc["run"] > 0) & (run_done > acc["best"]), run_done
        ).otherwise(acc["best"])
        new_dup = acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0))
        return F.when(
            x == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["best"].alias("best"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                new_best.alias("best"),
                new_dup.alias("dup"),
            )
        )

    def _finish(acc):
        run_done = F.struct(
            acc["run"].alias("c"),
            F.length(acc["prev"]).alias("l"),
            acc["prev"].alias("g"),
        )
        best = F.when(
            (acc["run"] > 0) & (run_done > acc["best"]), run_done
        ).otherwise(acc["best"])
        dup = acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0))
        return F.struct(
            (acc["run"] > 0).alias("has"),
            (best["c"] * best["l"]).cast("long").alias("top"),
            dup.cast("long").alias("dup"),
        )

    return F.aggregate(g, zero, _fold, _finish)


def dup_line_frac(text: Column) -> Column:
    lines = F.split(text, "\n")
    n = F.size(lines)
    return (n - F.size(F.array_distinct(lines))) / F.nullif(n.cast("double"), F.lit(0.0))


def dup_line_char_frac(text: Column) -> Column:
    lines = F.split(text, "\n")
    tot = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dis = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    return (tot - dis) / F.nullif(tot.cast("double"), F.lit(0.0))


def top_ngram_char_frac(text: Column, n: int, max_tokens: int = 2048) -> Column:
    ws = _gopher_words(text, max_tokens)
    scan = _ngram_scan(ws, n)
    tot = F.length(F.array_join(ws, " "))
    frac = scan["top"] / F.nullif(tot.cast("double"), F.lit(0.0))
    return F.when(scan["has"], F.least(frac, F.lit(1.0))).otherwise(F.lit(0.0))


def dup_ngram_char_frac(text: Column, n: int, max_tokens: int = 2048) -> Column:
    ws = _gopher_words(text, max_tokens)
    scan = _ngram_scan(ws, n)
    tot = F.length(F.array_join(ws, " "))
    frac = scan["dup"] / F.nullif(tot.cast("double"), F.lit(0.0))
    return F.when(scan["has"], F.least(frac, F.lit(1.0))).otherwise(F.lit(0.0))


def gopher_repetition_pass(
    text: Column, max_tokens: int = 2048
) -> Column:
    """Boolean: document clears the Gopher repetition gates (the
    Table A1 subset this module computes): dup_line_frac <= 0.30,
    dup_line_char_frac <= 0.20, top 2-gram <= 0.20, top 3-gram <=
    0.18, dup 5-gram <= 0.15."""
    return (
        (F.coalesce(dup_line_frac(text), F.lit(0.0)) <= 0.30)
        & (F.coalesce(dup_line_char_frac(text), F.lit(0.0)) <= 0.20)
        & (top_ngram_char_frac(text, 2, max_tokens) <= 0.20)
        & (top_ngram_char_frac(text, 3, max_tokens) <= 0.18)
        & (dup_ngram_char_frac(text, 5, max_tokens) <= 0.15)
    )
