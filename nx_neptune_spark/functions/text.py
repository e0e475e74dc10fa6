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
