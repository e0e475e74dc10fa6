"""Vectorized html -> text / links extraction (Arrow pandas UDFs).

North-rule contract (BASELINE.json input_hint): extraction runs as
vectorized pandas/Arrow UDFs -- no per-row Python in the Spark plan --
and produces **byte-identical extracted text per url** across runs,
partitionings and cluster sizes. The extractor is pure-Python stdlib
(re + html.unescape), no locale- or platform-dependent libraries
(SURVEY.md §7.2), so output is deterministic everywhere.

Extraction spec (golden-pinned by tests/test_extraction.py):
  1. decode bytes as UTF-8 (errors='replace')
  2. drop <script>..</script> and <style>..</style> blocks
     (case-insensitive, dot-matches-newline)
  3. drop <!-- comments -->
  4. replace every remaining tag <...> with a single space
  5. html.unescape entities
  6. collapse all whitespace runs to a single space, strip

This replaces the reference's per-row ``iterrows()`` graph build
(/root/reference/integ_test/utils/test_utils.py:65-69) with Arrow
batches: each UDF call processes spark.sql.execution.arrow
.maxRecordsPerBatch rows at once inside pandas string ops.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
# `href` must start an attribute: either immediately after `<a ` or
# preceded by whitespace — a bare lazy [^>]*? would match the suffix of
# data-href/xlink:href and extract the wrong URL.
_HREF_RE = re.compile(
    r"""<a\s+(?:[^>]*?\s)?href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE
)


def _extract_text_one(raw: bytes | str | None) -> str | None:
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


_ORIGIN_RE = re.compile(r"^https?://[^/]*", re.IGNORECASE)


def _resolve_href(base_url: str | None, href: str) -> str:
    """urljoin with fast paths for the two dominant shapes (absolute
    http(s) and root-relative) -- byte-identical to urljoin for them
    (dot-segment refs fall through to urljoin, which normalizes)."""
    if (
        "#" not in href  # urljoin drops an empty trailing fragment
        and "?" not in href  # ... and an empty trailing query
        and (
            "." not in href  # cheap common case
            or all(seg not in (".", "..") for seg in href.split("/"))
        )  # urljoin normalizes dot segments
    ):
        if href.startswith(("http://", "https://")):
            return href
        if base_url and href.startswith("/") and not href.startswith("//"):
            m = _ORIGIN_RE.match(base_url)
            if m:
                return m.group(0) + href
    return urljoin(base_url, href) if base_url else href


def _extract_links_one(raw: bytes | str | None, base_url: str | None) -> list[str]:
    if raw is None:
        return []
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    out = []
    for m in _HREF_RE.finditer(s):
        href = m.group(1) if m.group(1) is not None else m.group(2)
        href = _html.unescape(href.strip())
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        resolved = _resolve_href(base_url, href)
        if resolved.startswith(("http://", "https://")):
            out.append(resolved)
    return out


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(_extract_text_one)


@pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [_extract_links_one(h, b) for h, b in zip(html, base_url)]
    )


def pages_to_link_pairs(pages, dedup: bool = True):
    """pages(url, html, ...) -> DataFrame(src_name, dst_name): one row per
    extracted link, self-links dropped, duplicate links deduplicated
    (simple-graph semantics). Plan: one pandas-UDF projection, one
    explode -- no shuffle until the id-dictionary join.

    ``dedup=False`` skips the distinct so a caller that maps names to
    dense ids can dedup on the (8-byte) id pair instead of the string
    pair — identical result under a bijective dictionary, ~5x fewer
    shuffle bytes for the dedup exchange (guide §2.3)."""
    out = (
        pages.select(
            F.col("url").alias("src_name"),
            F.explode(extract_links(F.col("html"), F.col("url"))).alias("dst_name"),
        )
        .where(F.col("src_name") != F.col("dst_name"))
    )
    return out.distinct() if dedup else out
