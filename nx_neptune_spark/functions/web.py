"""URL/host-level web-graph functions (webtext pipeline extensions).

Page-level link graphs at crawl scale are routinely collapsed to the
HOST level before ranking — the public Common-Crawl host-level graph
and its harmonic-centrality rankings are exactly this shape — because
the host graph is 3-4 orders of magnitude smaller while preserving
the ranking signal, and intra-host links (nav bars, footers) are
self-citation noise. The reference has no analog; this extends the
extraction surface (functions/extraction.py, SURVEY.md §2.9
extension class).

Everything here is pure Catalyst (regexp + aggregate, zero Python in
the hot path), and the host regex is pinned to the RE2/Java shared
subset so the DuckDB oracle applies the identical pattern.

Plan (the scale story): host extraction is a per-row projection
(no shuffle); the collapse is ONE map-side-combined aggregate keyed
on (src_host, dst_host) — cardinality ~#host-pairs, orders of
magnitude below the edge count; the dense-id dictionary build then
shuffles only the DISTINCT host names (LinkGraph.from_named_edges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

#: scheme://[userinfo@]HOST[:port]/... — capture group 1 = host.
#: Shared RE2 / java.util.regex subset (no lookarounds, no backrefs)
#: so Spark and the DuckDB oracle run the SAME pattern.
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url, strip_www: bool = True) -> Column:
    """Lowercased host of a URL column ('' for non-URLs); drops one
    leading 'www.' label when ``strip_www`` (the host-graph
    convention: www.x.com and x.com are one site)."""
    col = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(col, HOST_RE, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def host_link_pairs(
    named_edges: DataFrame,
    drop_intra_host: bool = True,
    strip_www: bool = True,
) -> DataFrame:
    """(src_name=url, dst_name=url) link pairs -> DataFrame(src_name=
    host, dst_name=host, weight double = #page-level links). Rows with
    an unparseable src or dst URL are dropped."""
    pairs = named_edges.select(
        url_host("src_name", strip_www).alias("src_name"),
        url_host("dst_name", strip_www).alias("dst_name"),
    ).where((F.col("src_name") != "") & (F.col("dst_name") != ""))
    if drop_intra_host:
        pairs = pairs.where(F.col("src_name") != F.col("dst_name"))
    return pairs.groupBy("src_name", "dst_name").agg(
        F.count("*").cast("double").alias("weight")
    )


def host_graph(
    pages: DataFrame,
    drop_intra_host: bool = True,
    strip_www: bool = True,
) -> LinkGraph:
    """Common-Crawl-style page table (url, html, ...) -> host-level
    LinkGraph with edge ``weight`` = page-level link count. Feed the
    result to pagerank(weight='weight') / harmonic_centrality for
    host-level rankings."""
    from .extraction import pages_to_link_pairs

    return LinkGraph.from_vertex_names(
        pages.sparkSession,
        host_link_pairs(
            pages_to_link_pairs(pages),
            drop_intra_host=drop_intra_host,
            strip_www=strip_www,
        ),
        directed=True,
    )
