"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.D "Not
present"), but a link-graph engine ingesting a live crawl needs a
streaming path: incremental edge ingestion and windowed crawl-rate
aggregation. Built on Structured Streaming primitives: readStream ->
event-time window + watermark -> writeStream; stateful dedup via
dropDuplicates on a watermarked key.

These helpers take a *streaming* DataFrame (rate/file/kafka source --
tests use a file source on a temp dir) and return the transformed
streaming DataFrame; callers own the sink/trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key with late-data
    watermarking. Output: (window_start, window_end, key, n, sum_value).
    """
    # watermarks need TIMESTAMP (LTZ); parquet sources often carry NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def streaming_edge_ingest(
    pages: DataFrame, watermark: str = "1 hour", ts_col: str = "warc_ts"
) -> DataFrame:
    """Incremental crawl ingestion: streaming page table -> extracted
    named edges, deduplicated within the watermark horizon (exactly-once
    edge emission per (src,dst) while state is retained)."""
    from ..functions.extraction import extract_links

    pages = pages.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        pages.withWatermark(ts_col, watermark)
        .select(
            ts_col,
            F.col("url").alias("src_name"),
            F.explode(extract_links(F.col("html"), F.col("url"))).alias("dst_name"),
        )
        .where(F.col("src_name") != F.col("dst_name"))
        .dropDuplicates(["src_name", "dst_name"])
    )
