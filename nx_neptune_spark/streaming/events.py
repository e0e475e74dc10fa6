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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize(
    events: DataFrame,
    gap_secs: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization via
    ``applyInPandasWithState`` (the Structured Streaming escape hatch for
    semantics windows can't express). Per key, events are folded into
    sessions; a session closes when the next event is more than
    ``gap_secs`` later, and closed sessions are emitted immediately.
    The trailing open session stays in state across micro-batches.

    State is (start, last, n) epoch-second longs; processing within a
    batch sorts the group's events by time, so output is deterministic
    for a given batch layout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        for pdf in pdf_iter:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000_000
            rows.extend(int(t) for t in ts)
        rows.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = []
        for t in rows:
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= gap_secs:
                # cross-batch out-of-order arrival can deliver t < last
                # (no watermark bound here); the session end must never
                # move backwards or later split decisions corrupt
                start, last, n = min(start, t), max(last, t), n + 1
            else:
                out.append((start, last, n))
                start, last, n = t, t, 1
        if start is not None:
            state.update((start, last, n))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user_id] * len(out), dtype="int64"),
                    "session_start": pd.to_datetime([s for s, _, _ in out], unit="s"),
                    "session_end": pd.to_datetime([e for _, e, _ in out], unit="s"),
                    "n_events": pd.Series([c for _, _, c in out], dtype="int64"),
                }
            )

    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_edge_ingest(
    pages: DataFrame, watermark: str = "1 hour", ts_col: str = "warc_ts"
) -> DataFrame:
    """Incremental crawl ingestion: streaming page table -> extracted
    named edges, deduplicated within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state for a
    (src,dst) pair is EVICTED once the watermark passes it — a plain
    ``dropDuplicates`` on keys excluding the event-time column keeps
    every pair in the state store forever (unbounded state on a
    continuous crawl)."""
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
        .dropDuplicatesWithinWatermark(["src_name", "dst_name"])
    )
