"""Explicit skew handling for power-law web graphs.

SURVEY.md §4 item 4 / north rule: PageRank's ``groupBy(dst)`` on a web
graph is power-law skewed; AQE skew-join splitting handles the *join*
side, but we additionally provide an explicit two-phase combine
("salting") for the aggregation: partial sums per (dst, salt) bucket,
then final sum per dst. For sum/min/count Spark already performs
map-side partial aggregation, so salting matters when the *reduce*
side of a single hot key exceeds one task -- at 10^12-edge scale a hub
page can receive contributions from >1e9 sources, and the two-phase
shape bounds any single task's input to (key volume / salt_buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column,
    out: str,
    salt_buckets: int = 0,
    salt_from: str | None = None,
) -> DataFrame:
    """``df.groupBy(key).agg(sum(value) as out)`` with optional two-phase
    salted combine.

    salt_buckets <= 1 -> single-phase (map-side combine still applies).
    Otherwise: phase 1 groups by (key, salt) where salt is derived from
    a second column (default: a hash of all columns), phase 2 sums the
    per-salt partials. Both phases are plain Catalyst aggregates and
    stay in whole-stage codegen.
    """
    if salt_buckets and salt_buckets > 1:
        salt_col = (
            F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets))
            if salt_from
            else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
        )
        partial = (
            df.withColumn("__salt", salt_col)
            .groupBy(key, "__salt")
            .agg(F.sum(value).alias("__partial"))
        )
        return partial.groupBy(key).agg(F.sum("__partial").alias(out))
    return df.groupBy(key).agg(F.sum(value).alias(out))


# JOIN-side hub handling (out-degree hubs concentrating a co-partitioned
# join's input in one task) lives in operators/pagerank.py::_pagerank_impl
# (`hub_split="auto"`), which detects hubs from the already-persisted
# out-degree aggregate instead of re-scanning the edge table the way a
# generic split helper would; PLANS.md §17 records the measured engage
# threshold. A previous generic `split_hubs(edges, threshold)` helper was
# removed: unused, and strictly worse (one extra full-edge-table groupBy
# per call) than detection riding an aggregate the caller already has.
