"""A/B: join-skew hub split on a deliberately hub-skewed graph.

Fixture: n vertices, ~4 pseudo-random out-edges per vertex, plus ONE
src vertex (vid 0) with hub_frac of ALL edges as out-edges -- the
adversarial shape (sitemap/spam page) where the co-partitioned
links ⨝ ranks join puts ~10% of the edge table into a single task.
PLANS.md §13 showed dst-side (aggregation) skew is already neutralized
by map-side partial sums; this measures the src-side (join) remedy.

Interleaved min-of-3 (sandbox noise is +/-50%, see memory/PLANS):
prints one JSON line with per-variant runs, min, and rank sums (must
be equal across variants).

Env: HUB_N (default 1_000_000), HUB_FRAC (0.1), HUB_ITERS (10),
SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_graph(spark, n: int, hub_frac: float, base_deg: int):
    from nx_neptune_spark.graph import LinkGraph

    ids = spark.range(n).select(F.col("id").alias("vid"))
    base = None
    for j in (3, 17, 31, 57)[:base_deg]:
        part = spark.range(n).select(
            F.col("id").alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(n)).alias("dst"),
        )
        base = part if base is None else base.unionByName(part)
    # distinct hub dsts by construction (dst = id+1), so .distinct()
    # below cannot collapse the hub's out-degree; capped at n-1
    n_hub = min(n - 1, int(base_deg * n * hub_frac / (1.0 - hub_frac)))
    hub = spark.range(n_hub).select(
        F.lit(0).cast("long").alias("src"),
        (F.col("id") + 1).alias("dst"),
    )
    edges = (
        base.unionByName(hub)
        .where(F.col("dst") != F.col("src"))
        .distinct()
        .persist()
    )
    edges.count()
    return LinkGraph(edges, ids, directed=True)


def main() -> None:
    n = int(os.environ.get("HUB_N", "1000000"))
    hub_frac = float(os.environ.get("HUB_FRAC", "0.1"))
    base_deg = int(os.environ.get("HUB_BASE_DEG", "4"))
    iters = int(os.environ.get("HUB_ITERS", "10"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from nx_neptune_spark.session import get_spark
    from nx_neptune_spark.operators.pagerank import pagerank

    spark = get_spark(
        app_name="hub-skew-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    g = build_graph(spark, n, hub_frac, base_deg)
    n_edges = g.edges.count()
    hub_deg = g.edges.where(F.col("src") == 0).count()

    # warm-up (untimed)
    pagerank(g, fixed_iterations=2, hub_split=None).count()

    runs = {"off": [], "auto": [], "forced": []}
    sums = {}
    keys = {}
    for _ in range(3):
        for variant, hub_split in (
            ("off", None),
            ("auto", "auto"),
            ("forced", max(2, hub_deg // 2)),
        ):
            stats: dict = {}
            t0 = time.time()
            pr = pagerank(
                g, fixed_iterations=iters, hub_split=hub_split, stats=stats
            )
            s = pr.agg(F.sum("rank")).first()[0]
            runs[variant].append(round(time.time() - t0, 2))
            sums[variant] = s
            keys[variant] = stats.get("hub_split_keys", 0)

    out = {
        "n_vertices": n,
        "n_edges": n_edges,
        "hub_out_degree": hub_deg,
        "hub_edge_share": round(hub_deg / n_edges, 4),
        "iters": iters,
        "cpus": cpus,
        "runs_off": runs["off"],
        "runs_auto": runs["auto"],
        "runs_forced": runs["forced"],
        "min_off": min(runs["off"]),
        "min_auto": min(runs["auto"]),
        "min_forced": min(runs["forced"]),
        "speedup_forced": round(min(runs["off"]) / min(runs["forced"]), 3),
        "hub_keys": {k: v for k, v in keys.items()},
        "rank_sums_equal": len({repr(v) for v in sums.values()}) == 1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
