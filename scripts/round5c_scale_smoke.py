"""Round-5c operator scale smoke: the symmetry-breaking round family
(Luby MIS, Jones-Plassmann coloring, local-dominant matching,
random-walk corpus) on the 1M-page / ~4.5M-edge synthetic crawl at
local[32] (same protocol as round5_scale_smoke.py: warm JVM, persisted
graph, single runs, loadavg stamped).

Walks run from a 100k-start sample (the corpus use case samples
starts; the state is |walks| rows regardless of graph size).

Usage: [SPARK_GRAFT_SMOKE_PAGES=1000000] python scripts/round5c_scale_smoke.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.session import get_spark
from nx_neptune_spark.sources.pages import generate_pages

PAGES = int(os.environ.get("SPARK_GRAFT_SMOKE_PAGES", "1000000"))
WALK_STARTS = int(os.environ.get("SPARK_GRAFT_SMOKE_WALK_STARTS", "100000"))

spark = get_spark(app_name="r5c-smoke", master="local[32]", shuffle_partitions=32)
pages = generate_pages(spark, PAGES).persist()
pages.count()
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
n_v = g.vertices.count()
print(f"graph: {n_v:,} pages, {n_edges:,} edges, load {os.getloadavg()}", flush=True)

results: dict = {"pages": n_v, "edges": n_edges, "load_start": os.getloadavg()}


def timed(name, fn):
    t0 = time.time()
    extra = fn()
    dt = time.time() - t0
    results[name] = round(dt, 2)
    print(f"{name}: {dt:.2f}s {extra or ''}", flush=True)


def run_mis():
    from nx_neptune_spark.operators.mis import maximal_independent_set

    stats: dict = {}
    n = maximal_independent_set(g, stats=stats).count()
    results["mis_rounds"] = stats["rounds"]
    return f"(|MIS|={n:,}, rounds={stats['rounds']})"


def run_coloring():
    from nx_neptune_spark.operators.coloring import greedy_color

    stats: dict = {}
    df = greedy_color(g, stats=stats).persist()
    n = df.count()
    k = df.agg(F.max("color")).collect()[0][0] + 1
    df.unpersist()
    results["coloring_rounds"] = stats["rounds"]
    results["coloring_palette"] = k
    return f"(colored={n:,}, palette={k}, rounds={stats['rounds']})"


def run_matching():
    from nx_neptune_spark.operators.matching import maximal_matching

    stats: dict = {}
    n = maximal_matching(g, stats=stats).count()
    results["matching_rounds"] = stats["rounds"]
    return f"(|M|={n:,}, rounds={stats['rounds']})"


def run_walks():
    from nx_neptune_spark.operators.walks import random_walks

    starts = g.vertices.where(F.col("vid") < WALK_STARTS)
    n = random_walks(g, length=8, starts=starts).count()
    results["walk_rows"] = n
    return f"({WALK_STARTS:,} walks x 8 steps -> {n:,} rows)"


timed("mis", run_mis)
timed("coloring", run_coloring)
timed("matching", run_matching)
timed("walks_8step_100k", run_walks)

results["load_end"] = os.getloadavg()
print(json.dumps(results))
