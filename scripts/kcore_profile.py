"""Per-round core_number profiling at bench scale: where do the ~60s go?

Usage: SPARK_GRAFT_PAGES=1000000 python scripts/kcore_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nx_neptune_spark.session import get_spark
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.kcore import core_number
from nx_neptune_spark.sources.pages import generate_pages

n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

# warm-up mirrors bench.py
wp = generate_pages(spark, 2000).persist()
wg = LinkGraph.from_pages(wp)
core_number(wg).count()
wp.unpersist()

pages = generate_pages(spark, n_pages).persist()
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
g.vertices.count()

for run in range(int(os.environ.get("SPARK_GRAFT_RUNS", "2"))):
    stats = {}
    t0 = time.time()
    core_number(g, stats=stats).agg({"core": "max"}).collect()
    total = time.time() - t0
    print(json.dumps({
        "run": run, "total": round(total, 2), "n_edges_in": n_edges,
        "iterations": stats.get("iterations"),
        "rounds": stats.get("rounds", []),
    }))
