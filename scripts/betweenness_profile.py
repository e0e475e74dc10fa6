"""Per-level betweenness profiling at bench scale.

Usage: SPARK_GRAFT_PAGES=1000000 python scripts/betweenness_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nx_neptune_spark.session import get_spark
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.betweenness import betweenness_centrality
from nx_neptune_spark.sources.pages import generate_pages

n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

wp = generate_pages(spark, 2000).persist()
wg = LinkGraph.from_pages(wp)
betweenness_centrality(wg, sources=[0, 1]).count()
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
    betweenness_centrality(g, sources=[0, 1, 2, 3], stats=stats).agg(
        {"betweenness": "sum"}
    ).collect()
    total = time.time() - t0
    fwd = stats.get("forward_levels", [])
    bwd = stats.get("backward_levels", [])
    print(json.dumps({
        "run": run, "total": round(total, 2),
        "levels": stats.get("levels"),
        "fwd_total": round(sum(x["secs"] for x in fwd), 2),
        "bwd_total": round(sum(x["secs"] for x in bwd), 2),
        "fwd": fwd, "bwd": bwd,
    }))
