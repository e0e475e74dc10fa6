"""Bench-scale timing for individual iterative operators (sssp,
eigenvector, hits, pagerank, cc, triangles) without running the full
bench. Pick operators via SPARK_GRAFT_OPS=sssp,eigen,...

Usage: SPARK_GRAFT_PAGES=1000000 SPARK_GRAFT_OPS=sssp python scripts/iter_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nx_neptune_spark.session import get_spark
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.sources.pages import generate_pages

n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ops = os.environ.get("SPARK_GRAFT_OPS", "sssp").split(",")
runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

from nx_neptune_spark.operators.sssp import shortest_path_lengths
from nx_neptune_spark.operators.eigenvector import eigenvector_centrality
from nx_neptune_spark.operators.hits import hits
from nx_neptune_spark.operators.pagerank import pagerank
from nx_neptune_spark.operators.components import connected_components
from nx_neptune_spark.operators.triangles import triangle_count

def run_op(name, g):
    st = {}
    if name == "sssp":
        shortest_path_lengths(g, source=0, weight=None, stats=st).agg(
            {"distance": "max"}).collect()
    elif name == "eigen":
        eigenvector_centrality(g, fixed_iterations=10).agg(
            {"centrality": "sum"}).collect()
    elif name == "hits":
        hits(g, fixed_iterations=5).agg({"hub": "sum", "authority": "sum"}).collect()
    elif name == "pr":
        pagerank(g, fixed_iterations=10).agg({"rank": "sum"}).collect()
    elif name == "prconv":
        n = g.num_vertices()
        pagerank(g, tol=1e-6 / max(n, 1), max_iter=200, check_every=10,
                 stats=st).agg({"rank": "sum"}).collect()
    elif name == "cc":
        connected_components(g).groupBy("component").count().count()
    elif name == "tri":
        triangle_count(g).agg({"triangles": "sum"}).collect()
    else:
        raise SystemExit(f"unknown op {name}")
    return st

# warm-up mirrors bench.py
wp = generate_pages(spark, 2000).persist()
wg = LinkGraph.from_pages(wp)
for name in ops:
    run_op(name, wg)
wp.unpersist()

pages = generate_pages(spark, n_pages).persist()
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
g.edges.count()
g.vertices = g.vertices.persist()
g.vertices.count()

for name in ops:
    for run in range(runs):
        t0 = time.time()
        st = run_op(name, g)
        print(json.dumps({"op": name, "run": run,
                          "secs": round(time.time() - t0, 2),
                          **{k: v for k, v in st.items() if not isinstance(v, list)}}))
