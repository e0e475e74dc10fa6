"""Interleaved eigenvector-vs-PageRank A/B at equal iteration budget
(PLANS.md §17 warm-JVM protocol; closes the round-4 "eigenvector 4x
PageRank" anomaly with a measured number).

One JVM, one persisted graph, alternating runs so co-tenant load hits
both arms equally; min-of-N filters the sandbox's +-50% noise.

Usage: [SPARK_GRAFT_AB_PAGES=1000000] [SPARK_GRAFT_AB_TRIALS=3]
       python scripts/eigen_ab_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.eigenvector import eigenvector_centrality
from nx_neptune_spark.operators.pagerank import pagerank
from nx_neptune_spark.session import get_spark
from nx_neptune_spark.sources.pages import generate_pages

PAGES = int(os.environ.get("SPARK_GRAFT_AB_PAGES", "1000000"))
TRIALS = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "3"))
ITERS = 10

spark = get_spark(app_name="eigen-ab", master="local[32]", shuffle_partitions=32)
pages = generate_pages(spark, PAGES)
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
g.vertices.count()
print(f"graph: {PAGES:,} pages, {n_edges:,} edges", flush=True)

# warm-up both arms (excluded)
pagerank(g, fixed_iterations=2)
eigenvector_centrality(g, fixed_iterations=2)

best = {"pagerank": float("inf"), "eigenvector": float("inf")}
for t in range(TRIALS):
    t0 = time.time()
    pr = pagerank(g, fixed_iterations=ITERS)
    s = pr.agg({"rank": "sum"}).collect()[0][0]
    dt = time.time() - t0
    best["pagerank"] = min(best["pagerank"], dt)
    print(f"trial {t}: pagerank {dt:.2f}s (sum {s:.6f})", flush=True)

    t0 = time.time()
    ev = eigenvector_centrality(g, fixed_iterations=ITERS)
    s = ev.agg({"centrality": "sum"}).collect()[0][0]
    dt = time.time() - t0
    best["eigenvector"] = min(best["eigenvector"], dt)
    print(f"trial {t}: eigenvector {dt:.2f}s (sum {s:.6f})", flush=True)

ratio = best["eigenvector"] / best["pagerank"]
print("RESULT " + json.dumps({
    "pages": PAGES, "edges": n_edges, "iters": ITERS, "trials": TRIALS,
    "pagerank_best_s": round(best["pagerank"], 2),
    "eigenvector_best_s": round(best["eigenvector"], 2),
    "ratio": round(ratio, 3),
    "pr_eps_per_iter": round(n_edges * ITERS / best["pagerank"]),
    "ev_eps_per_iter": round(n_edges * ITERS / best["eigenvector"]),
}))
