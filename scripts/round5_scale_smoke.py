"""Round-5 operator scale smoke: run the new directed-analysis and
statistics operators on the 1M-page / 4.5M-edge synthetic crawl at
local[32] and print one wall-clock line each — the per-operator scale
evidence BENCH/BASELINE.md records (same protocol as the round-4
eigen/kcore/sssp/betweenness notes: warm JVM, persisted graph, single
run, loadavg stamped).

Usage: [SPARK_GRAFT_SMOKE_PAGES=1000000] python scripts/round5_scale_smoke.py
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

spark = get_spark(app_name="r5-smoke", master="local[32]", shuffle_partitions=32)
pages = generate_pages(spark, PAGES).persist()
pages.count()
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
n_v = g.vertices.count()
print(f"graph: {n_v:,} pages, {n_edges:,} edges, load {os.getloadavg()}", flush=True)

results: dict = {"pages": n_v, "edges": n_edges}


def timed(name, fn):
    t0 = time.time()
    extra = fn()
    dt = time.time() - t0
    results[name] = round(dt, 2)
    print(f"{name}: {dt:.2f}s {extra or ''}", flush=True)


def run_scc():
    from nx_neptune_spark.operators.scc import strongly_connected_components

    stats: dict = {}
    out = strongly_connected_components(g, stats=stats).persist()
    n_comp = out.select("scc_id").distinct().count()
    out.unpersist()
    return f"(components={n_comp:,}, fwbw_rounds={stats['rounds']}, trim_rounds={stats['trim_rounds']})"


def run_condensation():
    from nx_neptune_spark.operators.condensation import condensation_with_members
    from nx_neptune_spark.operators.toposort import topological_generations

    cg, _ = condensation_with_members(g)
    stats: dict = {}
    layers = topological_generations(cg, stats=stats)
    n = layers.count()
    return f"(condensation nodes={n:,}, dag_depth={stats['depth']})"


def run_assortativity():
    from nx_neptune_spark.operators.assortativity import (
        directed_assortativity_profile,
    )

    row = directed_assortativity_profile(g).first()
    return f"(r_out_in={row['r_out_in']:.4f})"


def run_reciprocity():
    from nx_neptune_spark.operators.reciprocity import overall_reciprocity

    r = overall_reciprocity(g)
    return f"(r={r:.4f})"


def run_katz():
    from nx_neptune_spark.operators.katz import katz_centrality

    out = katz_centrality(g, fixed_iterations=10)
    s = out.agg(F.sum("centrality")).collect()[0][0]
    return f"(sum={s:.2f})"


def run_host_graph():
    from nx_neptune_spark.functions.web import host_graph

    hg = host_graph(pages)
    hg.edges = hg.edges.persist()
    ne = hg.edges.count()
    nv = hg.vertices.count()
    hg.edges.unpersist()
    return f"(hosts={nv:,}, host_edges={ne:,})"


timed("katz_10iter", run_katz)
timed("assortativity_profile", run_assortativity)
timed("reciprocity_overall", run_reciprocity)
timed("host_graph_collapse", run_host_graph)
timed("scc_fwbw_trim", run_scc)
timed("condensation_plus_topo", run_condensation)

results["load_end"] = os.getloadavg()
print("RESULT " + json.dumps(results))
