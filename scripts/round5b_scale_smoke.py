"""Round-5b operator scale smoke: degree-structure metrics, bipartite
coloring, VoteRank and triadic census on the 1M-page / 4.5M-edge
synthetic crawl at local[32] (same protocol as round5_scale_smoke.py:
warm JVM, persisted graph, single runs, loadavg stamped).

Triad census runs at the page level: this crawl's linked-dyad wedge
budget is 58M with max linked degree 5,101 (measured) — within the
documented Σ deg² envelope. On crawls with larger hubs the documented
scale path is the host-collapsed graph.

Usage: [SPARK_GRAFT_SMOKE_PAGES=1000000] python scripts/round5b_scale_smoke.py
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

spark = get_spark(app_name="r5b-smoke", master="local[32]", shuffle_partitions=32)
pages = generate_pages(spark, PAGES).persist()
pages.count()
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
n_v = g.vertices.count()
und = LinkGraph(g.edges, g.vertices, directed=False)
print(f"graph: {n_v:,} pages, {n_edges:,} edges, load {os.getloadavg()}", flush=True)

results: dict = {"pages": n_v, "edges": n_edges, "load_start": os.getloadavg()}


def timed(name, fn):
    t0 = time.time()
    extra = fn()
    dt = time.time() - t0
    results[name] = round(dt, 2)
    print(f"{name}: {dt:.2f}s {extra or ''}", flush=True)


def run_s_metric():
    from nx_neptune_spark.operators.structure import s_metric

    s = s_metric(g)
    return f"(s={s:.3e})"


def run_rich_club():
    from nx_neptune_spark.operators.structure import rich_club_coefficient

    rows = rich_club_coefficient(und).count()
    return f"(k_classes={rows:,})"


def run_effective_size():
    from nx_neptune_spark.operators.structure import effective_size

    row = effective_size(und).agg(F.sum("effective_size")).first()
    return f"(sum_e={row[0]:.3e})"


def run_isolates():
    from nx_neptune_spark.operators.structure import number_of_isolates

    return f"(isolates={number_of_isolates(g):,})"


def run_bipartite():
    from nx_neptune_spark.operators.bipartite import is_bipartite

    return f"(bipartite={is_bipartite(g)})"


def run_voterank():
    from nx_neptune_spark.operators.voterank import voterank

    seeds = voterank(g, number_of_nodes=5).collect()
    return f"(seeds={[r['vid'] for r in sorted(seeds, key=lambda r: r['rank'])]})"


def run_triads():
    # page-level census is tractable on this crawl: 58M linked-dyad
    # wedges, max linked degree 5,101 (measured) — the Σ deg² budget
    # the module documents. (The synthetic generator emits ONE host,
    # so the host-collapsed alternative is vacuous here.)
    from nx_neptune_spark.operators.triads import triadic_census

    census = {r["triad"]: int(r["count"]) for r in triadic_census(g).collect()}
    top = sorted(
        ((k, v) for k, v in census.items() if k not in ("003", "012", "102")),
        key=lambda kv: -kv[1],
    )[:3]
    return f"(top_connected={top})"


timed("s_metric", run_s_metric)
timed("rich_club_curve", run_rich_club)
timed("effective_size", run_effective_size)
timed("number_of_isolates", run_isolates)
timed("is_bipartite", run_bipartite)
timed("voterank_5seeds", run_voterank)
timed("triadic_census_pages", run_triads)

results["load_end"] = os.getloadavg()
print("RESULT " + json.dumps(results))
