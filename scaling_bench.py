"""Two-parallelism scaling evidence (north rule: >=0.8 throughput
scaling efficiency between N and 4N executors; sandbox evidence =
local[8] vs local[32] on the identical input).

Runs the PageRank north-star job in two fresh subprocess JVMs (one per
parallelism level -- Spark master is fixed per JVM), computes
throughput (edges/sec/iteration) at both, and writes BENCH/BASELINE.md.

Efficiency definition: strong scaling,
  eff = (throughput_4N / throughput_N) / 4.
We also report the weak-scaling-style per-core throughput ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); iters = int(sys.argv[3])
from nx_neptune_spark.session import get_spark
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.sources.pages import generate_pages
from nx_neptune_spark.operators.pagerank import pagerank
pages = generate_pages(spark, n_pages)
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist(); n_edges = g.edges.count()
g.vertices = g.vertices.persist(); g.vertices.count()
# warm-up iteration excluded from the measured window
pagerank(g, fixed_iterations=1)
t0 = time.time()
pr = pagerank(g, fixed_iterations=iters)
chk = pr.agg({"rank": "sum"}).collect()[0][0]
secs = time.time() - t0
print("RESULT " + json.dumps({
    "cpus": cpus, "edges": n_edges, "iters": iters, "secs": secs,
    "eps_per_iter": n_edges * iters / secs, "rank_sum": chk,
}))
"""


def run(cpus: int, n_pages: int, iters: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER % {"repo": REPO}, str(cpus), str(n_pages), str(iters)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in output:\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
    iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))
    lo, hi = 8, 32
    r_lo = run(lo, n_pages, iters)
    r_hi = run(hi, n_pages, iters)
    assert abs(r_lo["rank_sum"] - r_hi["rank_sum"]) < 1e-9, "results differ across parallelism"
    eff = (r_hi["eps_per_iter"] / r_lo["eps_per_iter"]) / (hi / lo)
    speedup = r_hi["eps_per_iter"] / r_lo["eps_per_iter"]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured north-star numbers

North-star metric: **edges-processed/sec per PageRank iteration** on the
Common-Crawl-style synthetic web graph ({n_pages:,} pages,
{r_lo['edges']:,} extracted edges), damped power iteration
({iters} fixed iterations, alpha=0.85), full pipeline = html link
extraction (pandas UDF) -> dense-id dictionary -> join-aggregate loop.

Scaling-rule evidence (north rule: >=0.8 efficiency between N and 4N
executors). Sandbox has one machine, so the two cluster sizes are
emulated by two parallelism levels on identical input, one JVM each:

| parallelism | edges | iters | secs | edges/sec/iter |
|---|---|---|---|---|
| local[{lo}]  (N)  | {r_lo['edges']:,} | {iters} | {r_lo['secs']:.2f} | {r_lo['eps_per_iter']:,.0f} |
| local[{hi}] (4N) | {r_hi['edges']:,} | {iters} | {r_hi['secs']:.2f} | {r_hi['eps_per_iter']:,.0f} |

* speedup local[{lo}] -> local[{hi}]: **{speedup:.2f}x**
* strong-scaling efficiency (speedup / 4): **{eff:.2f}**
* result integrity: identical rank sums across both runs
  ({r_lo['rank_sum']!r} == {r_hi['rank_sum']!r})

Note on interpretation: on one physical machine local[8] and local[32]
share memory bandwidth, so this under-states true multi-node scaling;
the per-iteration plan (one shuffle, map-side combine, AQE skew
handling) is the property that transfers to N vs 4N executors.
"""
        )
    print(json.dumps({"lo": r_lo, "hi": r_hi, "efficiency": eff, "speedup": speedup}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
