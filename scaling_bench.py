"""Two-cluster-size scaling evidence (north rule: >=0.8 throughput
scaling efficiency between N and 4N executors; sandbox evidence = two
parallelism levels on one 32-core machine, one JVM per run, runs
strictly sequential).

Methodology
-----------
* N=2 vs 4N=8 cores is the primary pair: on a single shared-memory box
  the 8->32 pair is bounded by the machine's memory bandwidth, not by
  the engine (a control run shows local[32] == local[8] wall-clock on
  the same 27M-edge graph); 2->8 leaves the bandwidth headroom a real
  4x cluster would have. An 8->32 appendix documents the wall.
* Weak scaling (4N cores on 4x pages) is the cluster-growth criterion;
  strong scaling (same input) is reported alongside.
* Each measurement is best-of-3 (the sandbox has co-tenant noise with
  +-50% wall-clock swings; min filters it), after 2 warm-up iterations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); iters = int(sys.argv[3]); trials = int(sys.argv[4])
from nx_neptune_spark.session import get_spark
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.sources.pages import generate_pages
from nx_neptune_spark.operators.pagerank import pagerank
t0 = time.time()
pages = generate_pages(spark, n_pages)
g = LinkGraph.from_pages(pages)
g.edges = g.edges.persist(); n_edges = g.edges.count()
g.vertices = g.vertices.persist(); g.vertices.count()
build = time.time() - t0
pagerank(g, fixed_iterations=2)  # warm-up, excluded
best = float("inf"); chk = None
for _ in range(trials):
    t0 = time.time()
    pr = pagerank(g, fixed_iterations=iters)
    chk = pr.agg({"rank": "sum"}).collect()[0][0]
    best = min(best, time.time() - t0)
print("RESULT " + json.dumps({
    "cpus": cpus, "pages": n_pages, "edges": n_edges, "iters": iters,
    "build_secs": build, "pages_per_sec": n_pages / build,
    "secs": best, "eps_per_iter": n_edges * iters / best, "rank_sum": chk,
}))
"""


def run(cpus: int, n_pages: int, iters: int, trials: int = 3) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER % {"repo": REPO},
         str(cpus), str(n_pages), str(iters), str(trials)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=5400,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in output:\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1500000"))
    iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "8"))
    factor = hi // lo
    with_appendix = os.environ.get("SPARK_GRAFT_SCALE_APPENDIX", "1") == "1"

    r_lo = run(lo, pages, iters)                   # N,  P
    r_hi_strong = run(hi, pages, iters)            # 4N, P
    r_lo_big = run(lo, pages * factor, iters)      # N,  4P (strong @4P control)
    r_hi_weak = run(hi, pages * factor, iters)     # 4N, 4P
    assert abs(r_lo["rank_sum"] - r_hi_strong["rank_sum"]) < 1e-9

    eff_strong = (r_hi_strong["eps_per_iter"] / r_lo["eps_per_iter"]) / factor
    eff_strong_big = (r_hi_weak["eps_per_iter"] / r_lo_big["eps_per_iter"]) / factor
    eff_weak = r_hi_weak["eps_per_iter"] / (factor * r_lo["eps_per_iter"])

    appendix = ""
    r32 = None
    if with_appendix and hi < 32:
        # the appendix is illustrative only — a driver-heap OOM at 32
        # threads (known GCLocker failure mode at the 4P page count on
        # small SPARK_GRAFT_DRIVER_MEM) must not destroy the primary
        # evidence computed above
        try:
            r32 = run(32, pages * factor, iters)
        except (RuntimeError, subprocess.TimeoutExpired) as exc:
            appendix = f"""
## Appendix: local[32] run skipped

The {hi}->32 appendix run failed on this box ({str(exc)[:200]}...);
raise SPARK_GRAFT_DRIVER_MEM (the page cache at 4P pages exceeds the
default 8g driver heap). The primary {lo}->{hi} pair above is
unaffected.
"""
    if with_appendix and hi < 32 and r32 is not None:
        appendix = f"""
## Appendix: the {hi} -> 32 pair on one box (why N={lo}/{factor}N={hi} is the primary pair)

| run | pages | edges | secs (best of 3) | edges/sec/iter |
|---|---|---|---|---|
| local[{hi}]  | {r_hi_weak['pages']:,} | {r_hi_weak['edges']:,} | {r_hi_weak['secs']:.2f} | {r_hi_weak['eps_per_iter']:,.0f} |
| local[32] | {r32['pages']:,} | {r32['edges']:,} | {r32['secs']:.2f} | {r32['eps_per_iter']:,.0f} |

At 32 threads this single machine's memory bandwidth saturates (the
inner loop is a hash join + sum over the edge table); local[32] gains
{r32['eps_per_iter'] / r_hi_weak['eps_per_iter']:.2f}x over local[{hi}] on the identical input. A real
{32 // hi}x *cluster* multiplies memory channels with cores, which the
{lo}->{hi} pair emulates faithfully and the {hi}->32 pair cannot.
"""

    def row(tag, r):
        return (
            f"| {tag} | {r['pages']:,} | {r['edges']:,} | {r['iters']} "
            f"| {r['secs']:.2f} | {r['eps_per_iter']:,.0f} | {r['pages_per_sec']:,.0f} |"
        )

    report = {
        "lo": r_lo, "hi_strong": r_hi_strong, "lo_big": r_lo_big,
        "hi_weak": r_hi_weak, "weak_efficiency": eff_weak,
        "strong_efficiency_P": eff_strong,
        "strong_efficiency_4P": eff_strong_big,
    }
    # smoke-scale runs (pages below the full-harness default) must not
    # overwrite the authoritative tables in BENCH/BASELINE.md
    if pages < 1_500_000 and os.environ.get("SPARK_GRAFT_SCALE_WRITE") != "1":
        print(json.dumps(report))
        print("smoke scale: BENCH/BASELINE.md left untouched "
              "(set SPARK_GRAFT_SCALE_WRITE=1 to force)")
        return

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve the hand-maintained measurement-history section across
    # rewrites (everything from its header to EOF)
    history = ""
    if os.path.exists(out):
        prev = open(out).read()
        idx = prev.find("## Measurement history")
        if idx >= 0:
            history = "\n" + prev[idx:]
    with open(out, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured north-star numbers

North-star metric: **edges-processed/sec per PageRank iteration** on
the Common-Crawl-style synthetic web graph; full pipeline = html link
extraction (Arrow pandas UDF) -> dense-id dictionary -> damped power
iteration ({iters} fixed iterations, alpha=0.85, lazy multi-stage plan,
one shuffle per iteration). Best of 3 runs, 2 warm-up iterations
excluded, one JVM per configuration, strictly sequential (the sandbox
shows +-50% co-tenant wall-clock noise; min filters it).

Cluster sizes emulated as parallelism levels: **N = local[{lo}]**,
**{factor}N = local[{hi}]**.

| run | pages | edges | iters | secs (best) | edges/sec/iter | extract pages/s |
|---|---|---|---|---|---|---|
{row(f'local[{lo}] (N,  P)', r_lo)}
{row(f'local[{hi}] ({factor}N, P)', r_hi_strong)}
{row(f'local[{lo}] (N,  {factor}P)', r_lo_big)}
{row(f'local[{hi}] ({factor}N, {factor}P)', r_hi_weak)}

* **Weak-scaling efficiency** (cluster-growth criterion: {factor}N executors,
  {factor}x crawl): eps({factor}N,{factor}P) / ({factor} x eps(N,P)) = **{eff_weak:.2f}**
* Strong-scaling efficiency at P: (eps({factor}N,P)/eps(N,P)) / {factor} =
  **{eff_strong:.2f}**
* Strong-scaling efficiency at {factor}P: (eps({factor}N,{factor}P)/eps(N,{factor}P)) / {factor} =
  **{eff_strong_big:.2f}**
* Result integrity: identical rank sums across parallelism levels
  ({r_lo['rank_sum']!r} vs {r_hi_strong['rank_sum']!r}, |diff| < 1e-9).

The per-iteration physical plan (one hash-partitioned shuffle,
map-side combine, shuffle-hash join of co-partitioned sides, optional
salted two-phase hub aggregation, AQE skew splitting) is identical at
every level; partitioning counts scale with the core count.
{appendix}{history}"""
        )
    print(json.dumps(report))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
