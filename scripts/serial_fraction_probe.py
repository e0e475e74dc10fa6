"""Measure the Amdahl serial fraction f of the PageRank loop.

On a trivially small graph (W ~ 0) the 10-iteration loop's wall-clock
IS the per-run serial overhead: Catalyst analysis/optimization of the
multi-iteration plan, job scheduling, and the eager lineage-truncation
actions. BENCH/BASELINE.md's run-C decomposition inferred f ~ 7.0 s
per 10-iteration run from the local[2]/local[8] pair; this probe
measures it directly and A/Bs the knobs that could shrink it
(truncation cadence, shuffle-partition count).

Usage: python scripts/serial_fraction_probe.py [cpus] [pages]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2
pages = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

from nx_neptune_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="serial-probe", master=f"local[{cpus}]",
    shuffle_partitions=max(cpus, 8),
)
from nx_neptune_spark.graph import LinkGraph  # noqa: E402
from nx_neptune_spark.operators.pagerank import pagerank  # noqa: E402
from nx_neptune_spark.sources.pages import generate_pages  # noqa: E402

g = LinkGraph.from_pages(generate_pages(spark, pages))
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
g.vertices.count()
print(f"graph: {pages} pages, {n_edges} edges, local[{cpus}]")

pagerank(g, fixed_iterations=2)  # warm-up

for iters in (5, 10, 20):
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        pr = pagerank(g, fixed_iterations=iters)
        pr.agg({"rank": "sum"}).collect()
        best = min(best, time.time() - t0)
    print(f"iters={iters:3d}  best={best:6.2f}s  per-iter={best / iters:.3f}s")
