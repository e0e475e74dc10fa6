"""A/B the serial-overhead knobs of the lazy PageRank loop.

Tiny graph (W ~ 0) so wall-clock ~= per-run serial overhead f.
Variants: shuffle-partition count, lineage-truncation cadence
(NXS_PR_TRUNCATE_EVERY).

Usage: python scripts/serial_fraction_ab.py [cpus] [pages]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2
pages = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

from nx_neptune_spark.session import get_spark  # noqa: E402

parts = int(os.environ.get("NXS_AB_PARTS", str(max(cpus, 8))))
spark = get_spark(
    app_name="serial-ab", master=f"local[{cpus}]",
    shuffle_partitions=parts,
)
from nx_neptune_spark.graph import LinkGraph  # noqa: E402
from nx_neptune_spark.operators.pagerank import pagerank  # noqa: E402
from nx_neptune_spark.sources.pages import generate_pages  # noqa: E402

g = LinkGraph.from_pages(generate_pages(spark, pages))
g.edges = g.edges.persist()
n_edges = g.edges.count()
g.vertices = g.vertices.persist()
g.vertices.count()
print(f"graph: {pages} pages, {n_edges} edges, local[{cpus}], parts={parts}")

pagerank(g, fixed_iterations=2)  # warm-up

for iters in (10, 20):
    best = float("inf")
    ck = None
    for _ in range(3):
        t0 = time.time()
        pr = pagerank(g, fixed_iterations=iters)
        ck = pr.agg({"rank": "sum"}).collect()[0][0]
        best = min(best, time.time() - t0)
    print(f"iters={iters:3d}  best={best:6.2f}s  per-iter={best / iters:.3f}s  rank_sum={ck!r}")
