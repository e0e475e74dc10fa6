"""Capture .explain("formatted") for the operators touched in round 6.

Usage: python scripts/plan_capture_r06.py <out_dir> [repo_root]

Runs each touched bench query on a small bench-shaped graph (50k pages
by default) and writes plans/<query>.txt files containing the formatted
physical plans. Iterative operators materialize their state through
DataFrame.localCheckpoint, so that method is wrapped to record the plan
of every checkpointed frame (i.e. the per-round / per-block plan the
executor actually runs) plus every .count()/.collect()-driving frame we
explicitly tag. Run once against the round-start tree (git worktree)
for the *_before.txt files and once against HEAD for *_after.txt.
"""
from __future__ import annotations

import os
import sys

out_dir = sys.argv[1]
repo_root = sys.argv[2] if len(sys.argv) > 2 else "."
sys.path.insert(0, os.path.abspath(repo_root))
os.makedirs(out_dir, exist_ok=True)

N_PAGES = int(os.environ.get("NXS_PLAN_PAGES", "50000"))
MAX_PLANS_PER_QUERY = 6  # first rounds are representative; cap the dump

from nx_neptune_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="plan-capture-r06", master="local[8]", shuffle_partitions=8
)

import pyspark.sql.functions as F  # noqa: E402

try:  # Spark 4: instances are the classic subclass, which overrides
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # pragma: no cover - Spark 3.x
    from pyspark.sql import DataFrame  # noqa: E402

from nx_neptune_spark.graph import LinkGraph  # noqa: E402
from nx_neptune_spark.sources.pages import generate_pages  # noqa: E402


def fmt_plan(df: DataFrame) -> str:
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # pragma: no cover
        return f"<explain failed: {e}>"


_captured: list[str] = []
_orig_lcp = DataFrame.localCheckpoint


def _capturing_lcp(self, eager=True, *a, **kw):
    if len(_captured) < MAX_PLANS_PER_QUERY:
        _captured.append(
            f"--- localCheckpoint(eager={eager}) #{len(_captured) + 1} ---\n"
            + fmt_plan(self)
        )
    return _orig_lcp(self, eager, *a, **kw)


DataFrame.localCheckpoint = _capturing_lcp


def run(name: str, fn):
    _captured.clear()
    spark.sparkContext.setJobDescription(f"plan-capture:{name}")
    final = fn()
    parts = list(_captured)
    if final is not None:
        parts.append("--- returned frame ---\n" + fmt_plan(final))
    path = os.path.join(out_dir, f"{name}.txt")
    with open(path, "w") as f:
        f.write(
            f"# {name} — formatted physical plans "
            f"({N_PAGES} pages, local[8], shuffle_partitions=8)\n"
            f"# checkpointed-frame plans are the per-round/per-block plans "
            f"the loop actually executes\n\n"
        )
        f.write("\n\n".join(parts))
    print(f"wrote {path} ({len(parts)} plan(s))")


pages = generate_pages(spark, N_PAGES).persist()
pages.count()


def build_graph():
    g = LinkGraph.from_pages(pages)
    g.edges = g.edges.persist()
    g.edges.count()
    g.vertices = g.vertices.persist()
    g.vertices.count()
    return g


# -- extract_build_graph: the edges frame itself -------------------------
def q_extract():
    g = LinkGraph.from_pages(pages)
    return g.edges


run("extract_build_graph", q_extract)

g = build_graph()

from nx_neptune_spark.operators.betweenness import betweenness_centrality  # noqa: E402
from nx_neptune_spark.operators.components import connected_components  # noqa: E402
from nx_neptune_spark.operators.eigenvector import eigenvector_centrality  # noqa: E402
from nx_neptune_spark.operators.hits import hits  # noqa: E402
from nx_neptune_spark.operators.kcore import core_number  # noqa: E402
from nx_neptune_spark.operators.pagerank import pagerank  # noqa: E402
from nx_neptune_spark.operators.sssp import shortest_path_lengths  # noqa: E402
from nx_neptune_spark.operators.voterank import voterank  # noqa: E402

run("pagerank_10iter", lambda: pagerank(g, fixed_iterations=10))
run(
    "pagerank_converged",
    lambda: pagerank(
        g, tol=1e-6 / max(g.num_vertices(), 1), max_iter=200, check_every=10
    ),
)
run("hits_5iter", lambda: hits(g, fixed_iterations=5))
run("eigenvector_10iter", lambda: eigenvector_centrality(g, fixed_iterations=10))
run("connected_components", lambda: connected_components(g))
run("core_number_fixpoint", lambda: core_number(g))
run("sssp_fixpoint", lambda: shortest_path_lengths(g, source=0, weight=None))
run(
    "betweenness_4pivots",
    lambda: betweenness_centrality(g, sources=[0, 1, 2, 3]),
)
run("voterank", lambda: voterank(g, number_of_nodes=2))

spark.stop()
print("done")
