"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

North-star metric (BASELINE.json): edges-processed/sec per PageRank
iteration. The PageRank input is the full north-rule pipeline at bench
scale: synthetic Common-Crawl-style pages -> pandas-UDF link extraction
-> dense-id dictionary -> power iteration. Page count scales with sf
(10M pages/sf => ~45M edges at sf=1; 1M pages / ~4.5M edges at the
driver's sf=0.1).

Also times a representative slice of the entry queries (dedup, ANN,
components, relational) on the driver-provided tables.

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  SPARK_GRAFT_PAGES    override page count (else 10_000_000 * sf)
  SPARK_GRAFT_PR_ITERS fixed PageRank iterations (default 10)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def sf_of(sf_dir: str) -> float | None:
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)", sf_dir)
    return float(m.group(1)) if m else None


def _host_load() -> dict:
    """Snapshot host load so the bench JSON is interpretable on its own.

    Round 4's driver bench regressed ~2.15x on paper and was adjudicated
    environmental only via builder-side A/Bs (host loadavg 14-31 during the
    driver window vs 0.1-10 in round 3). Recording loadavg/uptime IN the
    bench file makes that call possible from the record alone.
    """
    out: dict = {}
    try:
        la1, la5, la15 = os.getloadavg()
        out["loadavg_1m"] = round(la1, 2)
        out["loadavg_5m"] = round(la5, 2)
        out["loadavg_15m"] = round(la15, 2)
    except OSError:
        pass
    try:
        with open("/proc/uptime") as f:
            out["uptime_sec"] = round(float(f.read().split()[0]), 1)
    except OSError:
        pass
    try:
        out["host_cpus"] = os.cpu_count()
    except Exception:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    # 10M pages/sf => 1M pages (~4.5M extracted edges) at the driver's
    # sf0.1: large enough that per-stage fixed costs don't dominate the
    # north-star edges/sec/iteration figure
    if os.environ.get("SPARK_GRAFT_PAGES"):
        n_pages = int(os.environ["SPARK_GRAFT_PAGES"])
    elif sf is not None:
        n_pages = max(1000, int(10_000_000 * sf))
    else:
        raise SystemExit(
            f"cannot infer scale from {sf_dir!r} (no sf<N> in path); "
            "set SPARK_GRAFT_PAGES explicitly"
        )
    pr_iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))

    load_start = _host_load()
    # Pre-existing load gate: the bench still RUNS (the driver needs a JSON
    # line either way) but flags the record as contaminated when the host is
    # already busier than half this bench's own core budget before Spark
    # starts. Threshold rationale: at local[32] on an idle host, pre-bench
    # 1-minute loadavg stays well under cpus/2; round 4's bad windows were
    # 14-31.
    load_gate_threshold = cpus / 2.0
    load_clean = load_start.get("loadavg_1m", 0.0) <= load_gate_threshold

    from nx_neptune_spark.session import get_spark

    spark = get_spark(
        app_name="nx-neptune-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    import __spark_entry__ as entry
    from nx_neptune_spark.graph import LinkGraph
    from nx_neptune_spark.operators.pagerank import pagerank
    from nx_neptune_spark.sources.pages import generate_pages

    import pyspark.sql.functions as F

    def _force(df):
        """Force FULL evaluation of every output column; a bare
        .count() lets Catalyst prune projected expressions (token
        counts, decimal sums, bit aggregates), timing an empty-schema
        scan instead of the operator. xxhash64 over a struct of all
        columns defeats pruning while staying JVM-side."""
        return df.agg(
            F.max(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])))
        ).collect()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # -- warm-up (untimed): run the full hot path once on a 2k-page graph
    # so JIT/codegen/Arrow initialization is not charged to the first
    # timed query (the same practice scaling_bench.py uses; cold-vs-warm
    # is ~2x on the 10-iteration PageRank loop at this scale)
    from nx_neptune_spark.operators.components import connected_components as _cc
    from nx_neptune_spark.operators.triangles import triangle_count as _tc

    wpages = generate_pages(spark, 2000).persist()
    wg = LinkGraph.from_pages(wpages)
    pagerank(wg, fixed_iterations=2).count()
    _cc(wg).count()
    _tc(wg).count()
    wpages.unpersist()
    from nx_neptune_spark.operators.dedup import minhash_lsh_pairs as _ml

    _ml(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)).count()

    # -- flagship: pages -> extraction -> edges ---------------------------
    t0 = time.time()
    pages = generate_pages(spark, n_pages).persist()
    n_rows = pages.count()
    g = LinkGraph.from_pages(pages)
    g.edges = g.edges.persist()
    n_edges = g.edges.count()
    g.vertices = g.vertices.persist()
    n_verts = g.vertices.count()
    timings["extract_build_graph"] = time.time() - t0
    extra["pages"] = n_rows
    extra["edges"] = n_edges
    extra["extract_pages_per_sec"] = round(n_rows / timings["extract_build_graph"], 1)

    # -- north star: PageRank edges/sec/iteration --------------------------
    t0 = time.time()
    pr = pagerank(g, fixed_iterations=pr_iters)
    pr.select("rank").agg({"rank": "sum"}).collect()
    pr_secs = time.time() - t0
    timings[f"pagerank_{pr_iters}iter"] = pr_secs
    extra["pagerank_iters"] = pr_iters
    extra["edges_per_sec_per_iter"] = round(n_edges * pr_iters / pr_secs, 1)

    # -- north star, convergence mode ---------------------------------------
    # BASELINE.json's metric is "edges/sec per PageRank iteration (to
    # 1e-6 convergence)". NetworkX's stop rule is L1 < n*tol, which at
    # n~1M vertices makes tol=1e-6 trivially loose (threshold 1.0), so
    # the bench takes the strict absolute reading: tol = 1e-6/n, i.e.
    # stop when L1(x_t - x_{t-1}) < 1e-6. check_every=10 runs the
    # tol-driven path as blocks of 10 lazy iterations with ONE combined
    # delta action per block (pagerank.py blocked mode), so convergence
    # mode pays ~1 extra n-row join-aggregate per 10 edge-table
    # iterations vs the fixed-depth lazy plan.
    conv_stats: dict = {}
    t0 = time.time()
    prc = pagerank(
        g,
        tol=1e-6 / max(n_verts, 1),
        max_iter=200,
        check_every=10,
        stats=conv_stats,
    )
    prc.select("rank").agg({"rank": "sum"}).collect()
    conv_secs = time.time() - t0
    timings["pagerank_converged"] = conv_secs
    extra["pagerank_conv_iters"] = conv_stats.get("iterations")
    extra["pagerank_conv_l1"] = conv_stats.get("delta")
    extra["conv_edges_per_sec_per_iter"] = round(
        n_edges * conv_stats["iterations"] / conv_secs, 1
    )

    # -- other graph ops on the same web graph ------------------------------
    from nx_neptune_spark.operators.components import connected_components
    from nx_neptune_spark.operators.degree import degree_centrality
    from nx_neptune_spark.operators.hits import hits
    from nx_neptune_spark.operators.triangles import triangle_count

    t0 = time.time()
    connected_components(g).groupBy("component").count().count()
    timings["connected_components"] = time.time() - t0

    # HITS = two coupled matvecs/iteration (2x PageRank's exchange
    # budget), fixed-depth lazy plan; throughput reported per iteration
    hits_iters = 5
    t0 = time.time()
    hits(g, fixed_iterations=hits_iters).agg(
        {"hub": "sum", "authority": "sum"}
    ).collect()
    hits_secs = time.time() - t0
    timings["hits_5iter"] = hits_secs
    extra["hits_edges_per_sec_per_iter"] = round(n_edges * hits_iters / hits_secs, 1)

    t0 = time.time()
    triangle_count(g).agg({"triangles": "sum"}).collect()
    timings["triangle_count"] = time.time() - t0

    t0 = time.time()
    _force(degree_centrality(g))
    timings["degree_centrality"] = time.time() - t0

    # -- extensions: round-4 iterative operators, tracked SEPARATELY --------
    # (VERDICT r4 item 5) so the headline set stays round-over-round
    # comparable while these still get regression coverage. Same web graph
    # as the headline section.
    extensions: dict[str, float] = {}
    from nx_neptune_spark.operators.betweenness import betweenness_centrality
    from nx_neptune_spark.operators.eigenvector import eigenvector_centrality
    from nx_neptune_spark.operators.kcore import core_number
    from nx_neptune_spark.operators.sssp import shortest_path_lengths

    t0 = time.time()
    eigenvector_centrality(g, fixed_iterations=10).agg(
        {"centrality": "sum"}
    ).collect()
    extensions["eigenvector_10iter"] = time.time() - t0
    extra["eigen_edges_per_sec_per_iter"] = round(
        n_edges * 10 / extensions["eigenvector_10iter"], 1
    )

    kc_stats: dict = {}
    t0 = time.time()
    core_number(g, stats=kc_stats).agg({"core": "max"}).collect()
    extensions["core_number_fixpoint"] = time.time() - t0
    extra["core_number_rounds"] = kc_stats.get("iterations")

    sp_stats: dict = {}
    t0 = time.time()
    shortest_path_lengths(g, source=0, weight=None, stats=sp_stats).agg(
        {"distance": "max"}
    ).collect()
    extensions["sssp_fixpoint"] = time.time() - t0
    extra["sssp_rounds"] = sp_stats.get("rounds")

    t0 = time.time()
    betweenness_centrality(g, sources=[0, 1, 2, 3]).agg(
        {"betweenness": "sum"}
    ).collect()
    extensions["betweenness_4pivots"] = time.time() - t0

    pages.unpersist()
    g.edges.unpersist()
    g.vertices.unpersist()

    # -- entry-query slice on driver tables ---------------------------------
    qs = entry.queries()
    for name in [
        "dedup_exact",
        "minhash_lsh",
        "simhash",
        "ann_topk",
        "token_stats",
        "lineitem_pricing",
        "events_hourly",
    ]:
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        timings[name] = time.time() - t0

    # IVF is timed at the OPERATOR (train + assign + probe + re-rank),
    # not via the contract query — that query also runs the brute-force
    # twin to measure recall, which would charge the verifier's cost to
    # the operator's number
    from nx_neptune_spark.operators.ivf import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vecs = emb.count()
    dim = len(emb.select("embedding").first()[0])
    ivf_queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # sqrt(N) codebook (standard IVF sizing); the centroid-literal plan
    # grows with n_centroids x dim, so sizing to the corpus keeps the
    # expression tree (and its one-time codegen) proportionate
    n_cent = max(8, min(64, int(n_vecs ** 0.5)))
    t0 = time.time()
    _force(ivf_topk(emb, ivf_queries, dim, k=10, n_centroids=n_cent, nprobe=6))
    timings["ann_topk_ivf"] = time.time() - t0

    total = sum(timings.values())
    # round-3 bench had neither the convergence-mode PageRank line nor
    # the HITS line; this subtotal keeps round-over-round totals
    # comparable while the full value stays honest about everything run
    r4_only = {"pagerank_converged", "hits_5iter"}
    comparable = sum(v for k, v in timings.items() if k not in r4_only)
    load_end = _host_load()
    out = {
        "metric": "edges-processed/sec per PageRank iteration (north star); "
        "value = total headline wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "extensions": {k: round(v, 3) for k, v in extensions.items()},
        "extensions_total": round(sum(extensions.values()), 3),
        "sf": sf,
        "cpus": cpus,
        "value_r03_query_set": round(comparable, 3),
        # Load gate: loadavg_1m sampled BEFORE Spark start vs the cpus/2
        # threshold; load_end is after the run (includes this bench's own
        # load). load_clean=false means the numbers are contaminated by
        # co-tenant load and should not be compared round-over-round.
        "load_clean": load_clean,
        "load_gate_threshold": load_gate_threshold,
        "load_start": load_start,
        "load_end": load_end,
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
