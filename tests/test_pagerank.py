"""Differential tests vs NetworkX (the reference's own oracle strategy,
/root/reference/integ_test/graph_operations/test_algo_page_rank.py).
Acceptance per north rule: allclose(1e-6)."""

import math

import pytest

from oracles import nx_pagerank
from fixtures_graphs import (
    barabasi,
    chain_digraph,
    gnp_digraph,
    single_node,
    two_triangles_bridge,
)
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.pagerank import pagerank


def run_spark_pagerank(spark, g, **kw):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    result = pagerank(lg, **kw)
    return {names[r["vid"]]: r["rank"] for r in result.collect()}


def assert_allclose(got: dict, want: dict, tol=1e-6):
    want = {str(k): v for k, v in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=tol), (
            k,
            got[k],
            want[k],
        )


def test_chain_digraph(spark):
    g = chain_digraph()
    assert_allclose(run_spark_pagerank(spark, g), nx_pagerank(g))


def test_two_triangles_undirected(spark):
    g = two_triangles_bridge()
    assert_allclose(run_spark_pagerank(spark, g), nx_pagerank(g))


def test_weighted(spark):
    g = two_triangles_bridge(weighted=True)
    assert_allclose(
        run_spark_pagerank(spark, g, weight="weight"), nx_pagerank(g, weight="weight")
    )


def test_gnp_200(spark):
    g = gnp_digraph()
    assert_allclose(run_spark_pagerank(spark, g), nx_pagerank(g))


def test_barabasi_power_law(spark):
    g = barabasi()
    assert_allclose(run_spark_pagerank(spark, g), nx_pagerank(g))


def test_barabasi_salted(spark):
    """Skew path: explicit two-phase salted combine must not change values."""
    g = barabasi()
    assert_allclose(
        run_spark_pagerank(spark, g, salt_buckets=8), nx_pagerank(g)
    )


def test_single_node_is_one(spark):
    # Ref edge case: test_algo_page_rank.py:125-133
    got = run_spark_pagerank(spark, single_node())
    assert got == {"A": 1.0}


def test_empty_graph(spark):
    lg = LinkGraph.from_edge_pairs(spark, [], nodes=[])
    assert pagerank(lg).count() == 0


def test_alpha_and_personalization(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid = lg.vid_of()
    pers_names = {"A": 1.0, "C": 3.0}
    pers_vids = {vid[k]: v for k, v in pers_names.items()}
    names = lg.name_of()
    got = {
        names[r["vid"]]: r["rank"]
        for r in pagerank(lg, alpha=0.7, personalization=pers_vids).collect()
    }
    want = nx_pagerank(g, alpha=0.7, personalization=pers_names)
    assert_allclose(got, want)


def test_nstart_and_dangling(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    vid = lg.vid_of()
    nstart = {n: (i + 1.0) for i, n in enumerate(sorted(g.nodes()))}
    dang = {"A": 2.0, "B": 1.0}
    got_df = pagerank(
        lg,
        nstart={vid[k]: v for k, v in nstart.items()},
        dangling={vid[k]: v for k, v in dang.items()},
    )
    names = lg.name_of()
    got = {names[r["vid"]]: r["rank"] for r in got_df.collect()}
    want = nx_pagerank(g, nstart=nstart, dangling=dang)
    assert_allclose(got, want)


def test_fixed_iterations_lazy_dangling(spark, tmp_path):
    """The zero-action lazy plan now covers dangling graphs (danglesum
    arrives as the contrib of a sentinel dst=-1 edge from each dangling
    vertex -- same single exchange). It must match (a) the eager
    per-iteration-action path at 1e-9 and (b) the fixed-iteration
    NetworkX-semantics oracle."""
    from nx_neptune_spark.plans.checkpoint import CheckpointManager

    g = chain_digraph()  # chain tail has no out-edges -> dangling mass
    got_lazy = run_spark_pagerank(spark, g, fixed_iterations=20)
    # durable checkpoint dir forces the eager path at the same depth
    cp = CheckpointManager(spark, str(tmp_path / "pr_eager"), algorithm="pagerank")
    got_eager = run_spark_pagerank(spark, g, fixed_iterations=20, checkpoint=cp)
    assert_allclose(got_lazy, got_eager, tol=1e-9)
    from oracles import nx_pagerank_fixed

    assert_allclose(got_lazy, nx_pagerank_fixed(g, 20), tol=1e-9)


def test_fixed_iterations_lazy_dangling_custom_weights(spark):
    """Lazy dangling path with a non-default dangling distribution."""
    g = chain_digraph()
    dang = {"A": 2.0, "B": 1.0}
    lg = LinkGraph.from_networkx(spark, g)
    vid, names = lg.vid_of(), lg.name_of()
    got = {
        names[r["vid"]]: r["rank"]
        for r in pagerank(
            lg, dangling={vid[k]: v for k, v in dang.items()}, fixed_iterations=20
        ).collect()
    }
    from oracles import nx_pagerank_fixed

    assert_allclose(got, nx_pagerank_fixed(g, 20, dangling=dang), tol=1e-9)


def test_non_convergence_raises(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(Exception):
        pagerank(lg, max_iter=2, tol=1e-12)


def _blocked_stop_depth(g, k, tol=1e-6, weight="weight"):
    """First multiple of ``k`` whose L1 delta is < N*tol -- exactly the
    blocked path's stopping rule, derived from the NX delta sequence."""
    from oracles import nx_pagerank_deltas

    n = len(g)
    deltas = nx_pagerank_deltas(g, up_to=100, weight=weight)
    for i, d in enumerate(deltas):
        it = i + 1  # number of updates performed
        if it % k == 0 and d < n * tol:
            return it
    raise AssertionError("fixture never converges within 100 iterations")


def test_blocked_convergence_exact_depth(spark):
    """check_every=k stops at the first multiple of k whose L1 delta
    crosses the NetworkX threshold, and the result is bit-comparable
    to the lazy fixed-depth plan at that exact depth (same arithmetic,
    same plan body)."""
    from oracles import nx_pagerank_fixed

    g = gnp_digraph()
    k = 4
    m = _blocked_stop_depth(g, k)
    got_blocked = run_spark_pagerank(spark, g, check_every=k)
    got_fixed = run_spark_pagerank(spark, g, fixed_iterations=m)
    assert_allclose(got_blocked, got_fixed, tol=1e-12)
    assert_allclose(got_blocked, nx_pagerank_fixed(g, m), tol=1e-9)


def test_blocked_convergence_dangling(spark):
    """Blocked mode on a dangling graph exercises the sentinel-edge
    danglesum inside the lazy block body."""
    from oracles import nx_pagerank_fixed

    g = chain_digraph()  # chain tail is dangling
    k = 3
    m = _blocked_stop_depth(g, k)
    got = run_spark_pagerank(spark, g, check_every=k)
    assert_allclose(got, nx_pagerank_fixed(g, m), tol=1e-9)


def test_blocked_durable_checkpoint_resume(spark, tmp_path):
    """Durable checkpoints are written at block granularity; a run
    killed mid-convergence resumes from the last block and finishes
    with the same values as an uninterrupted blocked run."""
    from nx_neptune_spark.plans.checkpoint import CheckpointManager

    g = gnp_digraph()
    k = 4
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()

    cp1 = CheckpointManager(spark, str(tmp_path / "pr_blk"), algorithm="pagerank")
    # first run: stop after one block (max_iter=k, no raise)
    pagerank(lg, check_every=k, max_iter=k, raise_on_no_convergence=False, checkpoint=cp1)
    m1 = cp1.latest_manifest()
    assert m1 is not None
    assert m1["metrics"]["iteration"] == k - 1
    assert m1["metrics"]["check_every"] == k
    assert not m1.get("complete")

    # resume to convergence
    cp2 = CheckpointManager(spark, str(tmp_path / "pr_blk"), algorithm="pagerank")
    got_df = pagerank(lg, check_every=k, checkpoint=cp2)
    got = {names[r["vid"]]: r["rank"] for r in got_df.collect()}
    assert cp2.latest_manifest().get("complete")

    want = run_spark_pagerank(spark, g, check_every=k)
    assert_allclose(got, want, tol=1e-12)


def test_blocked_non_convergence_raises(spark):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    with pytest.raises(Exception):
        pagerank(lg, max_iter=4, tol=1e-12, check_every=2)


def test_hub_split_forced_values_unchanged(spark):
    """Forcing the join-skew hub split (explicit degree threshold) on a
    power-law graph must leave values unchanged vs the plain
    co-partitioned join -- only the physical placement of hub-src edge
    rows differs."""
    g = barabasi()
    want = run_spark_pagerank(spark, g, hub_split=None, fixed_iterations=20)
    got = run_spark_pagerank(spark, g, hub_split=5, fixed_iterations=20)
    assert_allclose(got, want, tol=1e-9)
    # blocked tol-driven body goes through the same _join_contribs
    got_blk = run_spark_pagerank(spark, g, hub_split=5, check_every=4)
    want_blk = run_spark_pagerank(spark, g, hub_split=None, check_every=4)
    assert_allclose(got_blk, want_blk, tol=1e-9)


def test_hub_split_auto_decision(spark, monkeypatch):
    """Auto mode engages only past BOTH thresholds (absolute floor AND
    HUB_IDEAL_MULTIPLE x ideal rows/partition). The multiple is
    calibrated for bench-scale graphs (PLANS.md §17), so the trigger
    case patches it down to make a 12k-out-degree hub qualify at the
    test's npart=4; values must still match NetworkX."""
    import sys

    import networkx as nx

    from oracles import nx_pagerank_fixed

    # `operators.__init__` re-exports the pagerank FUNCTION, shadowing
    # the submodule attribute -- resolve the module itself
    prmod = sys.modules["nx_neptune_spark.operators.pagerank"]

    g = nx.DiGraph()
    g.add_edges_from((0, i) for i in range(1, 12001))
    g.add_edges_from((i, 0) for i in range(1, 51))
    lg = LinkGraph.from_networkx(spark, g)

    # default multiple: hub share (~100%) < 16/npart is impossible to
    # reach at npart=4, so auto stays off
    stats_off: dict = {}
    pagerank(lg, fixed_iterations=5, stats=stats_off)
    assert stats_off["hub_split_keys"] == 0

    monkeypatch.setattr(prmod, "HUB_IDEAL_MULTIPLE", 2)
    stats: dict = {}
    res = pagerank(lg, fixed_iterations=5, stats=stats)
    assert stats["hub_split_keys"] == 1
    names = lg.name_of()
    got = {names[r["vid"]]: r["rank"] for r in res.collect()}
    assert_allclose(got, nx_pagerank_fixed(g, 5), tol=1e-9)

    # small fixture: auto stays off even with the patched multiple
    # (absolute floor)
    stats2: dict = {}
    lg2 = LinkGraph.from_networkx(spark, barabasi())
    pagerank(lg2, fixed_iterations=2, stats=stats2)
    assert stats2["hub_split_keys"] == 0


def test_entry_converged_depth_pinned(spark, tmp_path):
    """__spark_entry__.q_pagerank_converged's oracle unrolls to exactly
    PR_CONV_ORACLE_ITERS updates; pin that the engine's blocked run on
    the same graph stops at that depth (manifest iteration count)."""
    import __spark_entry__ as entry
    from nx_neptune_spark.plans.checkpoint import CheckpointManager

    g = entry._pr_graph(spark, "/root/testdata/sf0.001")
    cp = CheckpointManager(spark, str(tmp_path / "pr_conv"), algorithm="pagerank")
    pagerank(
        g,
        alpha=entry.ALPHA,
        tol=entry.PR_CONV_TOL,
        max_iter=100,
        check_every=entry.PR_CONV_CHECK_EVERY,
        checkpoint=cp,
    )
    m = cp.latest_manifest()
    assert m.get("complete")
    assert m["metrics"]["iteration"] == entry.PR_CONV_ORACLE_ITERS - 1
