"""Resumability: kill after iteration k, resume from the manifest,
assert identical final scores (SURVEY.md §5.2 item 4)."""

import json
import os

from fixtures_graphs import gnp_digraph
from oracles import nx_pagerank
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.pagerank import pagerank
from nx_neptune_spark.plans.checkpoint import CheckpointManager


def ranks_dict(df, names):
    return {names[r["vid"]]: r["rank"] for r in df.collect()}


def test_resume_mid_run_identical(spark, tmp_path):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    ckdir = str(tmp_path / "ck")

    # full run, durable checkpoints every iteration
    cp_full = CheckpointManager(spark, ckdir, run_id="full", algorithm="pagerank")
    full = ranks_dict(pagerank(lg, checkpoint=cp_full), names)

    # interrupted run: stop hard after 3 iterations (simulated kill)
    cp_a = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="pagerank")
    try:
        pagerank(lg, checkpoint=cp_a, fixed_iterations=3, raise_on_no_convergence=False)
    except Exception:
        pass
    m = cp_a.latest_manifest()
    assert m is not None and m["metrics"]["iteration"] == 2
    assert m["partition_lineage"], "manifest must carry partition lineage"

    # resume with a fresh manager pointing at the same run dir
    cp_b = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="pagerank")
    resumed = ranks_dict(pagerank(lg, checkpoint=cp_b), names)

    for k in full:
        assert abs(full[k] - resumed[k]) < 1e-12, (k, full[k], resumed[k])

    # final manifest marked complete
    m2 = cp_b.latest_manifest()
    assert m2["complete"] is True

    # oracle sanity on the resumed result
    want = nx_pagerank(g)
    for k, v in want.items():
        assert abs(resumed[str(k)] - v) < 1e-6


def test_manifest_contents(spark, tmp_path):
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    ckdir = str(tmp_path / "ck2")
    cp = CheckpointManager(
        spark, ckdir, run_id="r1", algorithm="pagerank", params={"alpha": 0.85}
    )
    pagerank(lg, checkpoint=cp)
    run_dir = os.path.join(ckdir, "r1")
    iters = sorted(d for d in os.listdir(run_dir) if d.startswith("iter_"))
    assert len(iters) >= 2
    with open(os.path.join(run_dir, iters[0], "manifest.json")) as f:
        man = json.load(f)
    assert man["algorithm"] == "pagerank"
    assert man["params"] == {"alpha": 0.85}
    assert man["metrics"]["shuffle_partitions"] is not None
    assert man["metrics"]["delta"] is None or man["metrics"]["delta"] >= 0
    assert all(p["file"].startswith("part-") for p in man["partition_lineage"])


def test_cc_resume_mid_run_identical(spark, tmp_path):
    """Kill connected-components mid-run, resume from the manifest,
    assert the final component map is identical (VERDICT r1 item 9)."""
    from nx_neptune_spark.operators.components import connected_components

    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    ckdir = str(tmp_path / "cc_ck")

    cp_full = CheckpointManager(spark, ckdir, run_id="full", algorithm="cc")
    full = {r["vid"]: r["component"] for r in connected_components(lg, checkpoint=cp_full).collect()}

    # interrupted run: cap at 1 star-contraction round (simulated kill)
    cp_a = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="cc")
    connected_components(lg, max_iter=1, checkpoint=cp_a)
    m = cp_a.latest_manifest()
    assert m is not None and m["metrics"]["iteration"] == 0
    assert m["partition_lineage"]

    cp_b = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="cc")
    resumed = {
        r["vid"]: r["component"] for r in connected_components(lg, checkpoint=cp_b).collect()
    }
    assert resumed == full
    assert cp_b.latest_manifest()["complete"] is True


def test_lpa_resume_mid_run_identical(spark, tmp_path):
    """Kill LPA mid-run, resume, assert identical final labels."""
    from fixtures_graphs import two_triangles_bridge
    from nx_neptune_spark.operators.label_propagation import label_propagation

    g = two_triangles_bridge()
    lg = LinkGraph.from_networkx(spark, g)
    ckdir = str(tmp_path / "lpa_ck")

    cp_full = CheckpointManager(spark, ckdir, run_id="full", algorithm="lpa")
    full = {r["vid"]: r["label"] for r in label_propagation(lg, checkpoint=cp_full).collect()}

    cp_a = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="lpa")
    label_propagation(lg, max_iterations=1, checkpoint=cp_a)
    m = cp_a.latest_manifest()
    assert m is not None and m["metrics"]["iteration"] == 0

    cp_b = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="lpa")
    resumed = {
        r["vid"]: r["label"] for r in label_propagation(lg, checkpoint=cp_b).collect()
    }
    assert resumed == full
    assert cp_b.latest_manifest()["complete"] is True


def test_off_stride_finalize_resume(spark, tmp_path):
    """Convergence on an iteration off the `every` stride must still
    leave a resumable run: finalize durably writes the final state (a
    stub manifest without state would crash resume with KeyError)."""
    from nx_neptune_spark.operators.components import connected_components
    from fixtures_graphs import barabasi

    lg = LinkGraph.from_networkx(spark, barabasi())
    ckdir = str(tmp_path / "ck_stride")
    cp = CheckpointManager(
        spark, ckdir, run_id="stride", algorithm="connected_components", every=7
    )
    first = {r["vid"]: r["component"] for r in connected_components(lg, checkpoint=cp).collect()}

    # a fresh manager on the same dir must resume cleanly (either a
    # complete manifest with real state, or an honest nothing-durable)
    cp2 = CheckpointManager(
        spark, ckdir, run_id="stride", algorithm="connected_components", every=7
    )
    res = cp2.resume()
    if res is not None:
        state, manifest = res
        assert "metrics" in manifest and manifest.get("state_path")
    again = {r["vid"]: r["component"] for r in connected_components(lg, checkpoint=cp2).collect()}
    assert again == first


def test_adaptive_disabled_nesting(spark):
    from nx_neptune_spark.session import adaptive_disabled

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    with adaptive_disabled(spark):
        assert spark.conf.get(key) == "false"
        with adaptive_disabled(spark):
            assert spark.conf.get(key) == "false"
        # inner exit must NOT restore early
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == orig


def test_resume_skips_corrupt_lineage(spark, tmp_path):
    """A checkpoint whose state files don't match the recorded
    per-partition lineage (torn write / corruption) is skipped; resume
    falls back to the previous intact iteration."""
    g = gnp_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    ckdir = str(tmp_path / "ck_lineage")
    cp = CheckpointManager(spark, ckdir, run_id="lin", algorithm="pagerank")
    try:
        pagerank(lg, checkpoint=cp, max_iter=4, raise_on_no_convergence=False)
    except Exception:
        pass
    run_dir = os.path.join(ckdir, "lin")
    iters = sorted(d for d in os.listdir(run_dir) if d.startswith("iter_"))
    assert len(iters) >= 2
    # corrupt the newest checkpoint: change one part file's size
    newest = os.path.join(run_dir, iters[-1], "state.parquet")
    part = next(f for f in sorted(os.listdir(newest)) if f.startswith("part-"))
    with open(os.path.join(newest, part), "ab") as f:
        f.write(b"torn")
    cp2 = CheckpointManager(spark, ckdir, run_id="lin", algorithm="pagerank")
    m = cp2.latest_manifest()
    assert m is not None
    assert m["metrics"]["iteration"] == int(iters[-2].split("_")[1])


def test_louvain_resume_mid_run_identical(spark, tmp_path):
    """Kill Louvain at a level boundary (max_levels budget exhausted ->
    manifest left incomplete), resume with full budget, assert the
    final communities are identical to an uninterrupted run; the
    converged run's complete manifest short-circuits a re-call."""
    import networkx as nx

    from nx_neptune_spark.operators.louvain import louvain_communities

    g = nx.Graph()
    for b in range(0, 30, 5):  # 6 disjoint 5-cliques
        for i in range(b, b + 5):
            for j in range(i + 1, b + 5):
                g.add_edge(i, j)
    # bridges chain the cliques so >1 level of contraction happens
    for b in range(0, 25, 5):
        g.add_edge(b, b + 5)
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    ckdir = str(tmp_path / "ck_louvain")

    def comms(df):
        return {names[r["vid"]]: r["community"] for r in df.collect()}

    cp_full = CheckpointManager(spark, ckdir, run_id="full", algorithm="louvain")
    full = comms(louvain_communities(lg, checkpoint=cp_full))
    assert cp_full.latest_manifest()["complete"] is True

    # interrupted: one level of budget only -> incomplete manifest
    cp_a = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="louvain")
    louvain_communities(lg, max_levels=1, checkpoint=cp_a)
    m = cp_a.latest_manifest()
    assert m is not None and not m.get("complete")
    assert m["metrics"]["iteration"] == 0
    assert m["partition_lineage"]

    # resume continues from level 1 and must land on the same result
    cp_b = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="louvain")
    resumed = comms(louvain_communities(lg, checkpoint=cp_b))
    assert resumed == full
    assert cp_b.latest_manifest()["complete"] is True

    # a converged run re-called on the same dir returns the stored final
    cp_c = CheckpointManager(spark, ckdir, run_id="resumable", algorithm="louvain")
    again = comms(louvain_communities(lg, checkpoint=cp_c))
    assert again == full
