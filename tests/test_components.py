"""Connected components vs NetworkX (exact, north rule)."""

import networkx as nx
import pytest

from fixtures_graphs import barabasi, chain_digraph, gnp_digraph, two_triangles_bridge
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.components import connected_components


def comp_sets(spark, g, algorithm):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = connected_components(lg, algorithm=algorithm).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(names[r["vid"]])
    return set(frozenset(s) for s in by_comp.values())


def nx_comp_sets(g):
    und = g.to_undirected() if g.is_directed() else g
    return set(frozenset(str(n) for n in c) for c in nx.connected_components(und))


@pytest.mark.parametrize("algorithm", ["two-phase", "minlabel"])
def test_chain_with_isolate(spark, algorithm):
    g = chain_digraph()  # 2 weak components (isolated X)
    assert comp_sets(spark, g, algorithm) == nx_comp_sets(g)


@pytest.mark.parametrize("algorithm", ["two-phase", "minlabel"])
def test_two_triangles_single_component(spark, algorithm):
    g = two_triangles_bridge()
    assert comp_sets(spark, g, algorithm) == nx_comp_sets(g)


@pytest.mark.parametrize("algorithm", ["two-phase", "minlabel"])
def test_gnp(spark, algorithm):
    g = gnp_digraph()
    assert comp_sets(spark, g, algorithm) == nx_comp_sets(g)


def test_barabasi_two_phase(spark):
    g = barabasi()
    assert comp_sets(spark, g, "two-phase") == nx_comp_sets(g)


def test_many_small_components(spark):
    g = nx.Graph()
    for i in range(0, 120, 4):
        g.add_edge(i, i + 1)
        g.add_edge(i + 1, i + 2)
        g.add_edge(i + 2, i + 3)
    assert comp_sets(spark, g, "two-phase") == nx_comp_sets(g)


def test_component_label_is_min_vid(spark):
    g = chain_digraph()
    lg = LinkGraph.from_networkx(spark, g)
    rows = {r["vid"]: r["component"] for r in connected_components(lg).collect()}
    for vid, comp in rows.items():
        assert comp <= vid
        assert rows[comp] == comp


def test_two_phase_max_iter_1_still_finalizes(spark, tmp_path):
    """Review r3: the round-0 check skip must not apply when round 0 is
    the ONLY round -- a single-round converged run still finalizes its
    durable manifest."""
    from nx_neptune_spark.graph import LinkGraph
    from nx_neptune_spark.operators.components import connected_components
    from nx_neptune_spark.plans.checkpoint import CheckpointManager

    # already (nearly) a star forest: two disjoint stars
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (5, 6), (5, 7)], "src long, dst long"
    )
    lg = LinkGraph(edges, directed=False)
    cp = CheckpointManager(
        spark, str(tmp_path / "cc1"), run_id="r", algorithm="cc"
    )
    out = {
        (r["vid"], r["component"])
        for r in connected_components(lg, max_iter=1, checkpoint=cp).collect()
    }
    assert out == {(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (7, 5)}
    m = cp.latest_manifest()
    assert m is not None and m["complete"] is True


def test_broadcast_finisher_engages_and_matches(spark):
    """Round-4 broadcast finisher: on chain-heavy structure the sparse-
    violation tail must be repaired by `fix` rounds (driver-resolved
    violation map + map-side relabel) and the result must still be
    exact vs NetworkX."""
    g = nx.Graph()
    # long paths (deep chains survive the first star rounds) + a few
    # multi-parent merges (stars sharing leaves) + isolates via path ids
    for b in range(0, 120, 30):
        nx.add_path(g, range(b, b + 30))
    g.add_edges_from([(0, 200), (30, 200), (60, 201), (90, 201)])
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    stats: dict = {}
    rows = connected_components(lg, stats=stats).collect()
    kinds = [r["kind"] for r in stats["rounds"]]
    assert "fix" in kinds, kinds
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(names[r["vid"]])
    got = set(frozenset(s) for s in by_comp.values())
    assert got == nx_comp_sets(g)


def test_broadcast_finisher_cap_falls_back_to_star(spark, monkeypatch):
    """With the violation cap forced to 0 the finisher must never
    engage; pure star rounds still converge to the same exact answer."""
    import nx_neptune_spark.operators.components as comp_mod

    g = nx.Graph()
    for b in range(0, 90, 30):
        nx.add_path(g, range(b, b + 30))
    monkeypatch.setattr(comp_mod, "FIX_MAX_VIOLATIONS", 0)
    stats: dict = {}
    assert comp_sets_with_stats(spark, g, stats) == nx_comp_sets(g)
    assert all(r["kind"] == "star" for r in stats["rounds"])
    assert any(r["kind"] == "star" for r in stats["rounds"])


def comp_sets_with_stats(spark, g, stats):
    lg = LinkGraph.from_networkx(spark, g)
    names = lg.name_of()
    rows = connected_components(lg, stats=stats).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(names[r["vid"]])
    return set(frozenset(s) for s in by_comp.values())


def test_finisher_random_differential(spark):
    """Random sparse graphs (the regime where late rounds leave sparse
    violations): exact vs NetworkX across seeds, finisher on."""
    import random

    for seed in (7, 23, 99):
        rnd = random.Random(seed)
        g = nx.Graph()
        g.add_nodes_from(range(400))
        for _ in range(380):
            a, b = rnd.randrange(400), rnd.randrange(400)
            if a != b:
                g.add_edge(a, b)
        assert comp_sets_with_stats(spark, g, {}) == nx_comp_sets(g)
