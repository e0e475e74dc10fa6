"""Graph CRUD (SURVEY §2.B) + projection (A9/A11) tests."""

import pytest
from pyspark.sql import functions as F

from fixtures_graphs import chain_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.operators.crud import (
    clear_graph,
    delete_edges,
    delete_nodes,
    insert_edges,
    insert_nodes,
    match_all_edges,
    match_all_nodes,
    update_edges,
    update_nodes,
)
from nx_neptune_spark.sources.projection import (
    project_edges,
    project_nodes,
    validate_projection,
)


def g0(spark):
    return LinkGraph.from_networkx(spark, chain_digraph())


def named_edges(lg):
    v = lg.vertices
    return {
        (r["s"], r["d"])
        for r in lg.edges.join(
            v.select(F.col("vid").alias("src"), F.col("name").alias("s")), "src"
        )
        .join(v.select(F.col("vid").alias("dst"), F.col("name").alias("d")), "dst")
        .select("s", "d")
        .collect()
    }


def test_insert_nodes_and_edges(spark):
    g = g0(spark)
    g2 = insert_nodes(g, ["Y", "Z"])
    assert set(g2.name_of().values()) == set(g.name_of().values()) | {"Y", "Z"}
    # dense, non-colliding vids
    vids = sorted(g2.vertices.select("vid").toPandas()["vid"])
    assert len(vids) == len(set(vids))

    g3 = insert_edges(g2, [("Y", "Z"), ("Z", "Q")])  # Q auto-created (MERGE)
    assert ("Y", "Z") in named_edges(g3) and ("Z", "Q") in named_edges(g3)
    assert "Q" in set(g3.name_of().values())
    # upsert: re-inserting an existing edge does not duplicate
    before = g3.edges.count()
    g4 = insert_edges(g3, [("Y", "Z")])
    assert g4.edges.count() == before


def test_update_and_delete(spark):
    g = g0(spark)
    g2 = update_nodes(g, ["A", "B"], "role", "seed")
    props = {
        r["name"]: dict(r["properties"] or {})
        for r in g2.vertices.collect()
    }
    assert props["A"] == {"role": "seed"} and props["B"] == {"role": "seed"}
    assert props["C"] == {}
    g2b = update_nodes(g2, ["A"], "role", "hub")
    pa = dict(g2b.vertices.where("name='A'").first()["properties"])
    assert pa == {"role": "hub"}  # overwrite, not duplicate key

    g3 = update_edges(g, [("A", "B")], "weight", "2")
    rows = {
        (r["src"], r["dst"]): dict(r["properties"] or {}) for r in g3.edges.collect()
    }
    vid = g.vid_of()
    assert rows[(vid["A"], vid["B"])] == {"weight": "2"}

    g4 = delete_nodes(g, ["C"])  # detaches B->C and C->D and E->C
    ne = named_edges(g4)
    assert all("C" not in pair for pair in ne)
    assert "C" not in set(g4.name_of().values())

    g5 = delete_edges(g, [("A", "B")])
    assert ("A", "B") not in named_edges(g5)
    assert g5.edges.count() == g.edges.count() - 1

    g6 = clear_graph(g)
    assert g6.vertices.count() == 0 and g6.edges.count() == 0


def test_match_scans(spark):
    g = g0(spark)
    assert match_all_nodes(g).count() == 6
    assert match_all_edges(g).count() == 5


def test_projection_shapes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nodes = project_nodes(
        docs,
        col_id="doc_id",
        label="Document",
        columns=["lang"],
        col_embedding="embedding",
        joins=[(emb, F.col("doc_id") == F.col("vec_id"))],
    )
    r = nodes.first()
    assert set(nodes.columns) == {"~id", "~label", "lang", "embedding:vector"}
    assert r["~label"] == "Document" and ";" in r["embedding:vector"]

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = project_edges(ev, col_from="user_id", col_to="event_id", label="DID")
    assert set(edges.columns) == {"~id", "~from", "~to", "~label"}

    with pytest.raises(ValueError):
        validate_projection(docs.select(F.col("doc_id").alias("id")), "NODE")


def test_insert_edges_preserves_weight_and_properties(spark):
    """ADVICE r1: insert_edges must not project existing edges down to
    (src,dst) -- weight/properties columns survive the upsert."""
    edges = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 7.0)], "src long, dst long, weight double"
    )
    vertices = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "C")], "vid long, name string"
    )
    g = LinkGraph(edges, vertices, directed=True)
    g = update_edges(g, [("A", "B")], "kind", "strong")  # adds properties col
    g2 = insert_edges(g, [("B", "A"), ("A", "B")])  # one new, one existing
    rows = {(r["src"], r["dst"]): r for r in g2.edges.collect()}
    assert rows[(0, 1)]["weight"] == 2.5  # existing row kept verbatim
    assert rows[(0, 1)]["properties"] == {"kind": "strong"}
    assert rows[(1, 2)]["weight"] == 7.0
    assert rows[(1, 0)]["weight"] is None  # new edge: nulls for unset cols
    assert len(rows) == 3


def test_insert_nodes_deterministic_vids(spark):
    """ADVICE r1: new vids must be deterministic (sorted dense ids), not
    partition-layout-dependent zipWithIndex output."""
    g = g0(spark)
    names = ["zeta", "alpha", "mid", "beta", "tail", "omega"]
    vids1 = insert_nodes(g, names).vid_of()
    vids2 = insert_nodes(g, list(reversed(names))).vid_of()
    assert vids1 == vids2
    base = max(g.vid_of().values())
    new_sorted = sorted(names)
    for i, n in enumerate(new_sorted):
        assert vids1[n] == base + 1 + i


def test_create_csv_table_escapes_path(spark, tmp_path):
    """ADVICE r1: single quotes in the path cannot smuggle SQL."""
    from nx_neptune_spark.sources.tables import create_csv_table, drop_table

    d = tmp_path / "it's data"
    d.mkdir()
    (d / "x.csv").write_text("a,b\n1,2\n")
    create_csv_table(spark, "quoted_path_tbl", str(d))
    assert spark.table("quoted_path_tbl").count() == 1
    drop_table(spark, "quoted_path_tbl")


def test_insert_edges_undirected_double_insert(spark):
    """directed=False MERGEs both orientations into a directed graph
    (reference double-insert, opencypher_builder.py:311-321)."""
    from nx_neptune_spark.graph import LinkGraph
    import pyspark.sql.functions as F

    base = LinkGraph(
        spark.createDataFrame([], "src long, dst long"),
        spark.createDataFrame([], "vid long, name string"),
        directed=True,
    )
    g = insert_edges(base, [("A", "B")], directed=False)
    pairs = {(r["src"], r["dst"]) for r in g.edges.collect()}
    vid = {r["name"]: r["vid"] for r in g.vertices.collect()}
    assert (vid["A"], vid["B"]) in pairs and (vid["B"], vid["A"]) in pairs
    # default (None) on a directed graph stays single-direction
    g1 = insert_edges(base, [("A", "B")])
    assert g1.edges.count() == 1


def test_update_delete_edges_undirected_either_orientation(spark):
    """Undirected graphs store one canonical row; update/delete given
    in the reverse orientation must still hit it (reference
    double-insert equivalence)."""
    from nx_neptune_spark.graph import LinkGraph

    base = LinkGraph(
        spark.createDataFrame([], "src long, dst long"),
        spark.createDataFrame([], "vid long, name string"),
        directed=False,
    )
    g = insert_edges(base, [("A", "B")])
    g1 = update_edges(g, [("B", "A")], "kind", "strong")
    props = [r["properties"] for r in g1.edges.collect()]
    assert props and props[0]["kind"] == "strong"
    g2 = delete_edges(g, [("B", "A")])
    assert g2.edges.count() == 0


def test_insert_edges_undirected_reverse_is_noop(spark):
    """ADVICE r2: on an undirected graph, inserting the REVERSE of an
    existing edge must MERGE (no duplicate row -- symmetric_edges()
    would double-count it in degree/pagerank/triangles); reverse
    duplicates within one batch collapse to a single stored row."""
    from nx_neptune_spark.graph import LinkGraph

    base = LinkGraph(
        spark.createDataFrame([], "src long, dst long"),
        spark.createDataFrame([], "vid long, name string"),
        directed=False,
    )
    g = insert_edges(base, [("A", "B")])
    assert g.edges.count() == 1
    # reverse of an existing edge: no-op
    g2 = insert_edges(g, [("B", "A")])
    assert g2.edges.count() == 1
    assert g2.symmetric_edges().count() == 2
    # both orientations in ONE batch: one stored row
    g3 = insert_edges(g, [("C", "D"), ("D", "C")])
    assert g3.edges.count() == 2
    assert g3.symmetric_edges().count() == 4
