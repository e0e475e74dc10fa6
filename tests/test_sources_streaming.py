"""CSV graph import/export roundtrip + structured streaming tests."""

import os

from pyspark.sql import functions as F

from fixtures_graphs import chain_digraph
from nx_neptune_spark.graph import LinkGraph
from nx_neptune_spark.sources.csv_graph import (
    export_graph_csv,
    graph_from_csv,
    read_edge_csv,
    read_vertex_csv,
)
from nx_neptune_spark.sources.pages import generate_pages
from nx_neptune_spark.streaming.events import (
    streaming_edge_ingest,
    windowed_event_counts,
)


def test_csv_roundtrip(spark, tmp_path):
    g = LinkGraph.from_networkx(spark, chain_digraph())
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    export_graph_csv(g, vp, ep)
    g2 = graph_from_csv(spark, vp, ep)
    # same named edge set
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

    assert named_edges(g) == named_edges(g2)
    # isolated node X preserved through the vertex file
    assert set(g2.name_of().values()) == set(g.name_of().values())


def test_typed_headers(spark, tmp_path):
    p = str(tmp_path / "typed")
    os.makedirs(p)
    with open(os.path.join(p, "v.csv"), "w") as f:
        f.write("~id,~label,age:Long,score:Double,emb:Vector\n")
        f.write("a,Node,30,1.5,0.1;0.2;0.3\n")
    df = read_vertex_csv(spark, p)
    row = df.first()
    assert row["name"] == "a" and row["age"] == 30 and abs(row["score"] - 1.5) < 1e-12
    assert [round(x, 4) for x in row["emb"]] == [0.1, 0.2, 0.3]
    with open(os.path.join(p, "e.csv"), "w") as f:
        f.write("~id,~from,~to,~label,weight:Double\n")
        f.write("e1,a,b,LINK,2.5\n")
    e = read_edge_csv(spark, p + "/e.csv").first()
    assert (e["src_name"], e["dst_name"], e["weight"]) == ("a", "b", 2.5)


def test_streaming_windowed_counts(spark, tmp_path):
    src_dir = str(tmp_path / "stream_in")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select window_start, event_type, n, sum_value from win_counts"
    ).collect()
    # batch oracle on the same data
    want = {
        (str(r["ws"]), r["event_type"]): (r["n"], round(r["sv"], 6))
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    gotd = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in got
    }
    assert gotd == want


def test_streaming_edge_ingest(spark, tmp_path):
    src_dir = str(tmp_path / "pages_in")
    pages = generate_pages(spark, 60)
    pages.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(pages.schema).parquet(src_dir)
    edges = streaming_edge_ingest(stream)
    q = (
        edges.writeStream.format("memory")
        .queryName("edge_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["src_name"], r["dst_name"])
        for r in spark.sql("select src_name, dst_name from edge_ingest").collect()
    }
    from nx_neptune_spark.functions.extraction import pages_to_link_pairs

    want = {(r["src_name"], r["dst_name"]) for r in pages_to_link_pairs(pages).collect()}
    assert got == want


def test_csv_roundtrip_preserves_weights(spark, tmp_path):
    """Weighted graphs keep their weights across export/import
    (previously the weight column was silently dropped)."""
    from nx_neptune_spark.graph import LinkGraph
    from nx_neptune_spark.sources.csv_graph import export_graph_csv, graph_from_csv
    import pyspark.sql.functions as F

    edges = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 0.5)], "src long, dst long, weight double"
    )
    vertices = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "vid long, name string"
    )
    g = LinkGraph(edges, vertices, directed=True, vids_non_negative=True)
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    export_graph_csv(g, vp, ep)
    g2 = graph_from_csv(spark, vp, ep)
    assert "weight" in g2.edges.columns
    name_of = {r["vid"]: r["name"] for r in g2.vertices.collect()}
    got = {
        (name_of[r["src"]], name_of[r["dst"]]): r["weight"]
        for r in g2.edges.collect()
    }
    assert got == {("a", "b"): 2.5, ("b", "c"): 0.5}
