"""Gremlin-CSV graph import/export (reference data-lake parity).

Mirrors the reference's S3-CSV bulk formats and header conventions:
  * reserved columns ~id, ~label (vertices) and ~id, ~from, ~to, ~label
    (edges): /root/reference/nx_neptune/instance_management.py:1216-1238
  * typed headers `name:Long` -> bigint, untyped -> string, `:Vector`
    -> ';'-joined float array: instance_management.py:1300-1322,
    nx_neptune/utils/utils.py:423-431
  * import (A1 import_csv_from_s3, instance_management.py:520-572) ->
    spark.read.csv; export (A2 export_csv_to_s3, :575-621) ->
    df.write.csv with optional row filters standing in for Neptune's
    exportFilter.

Paths are any Hadoop-FS URI (s3a:// on a real cluster, file:// here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import LinkGraph

TYPE_MAP = {
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "bool": "boolean",
    "string": "string",
}


def _parse_header(col: str) -> tuple[str, str | None]:
    """'age:Long' -> ('age', 'long'); '~id' -> ('~id', None)."""
    if ":" in col and not col.startswith("~"):
        name, typ = col.rsplit(":", 1)
        return name, typ.lower()
    return col, None


def read_vertex_csv(spark: SparkSession, path: str) -> DataFrame:
    """Gremlin vertex CSV -> DataFrame(name string, label string, props...).

    Header-driven typing like the reference's Athena DDL inference;
    ':Vector' columns become array<float> (';'-separated on disk).
    """
    raw = spark.read.option("header", True).csv(path)
    return _apply_types(raw, id_cols={"~id": "name"})


def read_edge_csv(spark: SparkSession, path: str) -> DataFrame:
    """Gremlin edge CSV -> DataFrame(src_name, dst_name, label, props...)."""
    raw = spark.read.option("header", True).csv(path)
    return _apply_types(raw, id_cols={"~from": "src_name", "~to": "dst_name", "~id": "edge_id"})


def _apply_types(raw: DataFrame, id_cols: dict[str, str]) -> DataFrame:
    cols = []
    for c in raw.columns:
        if c in id_cols:
            cols.append(F.col(f"`{c}`").alias(id_cols[c]))
            continue
        if c == "~label":
            cols.append(F.col("`~label`").alias("label"))
            continue
        name, typ = _parse_header(c)
        if typ == "vector":
            cols.append(
                F.transform(F.split(F.col(f"`{c}`"), ";"), lambda x: x.cast("float")).alias(name)
            )
        elif typ in TYPE_MAP:
            cols.append(F.col(f"`{c}`").cast(TYPE_MAP[typ]).alias(name))
        else:
            cols.append(F.col(f"`{c}`").alias(name))
    return raw.select(*cols)


def graph_from_csv(spark: SparkSession, vertex_path: str, edge_path: str,
                   directed: bool = True) -> LinkGraph:
    """Full import path (reference A1 + session_manager.import_from_csv):
    CSV files -> typed DataFrames -> dense-id LinkGraph."""
    edge_cols = read_edge_csv(spark, edge_path)
    keep = ["src_name", "dst_name"] + (
        ["weight"] if "weight" in edge_cols.columns else []
    )
    edges_named = edge_cols.select(*keep)
    g = LinkGraph.from_vertex_names(spark, edges_named, directed=directed)
    # attach labels of any isolated vertices present only in the vertex file
    v = read_vertex_csv(spark, vertex_path).select(F.col("name"))
    missing = v.join(g.vertices.select("name"), "name", "left_anti")
    if not missing.isEmpty():
        # rebuild dictionary over the union so isolated vertices get ids
        from ..graph import assign_dense_ids

        all_names = v.unionByName(g.vertices.select("name")).distinct()
        vertices = assign_dense_ids(all_names)
        edges = (
            edges_named.join(
                vertices.select(F.col("name").alias("src_name"), F.col("vid").alias("src")),
                "src_name",
            )
            .join(
                vertices.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")),
                "dst_name",
            )
            .select("src", "dst", *(["weight"] if "weight" in edges_named.columns else []))
        )
        g = LinkGraph(edges, vertices, directed=directed, vids_non_negative=True)
    return g


def export_graph_csv(
    graph: LinkGraph,
    vertex_path: str,
    edge_path: str,
    vertex_filter=None,
    edge_filter=None,
    vertex_label: str = "Node",
    edge_label: str = "RELATES_TO",
) -> None:
    """Export to Gremlin-CSV (reference A2 export_csv_to_s3 with
    exportFilter -> plain .where() pushed before the write; default
    labels mirror na_models.py:21,93)."""
    v = graph.vertices
    if vertex_filter is not None:
        v = v.where(vertex_filter)
    (
        v.select(
            F.col("name").alias("~id"),
            F.lit(vertex_label).alias("~label"),
            F.col("vid").cast("string").alias("vid:Long"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(vertex_path)
    )
    e = graph.edges
    if edge_filter is not None:
        e = e.where(edge_filter)
    names = graph.vertices
    (
        e.join(names.select(F.col("vid").alias("src"), F.col("name").alias("~from")), "src")
        .join(names.select(F.col("vid").alias("dst"), F.col("name").alias("~to")), "dst")
        .select(
            F.concat(F.col("src").cast("string"), F.lit("-"), F.col("dst").cast("string")).alias("~id"),
            F.col("~from"),
            F.col("~to"),
            F.lit(edge_label).alias("~label"),
            # weighted graphs keep their weights across a roundtrip
            # (typed header, reference A2/A10 header semantics)
            *(
                [F.col("weight").cast("double").alias("weight:Double")]
                if "weight" in e.columns
                else []
            ),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(edge_path)
    )
