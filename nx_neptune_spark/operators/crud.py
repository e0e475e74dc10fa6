"""Graph CRUD: the reference's openCypher mutation surface as
DataFrame set operations (SURVEY.md §2.B).

The reference generates parameterized openCypher per mutation
(/root/reference/nx_neptune/clients/opencypher_builder.py): insert_node
:199-228, batch insert_nodes :231-254, insert_edge with MERGE upsert
:257-295, batch insert_edges :298-321 (undirected -> both directions,
:311-321), update_node/edge :355-436, delete_node/edge :439-487,
clear :490-506. Here every mutation is a pure DataFrame transform
returning a NEW LinkGraph (immutable snapshots -- the natural Spark
shape; Iceberg MERGE/DELETE would make them table mutations).

Properties follow the reference's schemaless dict model
(na_models.py:24-41) as map<string,string> columns.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _with_props(df: DataFrame, props_col: str = "properties") -> DataFrame:
    if props_col not in df.columns:
        return df.withColumn(
            props_col, F.create_map().cast("map<string,string>")
        )
    return df


# -- B1/B2: scans -----------------------------------------------------------

def match_all_nodes(graph: LinkGraph) -> DataFrame:
    """MATCH (n) RETURN n (opencypher_builder.py:163-175)."""
    return graph.vertices


def match_all_edges(graph: LinkGraph) -> DataFrame:
    """MATCH (a)-[r]->(b) RETURN r (opencypher_builder.py:178-196)."""
    return graph.edges


# -- B3/B4: node insert ------------------------------------------------------

def insert_nodes(graph: LinkGraph, names: Iterable[str] | DataFrame) -> LinkGraph:
    """Batch node insert (UNWIND-batched in the reference,
    opencypher_builder.py:231-254). New vids continue after max(vid)."""
    spark = graph.spark
    if isinstance(names, DataFrame):
        new_names = names.select(F.col(names.columns[0]).alias("name"))
    else:
        new_names = spark.createDataFrame([(str(n),) for n in names], "name string")
    new_names = new_names.distinct().join(
        graph.vertices.select("name"), "name", "left_anti"
    )
    base = graph.vertices.agg(F.coalesce(F.max("vid"), F.lit(-1))).first()[0]
    # Deterministic id assignment: reuse assign_dense_ids' sorted
    # range-partition + zipWithIndex recipe (graph.py:50-67) offset by
    # max(vid)+1, so new ids are identical across runs / cluster sizes
    # (zipWithIndex over an unsorted join result would depend on
    # partition layout).
    from ..graph import assign_dense_ids

    added = assign_dense_ids(new_names, "name").select(
        (F.col("vid") + F.lit(base + 1)).alias("vid"), "name"
    )
    return LinkGraph(
        graph.edges,
        graph.vertices.unionByName(added, allowMissingColumns=True),
        directed=graph.directed,
        vids_non_negative=graph.vids_non_negative,
    )


# -- B5/B6: edge insert (MERGE upsert semantics) -----------------------------

def insert_edges(
    graph: LinkGraph, pairs: Iterable[tuple] | DataFrame, directed: bool | None = None
) -> LinkGraph:
    """Edge upsert: MERGE semantics (no duplicate (src,dst) rows,
    opencypher_builder.py:257-295); undirected graphs materialize both
    directions like the reference (:311-321) via symmetric_edges().

    ``directed=False`` inserts the batch as undirected relationships —
    both (a,b) and (b,a) rows are MERGEd — even into a directed graph
    (the reference's double-insert, :311-321). ``None`` inherits the
    graph's own directedness (a directed graph gets one row per pair;
    an undirected graph stores one canonical row and both directions
    come from the symmetric_edges() view)."""
    spark = graph.spark
    if isinstance(pairs, DataFrame):
        new_named = pairs.select(
            F.col(pairs.columns[0]).alias("src_name"),
            F.col(pairs.columns[1]).alias("dst_name"),
        )
    else:
        new_named = spark.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], "src_name string, dst_name string"
        )
    # auto-create endpoint nodes (MERGE (a) MERGE (b) behavior)
    g = insert_nodes(
        graph,
        new_named.select(F.col("src_name").alias("name"))
        .unionByName(new_named.select(F.col("dst_name").alias("name")))
        .distinct(),
    )
    v = g.vertices
    new_edges = (
        new_named.join(
            v.select(F.col("name").alias("src_name"), F.col("vid").alias("src")),
            "src_name",
        )
        .join(
            v.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")),
            "dst_name",
        )
        .select("src", "dst")
    )
    if directed is False and graph.directed:
        # reference double-insert: an undirected relationship in a
        # directed graph stores both orientations
        new_edges = new_edges.unionByName(
            new_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # MERGE semantics preserving extra edge columns (weight, properties,
    # ...): existing rows are kept verbatim; only genuinely-new (src,dst)
    # pairs are appended, with nulls for columns the insert doesn't set.
    # On an undirected graph the stored row is canonical-but-arbitrary
    # orientation, so (1) the incoming batch is canonicalized (least,
    # greatest) -- also collapsing reverse duplicates within the batch --
    # and (2) the anti-join checks BOTH orientations of existing rows;
    # otherwise inserting (B,A) when (A,B) is stored would append a
    # duplicate that symmetric_edges() then double-counts (same
    # either-orientation semantics as update_edges/delete_edges).
    existing = g.edges.select("src", "dst")
    if not graph.directed:
        new_edges = new_edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        existing = existing.unionByName(
            g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    fresh = new_edges.dropDuplicates(["src", "dst"]).join(
        existing, ["src", "dst"], "left_anti"
    )
    merged = g.edges.unionByName(fresh, allowMissingColumns=True)
    return LinkGraph(
        merged, g.vertices, directed=graph.directed,
        vids_non_negative=g.vids_non_negative,
    )


# -- B7/B8: property updates -------------------------------------------------

def update_nodes(
    graph: LinkGraph, names: list[str], key: str, value: str
) -> LinkGraph:
    """SET n.key = value for an id list (OR-chain in the reference,
    opencypher_builder.py:355-387). Properties live in a
    map<string,string> column, created on demand."""
    v = _with_props(graph.vertices)
    cond = F.col("name").isin([str(n) for n in names])
    updated = v.withColumn(
        "properties",
        F.when(
            cond,
            F.map_concat(
                F.map_filter(F.col("properties"), lambda k, _: k != F.lit(key)),
                F.create_map(F.lit(key), F.lit(str(value))),
            ),
        ).otherwise(F.col("properties")),
    )
    return LinkGraph(graph.edges, updated, directed=graph.directed,
                     vids_non_negative=graph.vids_non_negative)


def update_edges(
    graph: LinkGraph, pairs: list[tuple], key: str, value: str
) -> LinkGraph:
    """SET r.key = value for (src_name, dst_name) pairs
    (opencypher_builder.py:390-436). On undirected graphs the stored
    row is canonical (one orientation), so the match accepts either
    orientation — equivalent to the reference's double-insert model
    where the directed pattern always finds the given orientation."""
    vid_of = graph.vid_of()
    idpairs = [(vid_of[str(a)], vid_of[str(b)]) for a, b in pairs]
    e = _with_props(graph.edges)
    cond = F.lit(False)
    for a, b in idpairs:  # OR-chain, mirroring the reference's WHERE
        cond = cond | ((F.col("src") == F.lit(int(a))) & (F.col("dst") == F.lit(int(b))))
        if not graph.directed:
            cond = cond | (
                (F.col("src") == F.lit(int(b))) & (F.col("dst") == F.lit(int(a)))
            )
    updated = e.withColumn(
        "properties",
        F.when(
            cond,
            F.map_concat(
                F.map_filter(F.col("properties"), lambda k, _: k != F.lit(key)),
                F.create_map(F.lit(key), F.lit(str(value))),
            ),
        ).otherwise(F.col("properties")),
    )
    return LinkGraph(updated, graph.vertices, directed=graph.directed,
                     vids_non_negative=graph.vids_non_negative)


# -- B9/B10/B11: deletes ------------------------------------------------------

def delete_nodes(graph: LinkGraph, names: list[str]) -> LinkGraph:
    """DETACH-delete semantics: nodes plus their incident edges
    (opencypher_builder.py:439-458)."""
    doomed = graph.vertices.where(
        F.col("name").isin([str(n) for n in names])
    ).select("vid")
    vertices = graph.vertices.join(doomed, "vid", "left_anti")
    edges = (
        graph.edges.join(doomed.withColumnRenamed("vid", "src"), "src", "left_anti")
        .join(doomed.withColumnRenamed("vid", "dst"), "dst", "left_anti")
    )
    return LinkGraph(edges.select(graph.edges.columns), vertices,
                     directed=graph.directed,
                     vids_non_negative=graph.vids_non_negative)


def delete_edges(graph: LinkGraph, pairs: list[tuple]) -> LinkGraph:
    """MATCH (a)-[r]->(b) DELETE r (opencypher_builder.py:461-487).
    Undirected graphs match either orientation of the canonical row."""
    vid_of = graph.vid_of()
    idpairs = [(vid_of[str(a)], vid_of[str(b)]) for a, b in pairs]
    if not graph.directed:
        idpairs = idpairs + [(b, a) for a, b in idpairs]
    spark = graph.spark
    doomed = spark.createDataFrame(idpairs, "src long, dst long")
    edges = graph.edges.join(doomed, ["src", "dst"], "left_anti")
    return LinkGraph(edges, graph.vertices, directed=graph.directed,
                     vids_non_negative=graph.vids_non_negative)


def clear_graph(graph: LinkGraph) -> LinkGraph:
    """MATCH (n) DETACH DELETE n (opencypher_builder.py:490-506)."""
    spark = graph.spark
    return LinkGraph(
        spark.createDataFrame([], "src long, dst long"),
        spark.createDataFrame([], "vid long, name string"),
        directed=graph.directed,
        vids_non_negative=True,
    )
