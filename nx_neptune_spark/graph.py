"""LinkGraph: the DataFrame-resident graph container.

Spark-first replacement for the reference's ``NeptuneGraph`` wrapper
(/root/reference/nx_neptune/na_graph.py:56-110), which holds a NetworkX
graph plus a remote graph id. Here the graph IS two DataFrames:

  vertices(vid: long, name: string)   -- deterministic dense-id dictionary
  edges(src: long, dst: long [, weight: double])

Undirected graphs follow the reference's convention of materializing
both directions (two directed edges per undirected edge,
/root/reference/nx_neptune/clients/opencypher_builder.py:311-321 and
na_models.py:210-217 ``to_reverse_edge``): algorithms always consume
``symmetric_edges()``.

Node ids are dense longs assigned deterministically (sorted-name
row_number), independent of partitioning and cluster size, so results
reproduce bit-for-bit across runs (SURVEY.md §4 item 5).
"""

from __future__ import annotations

from typing import Iterable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)
WEIGHTED_EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)
VERTEX_SCHEMA = StructType(
    [StructField("vid", LongType(), False), StructField("name", StringType(), True)]
)


def assign_dense_ids(names: DataFrame, col: str = "name") -> DataFrame:
    """Deterministic dense ids 0..N-1 by sorted value -> DataFrame(vid, name).

    Scalable variant of ``row_number() over (order by name)`` (which
    funnels all rows through one partition): range-repartition by the
    sort key, sort within partitions, enumerate positions per partition
    with an Arrow ``mapInPandas`` pass (vectorized -- no row-at-a-time
    Python), then add per-partition offsets computed from one tiny
    count-by-partition aggregate. vid = (#rows in lower-ranged
    partitions) + position within partition = exact global sorted
    position regardless of the sampled range boundaries, so ids are
    identical across runs and cluster sizes (SURVEY.md §4 item 5).
    """
    import numpy as np  # noqa: F401 (vectorized arange below)
    import pandas as pd

    spark = names.sparkSession
    npart = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    arranged = (
        names.select(F.col(col).alias("name"))
        .distinct()
        .repartitionByRange(npart, "name")
        .sortWithinPartitions("name")
        .withColumn("pid", F.spark_partition_id())
    )

    def _number(batches):
        import numpy as np

        i = 0
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "pid": pdf["pid"],
                    "pos": np.arange(i, i + n, dtype="int64"),
                }
            )
            i += n

    numbered = arranged.mapInPandas(
        _number, schema="name string, pid int, pos long"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = numbered.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    if not counts:
        numbered.unpersist()
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("vid", LongType(), False),
                    StructField("name", StringType(), True),
                ]
            ),
        )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[int(row["pid"])] = acc
        acc += int(row["cnt"])
    omap = F.create_map(
        *[F.lit(x) for k, v in offsets.items() for x in (k, v)]
    )
    out = numbered.select(
        (F.col("pos") + omap[F.col("pid")]).cast("long").alias("vid"),
        "name",
    ).localCheckpoint(eager=True)
    # the counts collect() above already materialized `numbered`; the
    # eager barrier makes `out` self-contained so the intermediate cache
    # can be dropped instead of leaking for the session lifetime
    numbered.unpersist()
    return out


class LinkGraph:
    """Edges + vertices DataFrames with graph-level metadata.

    Parameters
    ----------
    edges : DataFrame(src long, dst long [, weight double])
        One row per directed edge. For undirected graphs store each
        edge once; ``symmetric_edges()`` adds the reverse direction.
    vertices : DataFrame(vid long [, name string]) or None
        Vertex dictionary. If None it is derived from edge endpoints
        (isolated vertices are then invisible -- pass explicitly when
        the graph may have them, mirroring the reference fixture's
        isolated node X, /root/reference/integ_test/graph_operations/
        test_algo_page_rank.py:36).
    directed : bool
    """

    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        vids_non_negative: bool = False,
    ) -> None:
        cols = edges.columns
        assert "src" in cols and "dst" in cols, f"edges needs src/dst, got {cols}"
        self.spark: SparkSession = edges.sparkSession
        self.edges = edges
        self.directed = directed
        # All engine constructors assign dense ids 0..N-1 and set this
        # True; operators may then use negative sentinel keys without an
        # up-front min(vid) aggregation. Hand-built graphs default False.
        self.vids_non_negative = vids_non_negative
        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("vid"))
                .unionByName(edges.select(F.col("dst").alias("vid")))
                .distinct()
                .withColumn("name", F.col("vid").cast("string"))
            )
        if "name" not in vertices.columns:
            vertices = vertices.withColumn("name", F.col("vid").cast("string"))
        self.vertices = vertices

    # -- construction -------------------------------------------------

    @classmethod
    def from_edge_pairs(
        cls,
        spark: SparkSession,
        pairs: Iterable[tuple],
        nodes: Iterable[str] | None = None,
        directed: bool = True,
    ) -> "LinkGraph":
        """Build from python (u, v[, weight]) name pairs (test/fixture path).

        Ids are assigned by sorted node name -> 0..N-1, deterministic.
        """
        pairs = [tuple(p) for p in pairs]
        names = set()
        for p in pairs:
            names.add(str(p[0]))
            names.add(str(p[1]))
        if nodes is not None:
            names.update(str(n) for n in nodes)
        ordered = sorted(names)
        vid_of = {n: i for i, n in enumerate(ordered)}
        vrows = [(vid_of[n], n) for n in ordered]
        vertices = spark.createDataFrame(vrows, VERTEX_SCHEMA)
        weighted = any(len(p) > 2 for p in pairs)
        if weighted:
            erows = [
                (
                    vid_of[str(p[0])],
                    vid_of[str(p[1])],
                    float(p[2]) if len(p) > 2 else 1.0,
                )
                for p in pairs
            ]
            edges = spark.createDataFrame(erows, WEIGHTED_EDGE_SCHEMA)
        else:
            erows = [(vid_of[str(p[0])], vid_of[str(p[1])]) for p in pairs]
            edges = spark.createDataFrame(erows, EDGE_SCHEMA)
        return cls(edges, vertices, directed=directed, vids_non_negative=True)

    @classmethod
    def from_networkx(cls, spark: SparkSession, g) -> "LinkGraph":
        """Differential-test bridge: NetworkX graph -> LinkGraph.

        Mirrors the reference's NX->Neptune sync direction
        (/root/reference/nx_neptune/utils/decorators.py:189-233) but lands
        in DataFrames instead of openCypher batches.
        """
        directed = g.is_directed()
        pairs = []
        weighted = False
        for u, v, data in g.edges(data=True):
            w = data.get("weight")
            if w is not None:
                weighted = True
            pairs.append((str(u), str(v), float(w) if w is not None else 1.0))
        if not weighted:
            pairs = [(u, v) for (u, v, _w) in pairs]
        return cls.from_edge_pairs(
            spark, pairs, nodes=[str(n) for n in g.nodes()], directed=directed
        )

    @classmethod
    def from_vertex_names(
        cls, spark: SparkSession, named_edges: DataFrame, directed: bool = True
    ) -> "LinkGraph":
        """Build from a DataFrame(src_name string, dst_name string) at scale.

        Deterministic dense vids via global sort + row_number. The sort is
        a one-time dictionary build (acceptable even at 100 TB: it is one
        shuffle over the *distinct* vertex names, orders of magnitude
        smaller than the edge table).
        """
        names = (
            named_edges.select(F.col("src_name").alias("name"))
            .unionByName(named_edges.select(F.col("dst_name").alias("name")))
            .distinct()
        )
        vertices = assign_dense_ids(names)
        edges = (
            named_edges.join(
                vertices.select(F.col("name").alias("src_name"), F.col("vid").alias("src")),
                "src_name",
            )
            .join(
                vertices.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")),
                "dst_name",
            )
            .select(
                "src",
                "dst",
                *[c for c in named_edges.columns if c not in ("src_name", "dst_name")],
            )
        )
        return cls(edges, vertices, directed=directed, vids_non_negative=True)

    @classmethod
    def from_pages(cls, pages: DataFrame, directed: bool = True) -> "LinkGraph":
        """The north-rule input path: Common-Crawl-style page table
        (url, warc_ts, html, text, lang) -> LinkGraph.

        html -> links via the vectorized pandas-UDF extractor, then the
        deterministic url -> vid dictionary. Links pointing outside the
        crawl (urls not in the page table) are dropped (inner join),
        matching a closed-world web-graph build.
        """
        from .functions.extraction import pages_to_link_pairs

        # dedup AFTER the id joins: the dictionary is a bijection, so
        # distinct on the 16-byte (src, dst) id pair equals distinct on
        # the ~80-byte url pair while shuffling ~5x fewer bytes
        # (guide §2.3 — shuffle keys, not payloads)
        named = pages_to_link_pairs(pages, dedup=False)
        vertices = assign_dense_ids(pages.select(F.col("url").alias("name")))
        edges = (
            named.join(
                vertices.select(F.col("name").alias("src_name"), F.col("vid").alias("src")),
                "src_name",
            )
            .join(
                vertices.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")),
                "dst_name",
            )
            .select("src", "dst")
            .distinct()
        )
        return cls(edges, vertices, directed=directed, vids_non_negative=True)

    # -- views ---------------------------------------------------------

    def symmetric_edges(self) -> DataFrame:
        """Both-direction edge view (reference double-insert semantics).

        For undirected graphs, parallel/duplicate edges collapse
        (simple-graph semantics, matching NetworkX Graph).
        """
        cols = self.edges.columns
        if self.directed:
            return self.edges
        rev = self.edges.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            *[F.col(c) for c in cols if c not in ("src", "dst")],
        )
        both = self.edges.unionByName(rev)
        if "weight" in cols:
            # simple graph: one weight per (src,dst); keep max for determinism
            return both.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        return both.distinct()

    def reversed_edges(self) -> DataFrame:
        cols = [c for c in self.edges.columns if c not in ("src", "dst")]
        return self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), *cols
        )

    def num_vertices(self) -> int:
        # memoized per vertices-DataFrame object. Holding the DataFrame
        # reference (not its id()) makes the cache immune to CPython
        # id reuse after a `graph.vertices = ...` reassignment frees
        # the old object (api._write_vertex_property does exactly that)
        if getattr(self, "_nv_df", None) is not self.vertices:
            self._nv_val = self.vertices.count()
            self._nv_df = self.vertices
        return self._nv_val

    #: Hard cap for the NetworkX-dict adapters below (and the api.py
    #: wrappers built on them), which collect() vertex-sized state to
    #: the driver. The DataFrame operator layer (operators/*) is the
    #: scale API; these adapters exist for NetworkX return-shape parity
    #: at fixture scale. Raise explicitly to opt in to bigger collects.
    max_adapter_rows: int = 5_000_000

    def _guard_adapter(self, what: str) -> None:
        n = self.num_vertices()
        if n > self.max_adapter_rows:
            raise RuntimeError(
                f"{what} would materialize {n:,} vertices on the driver; "
                "the NetworkX-dict adapters are fixture-scale only. Use "
                "the DataFrame operator layer (nx_neptune_spark.operators"
                ".*) at scale, or raise LinkGraph.max_adapter_rows to "
                "opt in."
            )

    def name_of(self) -> dict[int, str]:
        """vid -> name dict (driver-side; test/fixture scale only)."""
        self._guard_adapter("name_of()")
        return {r["vid"]: r["name"] for r in self.vertices.collect()}

    def vid_of(self) -> dict[str, int]:
        self._guard_adapter("vid_of()")
        return {r["name"]: r["vid"] for r in self.vertices.collect()}
