"""Stage-by-stage timing of the extract_build_graph pipeline (guide §1.4
noop isolation): generation, link extraction, dictionary build, id joins.

Usage: SPARK_GRAFT_PAGES=1000000 python scripts/extract_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nx_neptune_spark.session import get_spark
from nx_neptune_spark.graph import LinkGraph, assign_dense_ids
from nx_neptune_spark.functions.extraction import pages_to_link_pairs
from nx_neptune_spark.sources.pages import generate_pages
from pyspark.sql import functions as F

n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# warm-up
wp = generate_pages(spark, 2000).persist()
LinkGraph.from_pages(wp).edges.count()
wp.unpersist()

t = {}
t0 = time.time()
pages = generate_pages(spark, n_pages).persist()
pages.count()
t["generate_persist"] = time.time() - t0

t0 = time.time()
noop(pages.select("url", "html"))
t["scan_cached_pages"] = time.time() - t0

t0 = time.time()
raw_links = pages.select(
    F.col("url").alias("src_name"),
    F.explode(F.col("html").cast("string").rlike(".").cast("string")).alias("x")
) if False else None
named = pages_to_link_pairs(pages)
noop(named)
t["extract_links_distinct"] = time.time() - t0

# extraction WITHOUT the distinct, to split udf vs shuffle cost
from nx_neptune_spark.functions.extraction import extract_links
t0 = time.time()
noop(pages.select(F.col("url").alias("src_name"),
                  F.explode(extract_links(F.col("html"), F.col("url"))).alias("dst_name")))
t["extract_links_raw"] = time.time() - t0

t0 = time.time()
vertices = assign_dense_ids(pages.select(F.col("url").alias("name")))
t["assign_dense_ids"] = time.time() - t0

t0 = time.time()
named2 = pages_to_link_pairs(pages)
edges = (
    named2.join(vertices.select(F.col("name").alias("src_name"), F.col("vid").alias("src")), "src_name")
    .join(vertices.select(F.col("name").alias("dst_name"), F.col("vid").alias("dst")), "dst_name")
    .select("src", "dst")
)
noop(edges)
t["full_edges_pipeline"] = time.time() - t0

print(json.dumps({k: round(v, 2) for k, v in t.items()}))
