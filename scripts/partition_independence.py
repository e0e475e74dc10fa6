"""Driver-contract determinism under a different partitioning:
run every oracled query at shuffle.partitions=17 / local[6] and
compare to DuckDB exactly, same normalization as the pytest gate."""
import math, sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import __spark_entry__ as entrymod
from nx_neptune_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]

spark = get_spark(app_name="pi-check", master="local[6]", shuffle_partitions=17)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

bad = 0
for name in sorted(entrymod.oracle_sql()):
    sdf = entrymod.queries()[name](spark, SF)
    cols = sorted(sdf.columns)
    got = normalize([r.asDict() for r in sdf.collect()], cols)
    res = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    want = normalize([dict(zip(dcols, r)) for r in res.fetchall()], cols)
    ok = sorted(dcols) == cols and got == want
    if not ok:
        bad += 1
        mism = [(g, w) for g, w in zip(got, want) if g != w][:2]
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}, first mismatches {mism}")
    else:
        print(f"ok   {name} ({len(got)} rows)")
print("RESULT:", "ALL GREEN" if bad == 0 else f"{bad} FAILURES")
