"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry and its DuckDB oracle_sql() twin on the
same parquet tables; compare row count, column names, and exact values
(order-insensitive). Floats must be *identical* post-rounding -- the
driver hashes values, so near-equal is not enough."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    got = normalize(srows, cols)

    con = duck_con(sf_dir)
    res = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == cols, f"{name}: columns {sorted(dcols)} != {cols}"
    drows = res.fetchall()
    want = normalize([dict(zip(dcols, r)) for r in drows], cols)

    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows, first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_an_oracle():
    # round 3: pages_pagerank gained a full DuckDB oracle (portable
    # md5-seeded link structure, sources/pages.py link_edges_sql), so
    # the rows-only set is now empty -- every queries() entry is
    # hash-checked against SQL.
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())
