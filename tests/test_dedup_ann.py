"""Dedup family + ANN + multimodal + text-analysis tests.

Oracles here are python re-computations (numpy / pure python) on
collected data; the DuckDB SQL oracles live in __spark_entry__.py and
are exercised by test_entry_contract.py.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nx_neptune_spark.functions.hashing import P_MOD
from nx_neptune_spark.functions.text import (
    bpe_token_count,
    content_fingerprint,
    language_id,
    quality_score,
    whitespace_token_count,
)
from nx_neptune_spark.operators.ann import brute_force_topk, lsh_topk, near_duplicate_pairs
from nx_neptune_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dup_clusters,
    simhash_fingerprints,
    simhash_pairs,
)
from nx_neptune_spark.operators.multimodal import (
    documents_as_media,
    feature_extract,
    frame_sample,
    image_metadata,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different content about spark engines"),
        (4, "spark engines content completely different about"),  # permuted 3
        (5, "one two three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def py_shingles(t, k=3):
    toks = t.lower().split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def py_jaccard(a, b, k=3):
    sa, sb = py_shingles(a, k), py_shingles(b, k)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(spark, docs):
    rows = exact_duplicates(docs).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in rows}
    assert by_keep[0] == 2  # docs 0 and 2
    assert sum(by_keep.values()) == 6
    assert len(rows) == 5


def test_jaccard_pairs_matches_python(spark, docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.0).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert (0, 2) in got and math.isclose(got[(0, 2)], 1.0)
    for (a, b), j in got.items():
        assert math.isclose(j, py_jaccard(texts[a], texts[b]), abs_tol=1e-12)


def test_minhash_signature_shape_and_range(spark, docs):
    rows = minhash_signatures(docs).collect()
    assert all(len(r["sig"]) == 12 for r in rows)
    assert all(0 <= v < P_MOD for r in rows for v in r["sig"])
    sigs = {r["id"]: tuple(r["sig"]) for r in rows}
    assert sigs[0] == sigs[2]  # exact dups -> identical signatures


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, threshold=0.4).collect()}
    assert (0, 2) in pairs  # exact dup always collides
    assert (0, 1) in pairs  # high-jaccard near-dup
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), j in pairs.items():
        assert math.isclose(j, py_jaccard(texts[a], texts[b]), abs_tol=1e-12)
        assert j >= 0.4


def test_near_dup_clusters_transitive(spark, docs):
    # explicit pair graph: chain 0-1, 1-2 must collapse into ONE cluster
    # (pairs alone say nothing about 0 vs 2), plus an unrelated pair 3-4
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "a long, b long"
    )
    out = near_dup_clusters(docs, pairs=pairs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"]) for r in out}
    assert got == {
        0: (0, 3, True),
        1: (0, 3, False),
        2: (0, 3, False),
        3: (3, 2, True),
        4: (3, 2, False),
    }
    # doc 5 is in no pair -> absent (implicitly unique)
    assert 5 not in got


def test_near_dup_clusters_lsh_end_to_end(spark, docs):
    # default path: LSH pairs feed the clustering; exact dups 0/2 and
    # near-dup 1 must land in one cluster keyed by min doc_id
    out = near_dup_clusters(docs, threshold=0.5).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got[0] == 0 and got[2] == 0
    keeps = {r["doc_id"] for r in out if r["keep"]}
    assert 0 in keeps and 2 not in keeps


def test_near_dup_clusters_collapse_exact_invariant(spark):
    # 30 byte-identical docs (the quadratic-LSH-candidate case), one
    # near-dup of them, one unrelated pair, one unique doc: collapsed
    # and uncollapsed paths must produce the identical cluster table
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)]
    rows += [(30, "alpha beta gamma delta epsilon eta")]  # near-dup of group
    # exact pair with a rep that near-dups nothing else: exercises the
    # lonely-representative branch of the collapsed path
    rows += [(31, "one two three four five six"), (32, "one two three four five six")]
    rows += [(33, "totally unrelated content entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.5)
    a = sorted(
        map(tuple, near_dup_clusters(docs, collapse_exact=True, **kw).collect())
    )
    b = sorted(
        map(tuple, near_dup_clusters(docs, collapse_exact=False, **kw).collect())
    )
    assert a == b
    got = {r[0]: r[1] for r in a}
    assert all(got[i] == 0 for i in range(30))  # identical docs one cluster
    assert got[31] == 31 and got[32] == 31
    assert 33 not in got


def test_jaccard_stopword_skew(spark):
    """One hot shingle shared by ALL docs (a stop-shingle). With
    max_bucket below the corpus size the hot bucket must be dropped from
    candidate generation, and the verify join must stay bounded by the
    candidate set (dedup.py restricts the shingle self-join to candidate
    doc ids, so the hot shingle cannot explode the intermediate)."""
    n = 60
    rows = []
    for i in range(n):
        # every doc starts with the same 3 words -> one shingle in all docs
        extra = f"group{i % 6} item{i % 6} tail{i % 6}" if i % 2 == 0 else f"solo{i} x{i} y{i}"
        rows.append((i, f"the common prefix {extra}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.3, max_bucket=20).collect()
    }
    # python oracle: candidates = pairs sharing a shingle whose corpus
    # bucket is <= max_bucket; jaccard over the FULL shingle sets
    texts = dict(rows)
    sh = {i: py_shingles(t) for i, t in texts.items()}
    from collections import Counter

    width = Counter(s for ss in sh.values() for s in ss)
    ok = {s for s, w in width.items() if w <= 20}
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if sh[a] & sh[b] & ok:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.3:
                    want[(a, b)] = j
    assert set(got) == set(want)
    for k2, v in got.items():
        assert math.isclose(v, want[k2], abs_tol=1e-12)


def test_short_and_empty_docs_shingle_spec(spark):
    """Docs shorter than k words emit one whole-document shingle (the
    empty string for blank docs) in BOTH the Spark path and the DuckDB
    oracle (__spark_entry__._SHINGLE_CTES) -- pinned here."""
    rows = [(0, ""), (1, "hi"), (2, "one two"), (3, "one two three four")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: tuple(r["sig"]) for r in minhash_signatures(docs).collect()}
    assert set(sigs) == {0, 1, 2, 3}  # nobody dropped
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    import __spark_entry__ as entry

    oracle = {
        r[0]: tuple(r[1:])
        for r in con.execute(entry.oracle_sql()["minhash_signatures"]).fetchall()
    }
    assert oracle == sigs
    # pairs: doc 0 ("") and doc 1 ("hi") share nothing; 2 vs 3 share no
    # full shingle; exact dups of a short doc must still pair up
    docs2 = spark.createDataFrame(rows + [(4, "hi")], "doc_id long, text string")
    pairs = {(r["a"], r["b"]) for r in jaccard_pairs(docs2, threshold=0.99).collect()}
    assert (1, 4) in pairs


def test_simhash(spark, docs):
    import pytest

    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[2]  # exact dups
    assert fps[3] == fps[4]  # permutation-invariant (freq-weighted tokens)
    assert all(0 <= v < (1 << 60) for v in fps.values())  # default width 60
    fps16 = {
        r["id"]: r["simhash"]
        for r in simhash_fingerprints(docs, bits=16).collect()
    }
    assert all(0 <= v < (1 << 16) for v in fps16.values())
    pairs = {(r["a"], r["b"]) for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert (0, 2) in pairs and (3, 4) in pairs
    # ADVICE r2: widths past hash60's 60 usable bits must be rejected
    # (1 << 63 overflows LongType; sign would break %-based part keys)
    with pytest.raises(ValueError):
        simhash_fingerprints(docs, bits=64).collect()


def test_brute_force_topk_vs_numpy(spark, emb):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(emb, queries, k=5).collect()
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for qid in range(3):
        qv = data[qid]
        sims = {
            vid: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for vid, v in data.items()
            if vid != qid
        }
        want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got_q = sorted(
            [(r["vec_id"], r["cosine"]) for r in got if r["query_id"] == qid],
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert [v for v, _ in got_q] == [v for v, _ in want]
        for (gv, gs), (wv, ws) in zip(got_q, want):
            assert math.isclose(gs, ws, abs_tol=1e-9)


def test_lsh_topk_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=3).collect()
    approx = lsh_topk(emb, queries, dim=64, k=3, tables=12, planes=4).collect()
    exact_s = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_s = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_s & approx_s) / len(exact_s)
    assert recall >= 0.8, f"LSH recall too low: {recall}"
    # approximate scores that do appear must be exact cosines
    ex = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            assert math.isclose(r["cosine"], ex[key], abs_tol=1e-9)


def test_embedding_near_dup_pairs(spark, emb):
    pairs = near_duplicate_pairs(emb, dim=64, threshold=0.8).collect()
    for r in pairs:
        assert r["cosine"] >= 0.8 and r["a"] < r["b"]


def test_multimodal_stubs(spark, docs):
    media = documents_as_media(docs)
    meta = {r["media_id"]: r for r in image_metadata(media).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in meta.items():
        n = len(texts[mid].encode())
        assert r["n_bytes"] == n
        assert r["width"] == 64 + (n % 449)
        assert r["format"] == "FAKE"
    feats = {r["media_id"]: r["feature"] for r in feature_extract(media, dim=8).collect()}
    assert all(len(v) == 8 for v in feats.values())
    frames = frame_sample(media, every_n_bytes=10, max_frames=3).collect()
    assert all(f["offset"] == f["frame_idx"] * 10 for f in frames)


def _png_bytes(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _bmp_bytes(w, h):
    import struct

    # 14-byte file header + BITMAPINFOHEADER (negative height = top-down)
    return (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, -h, 1, 24)
    )


def _jpeg_bytes(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_header_real_formats():
    """Round-4 real decode: the stdlib header parser must extract true
    dims+format from genuine PNG/GIF/BMP/JPEG bytes (built field by
    field from the public specs) and reject non-image bytes."""
    from nx_neptune_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(320, 200)) == (320, 200, "PNG")
    assert parse_image_header(_gif_bytes(640, 480)) == (640, 480, "GIF")
    assert parse_image_header(_bmp_bytes(1024, 768)) == (1024, 768, "BMP")
    assert parse_image_header(_jpeg_bytes(800, 600)) == (800, 600, "JPEG")
    assert parse_image_header(b"plain text, not an image") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(None) is None
    # truncated PNG signature without IHDR dims: not decodable
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_image_metadata_decodes_real_headers(spark):
    """image_metadata end-to-end through mapInPandas: real-format blobs
    come back with true dims; an unrecognized blob in the SAME batch
    falls back per-element to the deterministic fake."""
    rows = [
        (1, _png_bytes(33, 44)),
        (2, _gif_bytes(12, 34)),
        (3, _bmp_bytes(55, 66)),
        (4, _jpeg_bytes(77, 88)),
        (5, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, media binary")
    meta = {r["media_id"]: r for r in image_metadata(media).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["format"]) == (33, 44, "PNG")
    assert (meta[2]["width"], meta[2]["height"], meta[2]["format"]) == (12, 34, "GIF")
    assert (meta[3]["width"], meta[3]["height"], meta[3]["format"]) == (55, 66, "BMP")
    assert (meta[4]["width"], meta[4]["height"], meta[4]["format"]) == (77, 88, "JPEG")
    n = len(rows[4][1])
    assert meta[5]["format"] == "FAKE" and meta[5]["width"] == 64 + (n % 449)


def test_text_functions(spark, docs):
    out = docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("wc"),
        bpe_token_count(F.col("text")).alias("bpe"),
        quality_score(F.col("text")).alias("q"),
        language_id(F.col("text")).alias("lang"),
        content_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["wc"] == 9
    assert by_id[0]["bpe"] == 9
    assert by_id[0]["lang"] == "en"  # 'the' x2, 'over'
    assert 0.0 <= by_id[0]["q"] <= 1.0
    assert by_id[0]["fp"] == by_id[2]["fp"]
    import hashlib

    assert by_id[0]["fp"] == hashlib.md5(
        b"the quick brown fox jumps over the lazy dog"
    ).hexdigest()


def test_lsh_topk_distance2_multiprobe(spark, emb):
    """Distance-2 probing dominates distance-1 at the same table/plane
    budget -- the knob for recall plateaus where some true neighbor's
    sketch differs by 2 bits in every table (BENCH sf0.1 finding)."""
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_s = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }

    def recall(probe_bits):
        approx = lsh_topk(
            emb, queries, dim=64, k=3, tables=4, planes=6, probe_bits=probe_bits
        ).collect()
        got = {(r["query_id"], r["vec_id"]) for r in approx}
        return len(exact_s & got) / len(exact_s)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1, f"distance-2 recall {r2} < distance-1 {r1}"
    assert r2 >= 0.8, f"distance-2 recall too low: {r2}"


def test_simhash_pairs_exact_recall_vs_brute(spark, sf_dir):
    """Regression: the old half-split candidate generation missed every
    pair whose 2-3 differing bits spanned both halves (63% of true
    pairs on sf0.01 docs). Pigeonhole now uses max_hamming+1 parts, so
    recall against the all-pairs brute force must be exactly 1.0."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    ids = sorted(fp)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= 3:
                brute.add((a, b, h))
    got = {(r["a"], r["b"], r["hamming"]) for r in simhash_pairs(docs).collect()}
    assert got == brute
