"""Deduplication operators for training-data pipelines.

Five dedup modes over a documents table (id, text), all expressed as
Catalyst plans (no Python in the data path) with portable hashing so
each has an exact DuckDB SQL oracle:

  * exact            -- md5 content-hash groupBy
  * minhash_lsh      -- word-shingle MinHash signatures, banded LSH
                        bucketing, candidate join, exact-Jaccard verify
  * ngram_jaccard    -- shared-shingle candidate generation + exact
                        Jaccard (the no-approximation baseline)
  * simhash          -- 60-bit (default; configurable, hard-capped at
                        60) SimHash fingerprints; near-dups = pairs
                        found by max_hamming+1-part pigeonhole
                        bucketing with exact Hamming verify. NOTE: the
                        default width changed 16→60 in round 3 —
                        fingerprints persisted under the old default
                        are incomparable with new ones (CHANGELOG.md)
  * embedding cosine -- see operators/ann.py (near_duplicate_pairs)

Scale notes: every pipeline is shingle-explode -> aggregate -> join;
the hot shingle problem (stopword shingles shared by millions of docs)
is the classic skew risk, so candidate generation caps bucket width
(``max_bucket`` -- buckets larger than the cap are dropped exactly like
production MinHash pipelines drop stop-shingles); all joins are
key-partitioned, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import P_MOD, hash60, minhash_perm

DEFAULT_SHINGLE_K = 3
DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4  # 4 bands x 3 rows


def word_shingles(text: Column, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Array of k-word shingles (space-joined), lowercase. Documents
    shorter than k words yield a single whole-document shingle."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("shingle"),
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    (fingerprint, keep_id = min id, dup_count). Single hash-aggregate."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
    max_bucket: int = 100,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact shingle Jaccard.

    Candidate generation: documents sharing at least one shingle
    (buckets wider than ``max_bucket`` dropped as stop-shingles), or a
    caller-provided candidate DataFrame(a, b). Output: (a, b, jaccard)
    with a < b, jaccard >= threshold.
    """
    sh = _doc_shingles(docs, id_col, text_col, k).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if candidates is None:
        bucket_ok = (
            sh.groupBy("shingle").agg(F.count("*").alias("w")).where(F.col("w") <= max_bucket)
        )
        s = sh.join(bucket_ok.select("shingle"), "shingle")
        candidates = (
            s.alias("l")
            .join(s.alias("r"), "shingle")
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct()
        )
    # Scale guard: restrict the shingle table to docs that actually appear
    # in a candidate pair BEFORE the shingle self-join. Without this, a
    # stop-shingle shared by 10^6 docs explodes to ~10^12 intermediate
    # rows before the candidate semi-filter can prune; with it, the
    # self-join fan-out is bounded by the candidate set. Exactness is
    # preserved: intersection counts are only consumed for candidate
    # pairs, and every shingle of a candidate doc is retained.
    cand_ids = (
        candidates.select(F.col("a").alias("id"))
        .union(candidates.select(F.col("b").alias("id")))
        .distinct()
    )
    shc = sh.join(cand_ids, "id", "left_semi")
    inter = (
        shc.select(F.col("id").alias("a"), "shingle")
        .join(shc.select(F.col("id").alias("b"), "shingle"), "shingle")
        .join(candidates, ["a", "b"], "left_semi")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(id, sig array<long>[num_hashes]): one aggregate pass -- every
    permutation is a min() over the same exploded shingle set."""
    sh = _doc_shingles(docs, id_col, text_col, k).withColumn(
        "h", hash60(F.col("shingle")) % F.lit(P_MOD)
    )
    mins = sh.groupBy("id").agg(
        *[F.min(minhash_perm(F.col("h"), j)).alias(f"m{j}") for j in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{j}") for j in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs (a, b, jaccard).

    Signature split into ``bands`` bands of num_hashes/bands rows; a
    pair is a candidate iff some band matches exactly (bucket join on
    the band hash -- never an all-pairs comparison). Candidates are
    then verified with exact Jaccard when ``verify``.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, k, num_hashes)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("sig"), b * rows + 1, rows),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bkey"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    if not verify:
        return cand
    return jaccard_pairs(
        docs, id_col, text_col, k, threshold=threshold, candidates=cand
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    pairs: DataFrame | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Collapse near-duplicate documents into clusters (the dedup stage a
    training pipeline actually runs: pairs alone don't tell you which doc
    to keep when A~B and B~C but A!~C).

    Near-dup pairs (``minhash_lsh_pairs`` by default, or caller-provided
    ``pairs(a, b, ...)``) are treated as undirected edges and closed
    transitively with the large-star/small-star connected-components
    operator -- O(log^2 n) rounds, no driver-side union-find, so a
    100M-doc crawl with a giant dup cluster still converges.

    ``collapse_exact`` (default, LSH path only): exact duplicates are
    collapsed to one representative (min doc_id per content hash)
    BEFORE signatures. Identical documents share every band bucket, so
    an m-doc identical cluster otherwise yields m^2/2 LSH candidates --
    the one quadratic blowup banded LSH cannot cap. Collapsing is
    output-invariant: identical docs have identical shingle sets, hence
    identical Jaccard to every third doc, hence identical cluster
    connectivity; membership is re-expanded with a linear hash join
    (exact-dup groups whose representative pairs with nothing still
    form their own cluster -- their intra-group pairs are 1.0-Jaccard).

    Returns one row per document appearing in >=1 (possibly collapsed)
    pair: (doc_id, cluster_id = min doc_id in its cluster,
    cluster_size, keep = doc_id == cluster_id). Documents in no pair
    are implicitly unique (anti-join this result to drop dups).
    """
    from ..graph import LinkGraph
    from .components import connected_components

    if pairs is None and collapse_exact:
        fp = docs.select(
            F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("fingerprint")
        )
        groups = fp.groupBy("fingerprint").agg(
            F.min("doc_id").alias("rep"), F.count("*").alias("gsz")
        )
        members = fp.join(groups, "fingerprint").select("doc_id", "rep", "gsz")
        rep_docs = docs.join(
            groups.select(F.col("rep").alias(id_col)), id_col, "left_semi"
        )
        rpairs = minhash_lsh_pairs(
            rep_docs, id_col, text_col, k, num_hashes, bands, threshold
        )
        redges = rpairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        rcomp = connected_components(LinkGraph(redges, directed=False))
        lonely = (
            groups.where(F.col("gsz") >= 2)
            .select(F.col("rep").alias("vid"))
            .join(rcomp.select("vid"), "vid", "left_anti")
            .select("vid", F.col("vid").alias("component"))
        )
        assign = members.join(
            rcomp.unionByName(lonely),
            members.rep == F.col("vid"),
        ).select("doc_id", F.col("component").alias("cluster_id"))
        sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
        return assign.join(sizes, "cluster_id").select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
        )

    if pairs is None:
        pairs = minhash_lsh_pairs(
            docs, id_col, text_col, k, num_hashes, bands, threshold
        )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(LinkGraph(edges, directed=False))
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("vid").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("vid") == F.col("component")).alias("keep"),
        )
    )


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """(id, simhash long): token-frequency-weighted SimHash.

    bit_i(simhash) = sign of sum over tokens( freq * (2*bit_i(h)-1) ),
    with the portable 60-bit token hash. One explode + one aggregate.
    Ties (sum == 0) resolve to bit 0 for determinism.

    ``bits`` is capped at 60: hash60 supplies exactly 60 usable bits,
    and any wider fingerprint would need 1 << 63 (LongType overflow)
    and put the sign bit in play, breaking the %-based part keys in
    simhash_pairs (Spark % keeps the dividend's sign). The default IS
    the web-scale setting; contract queries pin bits=16 explicitly for
    DuckDB-oracle fixture parity.
    """
    if not 1 <= bits <= 60:
        raise ValueError(
            f"bits={bits} unsupported: hash60 supplies 60 usable bits "
            "(64 would overflow LongType and break sign-sensitive part keys)"
        )
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    th = toks.groupBy("id", "tok").agg(F.count("*").alias("freq")).withColumn(
        "h", hash60(F.col("tok"))
    )
    bit_sums = th.groupBy("id").agg(
        *[
            F.sum(
                F.col("freq")
                * (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    sim = bit_sums.select(
        "id",
        sum(
            [
                F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(bits)
            ],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sim


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash, EXACT for hamming <= max_hamming:
    the fingerprint is split into ``max_hamming + 1`` contiguous parts,
    so by pigeonhole any pair within the Hamming budget shares at least
    one part verbatim (k differing bits cannot touch all k+1 parts).
    Candidates = bucket join on (part, part_value); exact Hamming
    filter via bit_count(xor). Output (a, b, hamming).

    Scale note: part keys are bits/(max_hamming+1) wide, so bucket
    selectivity grows with fingerprint width — the bits=60 default
    (15-bit part keys) is the web-scale setting; bits=16 (4-bit keys,
    corpus/16 per bucket) exists only for DuckDB-oracle fixture parity
    and must be passed explicitly. 60 is the hard cap (see
    simhash_fingerprints)."""
    fp = simhash_fingerprints(docs, id_col, text_col, bits)
    n_parts = max_hamming + 1
    base_w = bits // n_parts
    extra = bits % n_parts  # first `extra` parts get one more bit
    part_structs, off = [], 0
    for p in range(n_parts):
        w = base_w + (1 if p < extra else 0)
        part_structs.append(
            F.struct(
                F.lit(p).alias("part"),
                (F.shiftright(F.col("simhash"), off) % F.lit(1 << w)).alias("key"),
            )
        )
        off += w
    keyed = fp.select(
        "id",
        "simhash",
        F.explode(F.array(*part_structs)).alias("pk"),
    ).select("id", "simhash", F.col("pk.part").alias("part"), F.col("pk.key").alias("key"))
    pairs = (
        keyed.alias("l")
        .join(keyed.alias("r"), ["part", "key"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def cross_doc_chunk_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """CCNet-style cross-document chunk deduplication signal
    (Wenzek et al., LREC 2020 — CCNet dedups Common Crawl at the
    PARAGRAPH level across the whole corpus; the fixture's documents
    are single-line, so the unit here is a deterministic
    ``chunk_tokens``-token chunk, the same device at the same plan
    shape).

    Returns DataFrame(doc_id, n_chunks, dup_chunks, dup_chunk_frac):
    dup_chunks counts this document's chunks whose md5 ALSO occurs in
    at least one OTHER document.

    Plan (unlike the per-document Gopher filters, this one is a real
    corpus-level shuffle): explode chunks (one narrow pass), ONE
    map-side-combined aggregate keyed by chunk hash counting documents
    per chunk, one join back, one per-document aggregate. At 100 TB
    this is exactly the CCNet dedup topology — the chunk-hash
    aggregate is the only wide exchange and it combines map-side."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(
            F.array_join(
                F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
            )
        ),
    )
    exploded = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.when(F.size(toks) > 0, chunks).otherwise(
                F.array().cast("array<string>")
            )).alias("h"),
        )
        # one row per (doc, chunk-hash): a chunk repeated WITHIN a doc
        # counts once toward the cross-doc test, matching CCNet's
        # per-paragraph-identity semantics
        .distinct()
    )
    freq = exploded.groupBy("h").agg(
        F.count("*").alias("ndocs")
    )
    per_doc = (
        exploded.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("dup_chunks"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        per_doc, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("dup_chunks", F.lit(0)).cast("long").alias("dup_chunks"),
        F.when(
            F.coalesce("n_chunks", F.lit(0)) > 0,
            F.col("dup_chunks") / F.col("n_chunks"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_chunk_frac"),
    )
