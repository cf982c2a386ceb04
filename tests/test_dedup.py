"""Dedup operators: exact, MinHash+LSH (verified against brute-force
Jaccard), SimHash hamming pairs."""

import itertools

import pytest
from pyspark.sql import functions as F

from sitemapper_spark.operators import dedup_ops as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),          # near dup of 0
    (3, "a completely different document about spark engines"),
    (4, "a completely different document about spark pipelines"),  # near dup of 3
    (5, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (6, "the quick brown fox jumps over the lazy cat today"),    # near-ish of 0
    (7, "spark engines process completely different documents"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_shingles(text, n=3):
    toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def brute_jaccard_pairs(n, threshold):
    out = {}
    for a, b in itertools.combinations(range(len(DOCS)), 2):
        sa, sb = py_shingles(DOCS[a][1], n), py_shingles(DOCS[b][1], n)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out[(a, b)] = round(j, 4)
    return out


def test_exact_dedup(docs):
    groups = D.exact_dedup(docs).collect()
    by_keeper = {r["keeper"]: r for r in groups}
    assert by_keeper[0]["n_copies"] == 2
    assert by_keeper[0]["members"] == [0, 1]
    assert sum(r["n_copies"] for r in groups) == len(DOCS)


def test_shingles_match_python(docs, spark):
    got = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", D.shingles_col(D.tokens_col(F.col("text")), 3).alias("sh")
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == py_shingles(text, 3), doc_id


def test_minhash_lsh_finds_brute_force_pairs(docs):
    threshold = 0.5
    expected = brute_jaccard_pairs(3, threshold)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_dup_pairs(
            docs, threshold=threshold, k=64, bands=16, rows_per_band=4
        ).collect()
    }
    # verification is exact → no false positives; banding at 16x4 has
    # >99% recall at j>=0.5, and on this fixture recall must be total
    assert got == expected
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_minhash_signature_deterministic(docs):
    sig_df = docs.select(
        "doc_id",
        D.minhash_signature_col(
            D.shingles_col(D.tokens_col(F.col("text"))), k=16
        ).alias("sig"),
    )
    a = {r["doc_id"]: r["sig"] for r in sig_df.collect()}
    b = {r["doc_id"]: r["sig"] for r in sig_df.collect()}
    assert a == b
    assert a[0] == a[1]  # identical docs → identical signatures


def test_simhash_near_dup_equals_brute_force(docs):
    max_h = 15
    # brute-force expectation from the actual simhash values
    hashes = {
        r["doc_id"]: r["sh"] & (2**64 - 1)
        for r in docs.select(
            "doc_id", D.simhash_col(F.col("text")).alias("sh")
        ).collect()
    }
    expected = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= max_h
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(docs, max_hamming=max_h).collect()
    }
    # pigeonhole banding at max_hamming+1 chunks → perfect recall,
    # exact verify → no false positives: exact equality
    assert got == expected
    assert got[(0, 1)] == 0  # exact dups → identical simhash


def test_minhash_broadcast_attach_off_equals_default(docs):
    """Round-6: the corpus-scale shuffle-attach fallback
    (broadcast_attach=False) must produce the identical pair set as the
    default broadcast verify — the flag changes the plan, never the
    relation."""
    kw = dict(threshold=0.3, k=64, bands=16, rows_per_band=4)
    bcast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_dup_pairs(docs, **kw).collect()
    }
    shuffle = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_dup_pairs(
            docs, broadcast_attach=False, **kw
        ).collect()
    }
    assert bcast == shuffle and bcast
