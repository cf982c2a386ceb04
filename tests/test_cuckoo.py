"""Cuckoo seen-set: no false negatives, bounded false-positive rate,
deletion support (the capability the Bloom lacks), slot-level merge ==
union build semantics, distributed build parity, and full-crawl output
identity vs the bloom engine."""

import numpy as np
import pytest

from sitemapper_spark.operators.cuckoo import (
    CuckooFilter,
    build_cuckoo,
    split_by_cuckoo,
)


def _rand(n, seed=7, lo=-(2**62), hi=2**62):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(lo, hi, size=n, dtype=np.int64)


def test_no_false_negatives():
    cf = CuckooFilter.sized_for(10_000)
    items = _rand(10_000)
    cf.add_many(items)
    assert cf.contains_many(items).all()


def test_false_positive_rate_bounded():
    cf = CuckooFilter.sized_for(10_000)
    items = _rand(10_000)
    others = _rand(50_000, seed=11)
    cf.add_many(items)
    fp = cf.contains_many(np.setdiff1d(others, items)).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: theory ~ 8/2^16 ~ 1.2e-4
    assert fp < 0.005


def test_delete_restores_negatives():
    """The capability a Bloom cannot have: after deleting inserted
    keys, non-colliding keys probe negative again, and the remaining
    keys still all probe positive (no collateral false negatives)."""
    cf = CuckooFilter.sized_for(10_000)
    items = _rand(10_000)
    cf.add_many(items)
    gone, kept = items[:5_000], items[5_000:]
    removed = cf.delete_many(gone)
    assert removed == len(gone)
    assert cf.contains_many(kept).all()  # never lose a live key
    # deleted keys revert to (mostly) negative — only residual
    # fingerprint collisions with kept keys may still probe positive
    assert cf.contains_many(gone).mean() < 0.005
    # reinsertion works and fills the freed slots
    cf.add_many(gone)
    assert cf.contains_many(items).all()


def test_duplicate_inserts_each_occupy_a_slot():
    cf = CuckooFilter.sized_for(1_000)
    k = np.array([42, 42, 42], dtype=np.int64)
    cf.add_many(k)
    assert cf.n_items == 3
    assert cf.delete_many(np.array([42], dtype=np.int64)) == 1
    assert cf.contains_many(np.array([42], dtype=np.int64)).all()  # 2 left


def test_merge_preserves_both_sides():
    a = CuckooFilter.sized_for(2_000)
    b = CuckooFilter.sized_for(2_000)
    xs, ys = _rand(1_000, seed=1), _rand(1_000, seed=2)
    a.add_many(xs)
    b.add_many(ys)
    m = a.merge(b)
    assert m.contains_many(xs).all() and m.contains_many(ys).all()
    assert m.n_items == a.n_items + b.n_items
    # merge is out-of-place: inputs untouched
    assert not a.contains_many(ys).all()


def test_over_capacity_raises():
    cf = CuckooFilter(16, 4)  # 64 slots
    with pytest.raises(RuntimeError, match="capacity"):
        cf.add_many(_rand(200))


@pytest.mark.usefixtures("spark")
def test_distributed_build_and_split(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 20_000, numPartitions=8).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    proto = CuckooFilter.sized_for(20_000)
    cf = build_cuckoo(df, "h", n_buckets=proto.n_buckets)
    fresh, maybe = split_by_cuckoo(df, "h", cf)
    assert fresh.count() == 0  # every inserted hash recognized
    assert maybe.count() == 20_000
    other = spark.range(100_000, 120_000, numPartitions=8).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    unseen, flagged = split_by_cuckoo(other, "h", cf)
    assert unseen.count() >= 19_900  # FP well under 0.5%


@pytest.mark.usefixtures("spark")
def test_cuckoo_crawl_identical_to_bloom(spark, tmp_path):
    """Engine with seen_filter='cuckoo' must produce EXACTLY the bloom
    engine's output — both filters are advisory-only, so the exact
    anti-join confirm makes the choice invisible in results."""
    from pyspark.sql import functions as F

    from sitemapper_spark import corpus as cm
    from sitemapper_spark.engine import CrawlConfig, CrawlEngine

    corpus = cm.synth_corpus(spark, n_pages=400, n_hosts=4, links_per_page=5)
    seeds = [
        (r["u"], "s-" + r["host"], 3, 0.0)
        for r in corpus.groupBy("host").agg(F.min("url").alias("u")).collect()
    ]

    def crawl(tag, filt):
        cfg = CrawlConfig(
            max_depth=3, use_bloom=True, bloom_min_visited=1,
            bloom_expected_urls=10_000, seen_filter=filt,
            num_partitions=4, checkpoint_dir=str(tmp_path / tag),
        )
        res = CrawlEngine(spark, corpus, cfg).run(seeds)
        return sorted(
            (r["sitemap_id"], r["url"], r["depth"])
            for r in res.visited.collect()
        )

    assert crawl("bloom", "bloom") == crawl("cuckoo", "cuckoo")
