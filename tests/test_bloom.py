"""Bloom seen-set: no false negatives ever, bounded false-positive
rate, distributive treeAggregate merge == single-node build."""

import numpy as np
import pytest

from sitemapper_spark.operators.bloom import BloomFilter, build_bloom, split_by_bloom


def test_no_false_negatives():
    bf = BloomFilter.sized_for(10_000)
    rng = np.random.Generator(np.random.PCG64(7))
    items = rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64)
    bf.add_many(items)
    assert bf.contains_many(items).all()


def test_false_positive_rate_bounded():
    bf = BloomFilter.sized_for(10_000, bits_per_item=16)
    rng = np.random.Generator(np.random.PCG64(7))
    items = rng.integers(-(2**62), 2**62, size=10_000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    bf.add_many(items)
    fp = bf.contains_many(np.setdiff1d(others, items)).mean()
    assert fp < 0.01  # 16 bits/item, k≈6 → theoretical ~4e-4


def test_merge_equals_union_build():
    a, b = BloomFilter(1 << 14, 5), BloomFilter(1 << 14, 5)
    u = BloomFilter(1 << 14, 5)
    xs = np.arange(0, 500, dtype=np.int64)
    ys = np.arange(500, 1000, dtype=np.int64)
    a.add_many(xs)
    b.add_many(ys)
    u.add_many(np.concatenate([xs, ys]))
    assert np.array_equal(a.merge(b).words, u.words)


@pytest.mark.usefixtures("spark")
def test_distributed_build_and_split(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 20_000, numPartitions=8).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    bloom = build_bloom(df, "h", expected_items=20_000)
    # every inserted hash must be recognized (no false negatives)
    seen, maybe = split_by_bloom(df, "h", bloom)
    assert seen.count() == 0
    assert maybe.count() == 20_000
    # unseen hashes should mostly be provably-unseen
    other = spark.range(100_000, 120_000, numPartitions=8).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    fresh, flagged = split_by_bloom(other, "h", bloom)
    assert fresh.count() >= 19_800  # FP rate well under 1%
