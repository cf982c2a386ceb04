"""Cross-round Bloom-filter URL-seen set.

The reference's seen set is one in-memory Go map guarded by a RWMutex
(`sitemap.go:18-53`); at a 10^10-URL frontier the exact set no longer
fits one node, so per the north_rule the engine keeps:

* a **Bloom filter** built per partition and OR-merged via
  ``treeAggregate`` (numpy bitset; hashes derived JVM-side with
  ``xxhash64`` so Python only ever sees int64 columns, never URLs);
* the **exact** ``visited`` table, against which every
  maybe-seen candidate is confirmed with a left-anti join.

The bloom is strictly advisory: a positive means "must confirm via
anti-join", a negative means "provably unseen, skip the join". False
positives therefore cost a join probe, never a lost URL; false
negatives cannot happen (no deletions). The anti-join input shrinks by
the true-negative rate — at scale that is the difference between
shuffling the whole candidate set against a 10^10-row table and
shuffling only the tiny maybe-seen sliver.

Serialized size is m/8 bytes; the driver broadcasts it once per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "BloomFilter",
    "url_hash_col",
    "build_bloom",
    "split_by_bloom",
    "shard_col",
    "build_bloom_shards",
    "merge_bloom_shards",
    "split_by_bloom_shards",
]

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def url_hash_col(sitemap_id: Column, url: Column) -> Column:
    """JVM-side 64-bit key hash — keeps raw URLs out of Python."""
    return F.xxhash64(sitemap_id, url)


class BloomFilter:
    """Fixed-size Bloom filter over int64 keys, numpy-vectorized."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        assert m_bits % 64 == 0
        self.m_bits = m_bits
        self.k = k
        self.words = (
            words
            if words is not None
            else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    @staticmethod
    def sized_for(n_items: int, bits_per_item: int = 16) -> "BloomFilter":
        m = 1 << max(10, int(np.ceil(np.log2(max(1, n_items) * bits_per_item))))
        k = max(2, min(8, int(round(0.693 * bits_per_item))))
        return BloomFilter(m, k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing g_i = h1 + i*h2."""
        h = hashes.astype(np.uint64)
        h1 = h
        h2 = ((h >> np.uint64(33)) ^ (h * np.uint64(0xFF51AFD7ED558CCD))) | np.uint64(1)
        idx = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + idx * h2[None, :]) & _MASK) % np.uint64(self.m_bits)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        bits = (
            self.words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.k == other.k
        return BloomFilter(self.m_bits, self.k, self.words | other.words)


def build_bloom(
    df: DataFrame, hash_column: str, m_bits: int | None = None, k: int = 6,
    expected_items: int | None = None,
) -> BloomFilter:
    """Distributed tree build of the seen filter, DataFrame-only.

    ``df`` should already be projected to the single int64 hash column —
    only 8 bytes/row ever cross into Python. Per-partition partial
    bitsets are built with ``mapInPandas`` (Arrow, whole partitions at
    once), OR-merged executor-side in a single ``repartition(1)`` task
    (the bitset rows move through the JVM shuffle, never through Python
    pickling), and exactly ONE ``m/8``-byte row reaches the driver.

    (Earlier revision used ``RDD.treeAggregate`` over pickled
    ``BloomFilter`` objects — measured ~19 s/round at m=2^26 from the
    Python-serializer round-trips; this shape is ~10× cheaper and keeps
    the whole merge in Tungsten.)
    """
    if m_bits is None:
        proto = BloomFilter.sized_for(expected_items or 1_000_000)
        m_bits, k = proto.m_bits, proto.k

    def build_partition(batches):
        bf = BloomFilter(m_bits, k)
        n = 0
        for pdf in batches:
            n += len(pdf)
            bf.add_many(pdf.iloc[:, 0].to_numpy(dtype=np.int64))
        if n:  # empty partitions emit nothing — no idle 8 MB rows
            yield pd.DataFrame({"words": [bf.words.tobytes()]})

    def or_merge(batches):
        out = None
        for pdf in batches:
            for w in pdf["words"]:
                arr = np.frombuffer(bytes(w), dtype=np.uint64)
                out = arr.copy() if out is None else out | arr
        if out is not None:
            yield pd.DataFrame({"words": [out.tobytes()]})

    # bound the number of m/8-byte partial bitsets entering the merge
    # shuffle (coalesce is a no-op when fewer partitions exist)
    parts = df.select(hash_column).coalesce(8).mapInPandas(
        build_partition, schema="words binary"
    )
    # repartition (NOT coalesce — that would collapse the build stage
    # itself to one task) so the OR-merge is one downstream task
    rows = parts.repartition(1).mapInPandas(
        or_merge, schema="words binary"
    ).collect()
    if not rows:
        return BloomFilter(m_bits, k)
    words = np.frombuffer(bytes(rows[0][0]), dtype=np.uint64).copy()
    return BloomFilter(m_bits, k, words)


def split_by_bloom(
    candidates: DataFrame, hash_column: str, bloom: BloomFilter,
    bc_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (provably_unseen, maybe_seen).

    Only ``maybe_seen`` needs the exact anti-join against ``visited``.

    ``bc_out``: the per-call bitset broadcast is appended here so the
    caller can ``destroy()`` it once the round's actions complete — a
    long crawl would otherwise accumulate one dead ~m/8-byte broadcast
    per round on the driver and executors.
    """
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.m_bits, bloom.k, bloom.words))
    if bc_out is not None:
        bc_out.append(bc)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(hashes: pd.Series) -> pd.Series:
        m, kk, words = bc.value
        bf = BloomFilter(m, kk, words)
        return pd.Series(bf.contains_many(hashes.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn("_maybe_seen", maybe_seen_udf(F.col(hash_column)))
    return (
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen"),
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"),
    )


# ---------------------------------------------------------------------------
# Sharded (distributed) variant — the 10^10-URL path.
#
# The single driver-held filter above caps at driver memory: at 10^10
# URLs a 16-bits/item filter is ~20 GB — neither driver-holdable nor
# broadcastable. The sharded variant partitions the bit space by a
# remix of the key hash into ``n_shards`` independent filters stored as
# ROWS ``(shard_id int, words binary)`` in a DataFrame/parquet table;
# build, OR-merge, and probe are all executor-side:
#
# * build: hashes grouped by shard → one bitset per shard
#   (``applyInPandas``, Arrow);
# * merge: union + groupBy(shard_id) OR-fold — each round only ships
#   the delta;
# * probe: candidates co-grouped with their shard's bitset
#   (``cogroup.applyInPandas``) — each executor holds exactly one
#   ``m_bits/8`` slice at a time, never the whole filter.
#
# Per-executor memory is m_bits/8 bytes per shard regardless of total
# filter size, so the advisory layer keeps working at any frontier
# scale. The shard route uses ``xxhash64(hash)`` (remixed) so shard
# membership is independent of the in-filter bit positions (which use
# the raw hash) — routing by ``hash % n_shards`` would pin the low bits
# of every in-shard key and waste 1/n_shards of the bit space.
# ---------------------------------------------------------------------------


def shard_col(hash_column: Column, n_shards: int) -> Column:
    """Shard route for a key hash — remixed, JVM-side."""
    return F.pmod(F.xxhash64(hash_column), F.lit(n_shards)).cast("int")


def build_bloom_shards(
    df: DataFrame, hash_column: str, n_shards: int, m_bits: int, k: int
) -> DataFrame:
    """(shard_id, words) bitset rows from a hash column. ``m_bits`` is
    the size of EACH shard's filter."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, k)
        bf.add_many(pdf[hash_column].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"shard_id": [int(pdf["_shard"].iloc[0])], "words": [bf.words.tobytes()]}
        )

    return (
        df.select(hash_column)
        .withColumn("_shard", shard_col(F.col(hash_column), n_shards))
        .groupBy("_shard")
        .applyInPandas(build, schema="shard_id int, words binary")
    )


def merge_bloom_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two (shard_id, words) tables (map-side-combinable agg
    shape; shards missing on one side pass through)."""

    def orm(pdf: pd.DataFrame) -> pd.DataFrame:
        out = None
        for w in pdf["words"]:
            arr = np.frombuffer(bytes(w), dtype=np.uint64)
            out = arr.copy() if out is None else out | arr
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])], "words": [out.tobytes()]}
        )

    return (
        a.unionByName(b)
        .groupBy("shard_id")
        .applyInPandas(orm, schema="shard_id int, words binary")
    )


def split_by_bloom_shards(
    candidates: DataFrame,
    hash_column: str,
    shards: DataFrame,
    n_shards: int,
    m_bits: int,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """Sharded probe: co-group candidates with their shard's bitset.

    Returns (provably_unseen, maybe_seen) exactly like
    :func:`split_by_bloom`; candidates whose shard has no bitset yet
    are provably unseen.
    """
    from pyspark.sql import types as T

    cand = candidates.withColumn("_shard", shard_col(F.col(hash_column), n_shards))
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("_maybe_seen", T.BooleanType())]
    )
    col_names = [f.name for f in out_schema.fields]

    def probe(cpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
        cpdf = cpdf.copy()
        if len(cpdf) == 0:
            cpdf["_maybe_seen"] = np.zeros(0, dtype=bool)
            return cpdf[col_names] if set(col_names) <= set(cpdf.columns) else cpdf
        if len(spdf) == 0:
            cpdf["_maybe_seen"] = False
            return cpdf
        bf = BloomFilter(
            m_bits, k, np.frombuffer(bytes(spdf["words"].iloc[0]), dtype=np.uint64).copy()
        )
        cpdf["_maybe_seen"] = bf.contains_many(
            cpdf[hash_column].to_numpy(dtype=np.int64)
        )
        return cpdf

    flagged = (
        cand.groupBy("_shard")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(probe, schema=out_schema)
    )
    return (
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen", "_shard"),
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen", "_shard"),
    )
