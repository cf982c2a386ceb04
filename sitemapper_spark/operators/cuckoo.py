"""Cuckoo-filter URL-seen set — the deletion-capable alternative to
:mod:`operators.bloom` (north_star: "Bloom/cuckoo-filter URL-seen set
maintained per partition and merged").

Why a cuckoo filter at all (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14 — public paper, see PAPERS.md): same
advisory-pre-filter role as the Bloom, plus

* **deletions** — a re-flight workflow (recrawl an error URL, expire a
  host after robots change) can remove keys without rebuilding, which
  a Bloom fundamentally cannot;
* **lower false-positive rate per bit** at high load factors, so the
  maybe-seen sliver that reaches the exact anti-join is smaller.

Like the Bloom, it is STRICTLY advisory: a positive means "confirm via
exact anti-join", a negative means "provably unseen" — false positives
cost a probe, never a lost URL. One caveat is inherent to cuckoo
filters and enforced here by contract: deleting a key that was never
inserted can evict another key's fingerprint and create a false
negative, so ``delete_many`` must only receive previously-inserted
keys (the engine only ever deletes from its own ``visited`` table).

Layout: ``n_buckets`` (power of two) × ``bucket_size`` slots of uint16
fingerprints (0 = empty). Candidate buckets follow the standard
partial-key scheme: ``i2 = i1 XOR H(fp)``, so a slot's alternate
bucket is computable from the slot alone — which is what makes both
deletion and **filter merge** (re-inserting another filter's non-empty
slots) possible without the original keys.

All hot paths are numpy-vectorized over int64 hash arrays (the keys
are JVM-side ``xxhash64`` values — Python never sees URLs); only
overflow items that need eviction kicks fall back to a per-item loop,
and those are rare below ~90% load.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CuckooFull",
    "CuckooFilter",
    "build_cuckoo",
    "split_by_cuckoo",
    "build_cuckoo_shards",
    "merge_cuckoo_shards",
    "delete_from_cuckoo_shards",
    "split_by_cuckoo_shards",
]

_FP_MUL = np.uint64(0x5BD1E995)  # fp → alt-bucket mix (MurmurHash2 M)


class CuckooFull(RuntimeError):
    """MAX_KICKS exhausted — the filter is over capacity.

    Standalone-library contract: the raise is hard (callers sized the
    filter; silent degradation would hide a sizing bug), and the filter
    may have lost the one in-flight evicted fingerprint, so a caller
    that catches this must treat the instance as corrupt. The crawl
    engine catches it and degrades gracefully instead (rebuild bigger
    from the exact visited table, else disable the advisory pre-filter
    — the filter is strictly advisory, so a crash is never necessary).
    """


class CuckooFilter:
    """Fixed-size cuckoo filter over int64 keys, numpy-vectorized."""

    MAX_KICKS = 500

    def __init__(
        self,
        n_buckets: int,
        bucket_size: int = 4,
        table: np.ndarray | None = None,
    ):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        )
        self.n_items = int(np.count_nonzero(self.table))

    @staticmethod
    def sized_for(n_items: int, bucket_size: int = 4) -> "CuckooFilter":
        """~95% max load factor at bucket_size 4 → size for ~85% target."""
        need = int(n_items / 0.85 / bucket_size) + 1
        n_buckets = 1 << max(4, int(np.ceil(np.log2(need))))
        return CuckooFilter(n_buckets, bucket_size)

    # -- key decomposition -------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        """16-bit nonzero fingerprint from the hash high bits."""
        fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(
            np.uint16
        )
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64) & np.uint64(self.n_buckets - 1)).astype(
            np.int64
        )

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = (fp.astype(np.uint64) * _FP_MUL) & np.uint64(self.n_buckets - 1)
        return (idx.astype(np.uint64) ^ mix).astype(np.int64) & (
            self.n_buckets - 1
        )

    # -- insert ------------------------------------------------------------
    def _insert_pairs(self, idx: np.ndarray, fp: np.ndarray) -> None:
        """Insert (bucket, fingerprint) pairs; the engine of add_many
        and merge. Vectorized first-fit into i1 then i2; leftovers do
        per-item cuckoo kicks."""
        for attempt_alt in (False, True):
            if len(idx) == 0:
                return
            b = self._alt(idx, fp) if attempt_alt else idx
            placed = np.zeros(len(idx), dtype=bool)
            # process bucket-by-bucket groups so concurrent inserts into
            # one bucket don't overwrite the same slot
            order = np.argsort(b, kind="stable")
            bs, starts = np.unique(b[order], return_index=True)
            for gi, bucket in enumerate(bs):
                lo = starts[gi]
                hi = starts[gi + 1] if gi + 1 < len(starts) else len(order)
                free = np.flatnonzero(self.table[bucket] == 0)
                take = min(len(free), hi - lo)
                if take:
                    items = order[lo : lo + take]
                    self.table[bucket, free[:take]] = fp[items]
                    placed[items] = True
                    self.n_items += take
            idx, fp = idx[~placed], fp[~placed]
        # rare path: eviction kicks, per item
        rng_state = np.uint64(0x9E3779B97F4A7C15)
        for j in range(len(idx)):
            cur_i, cur_fp = int(idx[j]), np.uint16(fp[j])
            for _ in range(self.MAX_KICKS):
                row = self.table[cur_i]
                free = np.flatnonzero(row == 0)
                if len(free):
                    row[free[0]] = cur_fp
                    self.n_items += 1
                    break
                # deterministic "random" slot: derived from state, no
                # RNG (LCG; uint64 wraparound is the intended modulus)
                with np.errstate(over="ignore"):
                    rng_state = (
                        rng_state * np.uint64(6364136223846793005)
                        + np.uint64(1442695040888963407)
                    )
                slot = int(rng_state >> np.uint64(59)) % self.bucket_size
                cur_fp, row[slot] = row[slot], cur_fp
                cur_i = int(
                    self._alt(np.array([cur_i]), np.array([cur_fp]))[0]
                )
            else:
                raise CuckooFull(
                    "cuckoo filter over capacity — size with sized_for()"
                )

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.int64)
        self._insert_pairs(self._i1(h), self._fp(h))

    # -- query -------------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.int64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # -- delete ------------------------------------------------------------
    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one fingerprint occurrence per key. Only pass keys
        that were inserted (see module docstring). Returns #removed."""
        removed = 0
        if len(hashes) == 0:
            return 0
        h = hashes.astype(np.int64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        for j in range(len(h)):  # per-item: dup keys must each remove one slot
            for bucket in (int(i1[j]), int(i2[j])):
                slots = np.flatnonzero(self.table[bucket] == fp[j])
                if len(slots):
                    self.table[bucket, slots[0]] = 0
                    self.n_items -= 1
                    removed += 1
                    break
        return removed

    # -- merge -------------------------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """OR-equivalent merge: re-insert every non-empty slot of
        ``other``. Works from slots alone (partial-key cuckoo): a slot
        in bucket b with fingerprint f belongs at b or alt(b, f)."""
        assert (
            self.n_buckets == other.n_buckets
            and self.bucket_size == other.bucket_size
        )
        out = CuckooFilter(self.n_buckets, self.bucket_size, self.table.copy())
        b_idx, _slot = np.nonzero(other.table)
        if len(b_idx):
            out._insert_pairs(
                b_idx.astype(np.int64), other.table[other.table != 0]
            )
        return out


def build_cuckoo(
    df: DataFrame,
    hash_column: str,
    n_buckets: int,
    bucket_size: int = 4,
) -> CuckooFilter:
    """Distributed build: per-partition partial filters via
    ``mapInPandas`` (Arrow, int64 column only), slot tables OR-merged
    executor-side in a single ``repartition(1)`` task, ONE table row
    collected — the exact shape of :func:`bloom.build_bloom`."""

    def build_partition(batches):
        cf = CuckooFilter(n_buckets, bucket_size)
        n = 0
        for pdf in batches:
            n += len(pdf)
            cf.add_many(pdf.iloc[:, 0].to_numpy(dtype=np.int64))
        if n:
            yield pd.DataFrame({"table": [cf.table.tobytes()]})

    def merge_tables(batches):
        out = None
        for pdf in batches:
            for t in pdf["table"]:
                cf = CuckooFilter(
                    n_buckets,
                    bucket_size,
                    np.frombuffer(bytes(t), dtype=np.uint16)
                    .reshape(n_buckets, bucket_size)
                    .copy(),
                )
                out = cf if out is None else out.merge(cf)
        if out is not None:
            yield pd.DataFrame({"table": [out.table.tobytes()]})

    parts = df.select(hash_column).coalesce(8).mapInPandas(
        build_partition, schema="table binary"
    )
    rows = parts.repartition(1).mapInPandas(
        merge_tables, schema="table binary"
    ).collect()
    if not rows:
        return CuckooFilter(n_buckets, bucket_size)
    table = (
        np.frombuffer(bytes(rows[0][0]), dtype=np.uint16)
        .reshape(n_buckets, bucket_size)
        .copy()
    )
    return CuckooFilter(n_buckets, bucket_size, table)


# ---------------------------------------------------------------------------
# Sharded (distributed) variant — the 10^10-URL deletion-capable path.
#
# The driver-held filter above caps at driver memory: at 10^10 URLs a
# 4-slot/bucket uint16 table is ~34 GB — neither driver-holdable nor
# broadcastable. Exactly like `bloom.build_bloom_shards`, the key space
# is partitioned by a REMIXED hash (`bloom.shard_col`: xxhash64-remix →
# pmod, independent of the raw-hash bits that pick in-filter buckets)
# into ``n_shards`` independent cuckoo tables stored as ROWS
# ``(shard_id int, table binary)``; build, merge, probe, AND DELETE are
# all executor-side cogroup/applyInPandas jobs — the driver never holds
# a table. Per-executor memory is one shard's table at a time, so the
# advisory layer (and its deletions) keep working at any frontier scale.
#
# The slot-level partial-key property is what makes the sharded merge
# and delete transfer directly from the driver-mode code: a slot in
# bucket b with fingerprint f belongs at b or alt(b, f), with no need
# for the original keys.
# ---------------------------------------------------------------------------


def _table_of(row_bytes, n_buckets: int, bucket_size: int) -> "CuckooFilter":
    return CuckooFilter(
        n_buckets,
        bucket_size,
        np.frombuffer(bytes(row_bytes), dtype=np.uint16)
        .reshape(n_buckets, bucket_size)
        .copy(),
    )


def build_cuckoo_shards(
    df: DataFrame,
    hash_column: str,
    n_shards: int,
    n_buckets: int,
    bucket_size: int = 4,
) -> DataFrame:
    """(shard_id, table) cuckoo rows from a hash column. ``n_buckets``
    sizes EACH shard's table."""
    from .bloom import shard_col

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(n_buckets, bucket_size)
        cf.add_many(pdf[hash_column].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"shard_id": [int(pdf["_shard"].iloc[0])],
             "table": [cf.table.tobytes()]}
        )

    return (
        df.select(hash_column)
        .withColumn("_shard", shard_col(F.col(hash_column), n_shards))
        .groupBy("_shard")
        .applyInPandas(build, schema="shard_id int, table binary")
    )


def merge_cuckoo_shards(
    a: DataFrame, b: DataFrame, n_buckets: int, bucket_size: int = 4
) -> DataFrame:
    """Merge two (shard_id, table) cuckoo tables slot-wise (shards
    missing on one side pass through; each round ships only the delta)."""

    def mrg(pdf: pd.DataFrame) -> pd.DataFrame:
        out = None
        for t in pdf["table"]:
            cf = _table_of(t, n_buckets, bucket_size)
            out = cf if out is None else out.merge(cf)
        return pd.DataFrame(
            {"shard_id": [int(pdf["shard_id"].iloc[0])],
             "table": [out.table.tobytes()]}
        )

    return (
        a.unionByName(b)
        .groupBy("shard_id")
        .applyInPandas(mrg, schema="shard_id int, table binary")
    )


def delete_from_cuckoo_shards(
    shards: DataFrame,
    hashes: DataFrame,
    hash_column: str,
    n_shards: int,
    n_buckets: int,
    bucket_size: int = 4,
) -> DataFrame:
    """Distributed deletion: remove the given key hashes from their
    shards' tables (cogroup — each task holds exactly one shard table).

    Same contract as :meth:`CuckooFilter.delete_many`: only pass keys
    that were inserted. Shards with no deletions pass through unchanged;
    hashes routed to a shard that has no table yet are ignored (nothing
    to delete)."""
    from .bloom import shard_col

    h = hashes.select(hash_column).withColumn(
        "shard_id", shard_col(F.col(hash_column), n_shards)
    )

    def dele(spdf: pd.DataFrame, hpdf: pd.DataFrame) -> pd.DataFrame:
        if len(spdf) == 0:  # no table for this shard: nothing to delete
            return pd.DataFrame({"shard_id": [], "table": []}).astype(
                {"shard_id": "int32"}
            )
        cf = _table_of(spdf["table"].iloc[0], n_buckets, bucket_size)
        if len(hpdf):
            cf.delete_many(hpdf[hash_column].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"shard_id": [int(spdf["shard_id"].iloc[0])],
             "table": [cf.table.tobytes()]}
        )

    return (
        shards.groupBy("shard_id")
        .cogroup(h.groupBy("shard_id"))
        .applyInPandas(dele, schema="shard_id int, table binary")
    )


def split_by_cuckoo_shards(
    candidates: DataFrame,
    hash_column: str,
    shards: DataFrame,
    n_shards: int,
    n_buckets: int,
    bucket_size: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Sharded probe: co-group candidates with their shard's table.

    Returns (provably_unseen, maybe_seen) exactly like
    :func:`split_by_cuckoo`; candidates whose shard has no table yet are
    provably unseen."""
    from .bloom import shard_col

    cand = candidates.withColumn(
        "_shard", shard_col(F.col(hash_column), n_shards)
    )
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
        cf = _table_of(spdf["table"].iloc[0], n_buckets, bucket_size)
        cpdf["_maybe_seen"] = cf.contains_many(
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


def split_by_cuckoo(
    candidates: DataFrame, hash_column: str, cf: CuckooFilter,
    bc_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (provably_unseen, maybe_seen) — drop-in
    for :func:`bloom.split_by_bloom`. ``bc_out`` collects the per-call
    table broadcast for end-of-round ``destroy()`` (same leak fix as
    ``split_by_bloom``)."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(
        (cf.n_buckets, cf.bucket_size, cf.table)
    )
    if bc_out is not None:
        bc_out.append(bc)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen_udf(hashes: pd.Series) -> pd.Series:
        nb, bs, table = bc.value
        f = CuckooFilter(nb, bs, table)
        return pd.Series(f.contains_many(hashes.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn(
        "_maybe_seen", maybe_seen_udf(F.col(hash_column))
    )
    return (
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen"),
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"),
    )
