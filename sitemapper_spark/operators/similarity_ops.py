"""Similarity search over embedding columns (``array<float>``).

Three tiers, scale-ordered:

* :func:`cosine_topk` — exact brute force, pure Catalyst fold
  (``zip_with`` + ``aggregate``); the correctness baseline. O(N·d) per
  query, embarrassingly parallel, no shuffle until the final top-k.
* :func:`srp_lsh_near_dup_pairs` — signed-random-projection LSH: bit
  signatures via one Arrow-batched numpy matmul, band-bucket join for
  candidates, exact cosine verify on the candidate sliver only. The
  all-pairs scale path.
* :func:`ivf_topk` — IVF-style index: deterministic k-means (few Lloyd
  rounds, seeded init), cluster assignment via numpy matmul, query
  probes only the ``nprobe`` nearest centroids — the 100 TB ANN path
  (scan prunes to ~nprobe/k of the data via partition-pruned cluster
  column).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "cosine_sim_col",
    "cosine_topk",
    "srp_signature_col",
    "srp_lsh_near_dup_pairs",
    "kmeans_centroids",
    "ivf_assign",
    "ivf_topk",
]


def _fold_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _fold_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim_col(a: Column, b: Column) -> Column:
    """Exact cosine similarity — sequential JVM fold, deterministic."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _fold_dot(a, b) / (_fold_norm(a) * _fold_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_sim_col(F.col(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _srp_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, n_bits)).astype(np.float64)


def srp_signature_col(
    vec: Column, dim: int, n_bits: int = 64, seed: int = 42
) -> Column:
    """Signed-random-projection bit signature (one numpy matmul per
    Arrow batch — the vectorized slow-path done right)."""
    planes = _srp_planes(dim, n_bits, seed)
    assert n_bits <= 64, "signature column is a single int64"

    @F.pandas_udf(T.LongType())
    def _sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        bits = (m @ planes) > 0  # (n, n_bits)
        if n_bits < 64:  # pad to a full word so the view below is exact
            bits = np.concatenate(
                [bits, np.zeros((len(bits), 64 - n_bits), dtype=bool)], axis=1
            )
        # all-numpy bit packing: little-endian packbits puts bit k of the
        # signature at position k, so the uint64 view equals
        # sum(bits[k] << k) — no Python-object bigint math in the loop
        packed = np.ascontiguousarray(
            np.packbits(bits, axis=1, bitorder="little")
        )
        vals = packed.view(np.uint64).ravel().view(np.int64)
        return pd.Series(vals, dtype="int64")

    return _sig(vec)


def srp_lsh_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 64,
    n_chunks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    broadcast_vectors: bool = True,
) -> DataFrame:
    """Near-duplicate embedding pairs: SRP-LSH banding + exact verify.

    A pair at cosine ≥ threshold disagrees on few SRP bits, so with
    ``n_chunks`` bands of ``n_bits/n_chunks`` bits it collides in ≥1
    band with high probability; collisions are verified with the exact
    JVM cosine fold.

    Candidate-sliver plan (round-6 optimization, guide §2.3/§2.4/§3.1;
    output provably identical to the old dropDuplicates plan):

    * norms are folded ONCE per vector (same ``_fold_norm`` expression
      over the same array → bit-identical doubles) instead of twice per
      candidate pair — at B candidate pairs that removes 2B of the 3B
      higher-order folds from the verify stage;
    * each colliding pair is emitted exactly once, from its MINIMAL
      colliding band: band c emits (a, b) only when no band c' < c also
      collides (checked from the carried 8-byte signatures with shift/
      mask bit ops — no extra data). The emitted multiset is therefore
      already distinct and the old ``dropDuplicates`` — a full exchange
      + sort of the candidate sliver, the plan's 2nd-largest shuffle —
      is dropped outright;
    * with ``broadcast_vectors`` (default) the verify attach joins are
      broadcast-hash instead of shuffle joins, so candidate pairs never
      exchange at all and the d-dim vectors never shuffle. The build
      side is (id, v, nrm) of the INPUT table — fine up to ~10^6
      vectors; at corpus scale flip to False and the attach falls back
      to shuffle joins on ids (the pre-r6 plan).
    """
    from .dedup_ops import _spread

    sigs = _spread(embeddings, id_col).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        srp_signature_col(F.col(vec_col), dim, n_bits, seed).alias("sig"),
    ).withColumn("nrm", _fold_norm(F.col("v"))).persist()
    bits_per_chunk = n_bits // n_chunks
    mask = (1 << bits_per_chunk) - 1

    def _chunk(col: Column, c: int) -> Column:
        return F.shiftrightunsigned(col, c * bits_per_chunk).bitwiseAND(
            F.lit(mask)
        )

    # Band on (id, sig) ONLY (mirrors the MinHash pipeline,
    # dedup_ops.py): the band self-join multiplies every row n_chunks×,
    # so carrying the d-dim vector through it multiplies shuffle bytes
    # by ~n_chunks·d·8 per row — at d=768 that is the difference
    # between shuffling ids and shuffling the corpus several times
    # over. Vectors are joined back AFTER banding, for the (small)
    # verify sliver only. The 8-byte sig rides along to drive the
    # minimal-band dedup below.
    chunks = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(*[_chunk(F.col("sig"), c) for c in range(n_chunks)])
        ).alias("chunk_id", "chunk"),
    )
    # Pin the band self-join's width with an EXPLICIT repartition on the
    # join key (user-specified counts are exempt from AQE coalescing).
    # The band rows are tiny (id, sig, chunk) — AQE sizes the join's
    # exchange by those few MB and coalesces it to a handful of
    # partitions — but the join's OUTPUT fans out ~bucket_size× per row
    # and the whole verify chain (broadcast attach + cosine fold) runs
    # in that same stage: measured 4-task stages folding 25M pairs at
    # sf1.0 (125 s) vs 32-wide (guide §2.5: size by what the stage
    # COMPUTES, not what the shuffle reads). Both join sides project
    # from this one repartition, so the exchange is planned once
    # (ReuseExchange) and the join itself adds none.
    spark = embeddings.sparkSession
    try:
        n_band_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on AQE-managed sessions
        n_band_parts = spark.sparkContext.defaultParallelism
    chunks = chunks.repartition(n_band_parts, "chunk_id", "chunk")
    left = chunks.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
        "chunk_id", "chunk",
    )
    right = chunks.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
        "chunk_id", "chunk",
    )
    # minimal-band emission: a pair colliding in k bands appears k
    # times in the join output; keep only the row from the smallest
    # colliding band — for band chunk_id, all earlier bands must
    # differ. Every colliding pair is emitted from exactly one band,
    # so the result is distinct by construction (== dropDuplicates).
    no_earlier = F.lit(True)
    for c in range(n_chunks - 1):
        no_earlier = no_earlier & (
            (F.col("chunk_id") <= F.lit(c))
            | (_chunk(F.col("sig_a"), c) != _chunk(F.col("sig_b"), c))
        )
    cand = (
        left.join(right, ["chunk_id", "chunk"])
        .filter((F.col("id_a") < F.col("id_b")) & no_earlier)
        .select("id_a", "id_b")
    )
    vecs = sigs.select(id_col, "v", "nrm")
    a_side = vecs.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"),
    )
    b_side = vecs.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
    )
    if broadcast_vectors:
        a_side, b_side = F.broadcast(a_side), F.broadcast(b_side)
    pairs = cand.join(a_side, "id_a").join(b_side, "id_b")
    cos = _fold_dot(F.col("v_a"), F.col("v_b")) / (
        F.col("n_a") * F.col("n_b")
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_clusters: int,
    dim: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic distributed Lloyd's k-means for the IVF index.

    Init = the ``n_clusters`` rows with smallest xxhash64(id) (a seeded,
    order-independent pseudo-random sample); each iteration is one
    assignment (numpy matmul in a pandas UDF) + one groupBy mean — all
    aggregation stays in Spark, only (k × dim) centroids hit the driver.
    """
    init = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(n_clusters)
        .collect()
    )
    centroids = np.stack([np.asarray(r["v"], dtype=np.float64) for r in init])

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    for _ in range(iters):
        assigned = ivf_assign(vecs, centroids, vec_col="v")
        sums = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            c = r["cluster"]
            acc.setdefault(c, np.zeros(dim))[r["pos"]] = r["s"]
            cnt[c] = r["n"]
        for c, v in acc.items():
            new[c] = v / max(cnt[c], 1)
        centroids = new
    return centroids


def ivf_assign(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid cluster id per vector (batched numpy matmul)."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        cents = bc.value  # (k, d)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])  # (n, d)
        d2 = (
            (m**2).sum(axis=1, keepdims=True)
            - 2 * (m @ cents.T)
            + (cents**2).sum(axis=1)[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return embeddings.withColumn(
        "cluster", _assign(F.col(vec_col).cast("array<double>"))
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the ``nprobe`` nearest clusters.

    ``indexed`` must carry the ``cluster`` column from
    :func:`ivf_assign` (at scale: written as a partition column so the
    filter prunes files before any scan)."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2, kind="stable")[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        indexed.filter(F.col("cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_sim_col(F.col(vec_col), qcol), 4).alias("cos_sim"),
            "cluster",
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
