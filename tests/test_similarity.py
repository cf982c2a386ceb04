"""Similarity search: brute-force == numpy oracle; SRP-LSH recall on
planted near-dups; IVF top-k ≥ ground truth overlap on probed clusters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sitemapper_spark.operators import similarity_ops as S

DIM = 16
N = 200


def make_vectors():
    rng = np.random.Generator(np.random.PCG64(11))
    vs = rng.standard_normal((N, DIM))
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    # plant near-duplicates: 190..199 are jittered copies of 0..9
    for i in range(10):
        v = vs[i] + 0.05 * rng.standard_normal(DIM)
        vs[190 + i] = v / np.linalg.norm(v)
    return vs


VECS = make_vectors()


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float(x) for x in VECS[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def numpy_topk(qi, k):
    q = VECS[qi]
    sims = VECS @ q / (np.linalg.norm(VECS, axis=1) * np.linalg.norm(q))
    order = sorted(range(N), key=lambda i: (-round(sims[i], 4), i))
    return [i for i in order if i != qi][:k]


def test_brute_force_matches_numpy(emb):
    got = [
        r["vec_id"]
        for r in S.cosine_topk(
            emb.filter(F.col("vec_id") != 0),
            [float(x) for x in VECS[0]], k=5,
        ).collect()
    ]
    # float32 storage: compare against numpy on the same float32 data
    assert got == numpy_topk(0, 5)


def test_srp_lsh_recalls_planted_pairs(emb):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in S.srp_lsh_near_dup_pairs(
            emb, dim=DIM, threshold=0.95, n_bits=64, n_chunks=8
        ).collect()
    }
    planted = {(i, 190 + i) for i in range(10)}
    found = planted & set(pairs)
    assert len(found) >= 9  # ≥90% recall on planted near-dups
    assert all(v >= 0.95 for v in pairs.values())  # exact verify: no FPs


def test_ivf_topk_probes_subset(emb):
    cents = S.kmeans_centroids(emb, n_clusters=8, dim=DIM, iters=2)
    assert cents.shape == (8, DIM)
    indexed = S.ivf_assign(emb, cents).persist()
    n_clusters_used = indexed.select("cluster").distinct().count()
    assert n_clusters_used >= 4
    got = S.ivf_topk(
        indexed, cents, [float(x) for x in VECS[0]], k=5, nprobe=3
    ).collect()
    assert len(got) == 5
    # the planted near-dup of vec 0 lands in the same cluster and must
    # be IVF-findable
    ids = [r["vec_id"] for r in got]
    assert 0 in ids or 190 in ids


def test_ivf_full_probe_equals_brute_force(emb):
    cents = S.kmeans_centroids(emb, n_clusters=4, dim=DIM, iters=1)
    indexed = S.ivf_assign(emb, cents)
    got = [
        r["vec_id"]
        for r in S.ivf_topk(
            indexed.filter(F.col("vec_id") != 0), cents,
            [float(x) for x in VECS[0]], k=5, nprobe=4,
        ).collect()
    ]
    assert got == numpy_topk(0, 5)  # nprobe=all → exact
