"""Generate a larger-SF replica of the driver's synthetic testdata for
LOCAL perf measurement only (the driver generates its own data; this
script exists because the round-end measurement runs at sf1.0 — see
BENCH_r05.json "sf": 1.0 — while /root/testdata stops at sf0.1).

TPC-H-ish tables are replicated R times with consistent key shifts so
join fan-outs and selectivities are preserved; documents are fresh
word-salad texts drawn from the sf0.1 vocabulary with planted exact
(1%) and near (2%) duplicates, mirroring the small-SF dup structure;
embeddings are fresh near-orthogonal gaussian vectors (the sf0.1 set's
empirical property). Row counts follow the observed scaling laws:
lineitem/orders/customer/supplier/part/events x10 per sf decade,
documents ~10x, embeddings ~4x (500 -> 500 -> 2000 across the three
driver SFs).

Usage: python tools/make_sf_replica.py [--out /tmp/gen/sf1.0] [--reps 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _key_shift(table: pa.Table, col: str, shift: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    return table.set_column(
        i, col, pc.add(table.column(col), pa.scalar(shift, pa.int64()))
    )


def replicate_tpch(name: str, reps: int, shifts: dict[str, int]) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(reps):
        p = t
        for col, base in shifts.items():
            if col in t.column_names and r > 0:
                p = _key_shift(p, col, base * r)
        parts.append(p)
    return pa.concat_tables(parts)


def gen_documents(n: int, seed: int = 42) -> pa.Table:
    src = pq.read_table(f"{SRC}/documents.parquet")
    texts = src.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split()})
    lens = np.array([len(t.split()) for t in texts])
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    rng = np.random.Generator(np.random.PCG64(seed))
    out_texts: list[str] = []
    for i in range(n):
        if i > 0 and i % 100 == 1:  # exact dup of previous (1%)
            out_texts.append(out_texts[i - 1])
            continue
        ln = int(rng.choice(lens))
        words = list(rng.choice(vocab, size=ln))
        if i > 0 and i % 50 == 2:  # near dup: mutate 10% of prev (2%)
            prev = out_texts[i - 1].split()
            words = list(prev)
            for _ in range(max(1, len(words) // 10)):
                words[int(rng.integers(0, len(words)))] = str(
                    rng.choice(vocab)
                )
        out_texts.append(" ".join(words))
    lang_col = [langs[i % len(langs)] for i in range(n)]
    src_col = [sources[i % len(sources)] for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "source": pa.array(src_col, pa.string()),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 7) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32), pa.int32()
            ),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gen/sf1.0")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--embs", type=int, default=8_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    reps = args.reps

    n_cust = 15_000 * 10  # shift bases cover the replicated key ranges
    shifts = {
        "lineitem": {"l_orderkey": 600_000},
        "orders": {"o_orderkey": 600_000, "o_custkey": n_cust},
        "customer": {"c_custkey": n_cust},
        "supplier": {"s_suppkey": 10_000},
        "part": {"p_partkey": 200_000},
        "events": {"event_id": 1_000_000},
    }
    for name in ["nation", "region"]:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{args.out}/{name}.parquet",
        )
        print(name, "copied")
    for name, sh in shifts.items():
        t = replicate_tpch(name, reps, sh)
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(name, t.num_rows)
    d = gen_documents(args.docs)
    pq.write_table(d, f"{args.out}/documents.parquet")
    print("documents", d.num_rows)
    e = gen_embeddings(args.embs)
    pq.write_table(e, f"{args.out}/embeddings.parquet")
    print("embeddings", e.num_rows)


if __name__ == "__main__":
    main()
