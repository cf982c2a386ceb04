"""A/B: MinHash signature as 128 Catalyst passes vs one numpy matrix UDF.

Round-4 verdict item #6. Times the FULL minhash_near_dup_pairs pipeline
(signature impl is the only variable) on the sf documents table at the
bench-suite parameterization (k=128, 64 bands x 2 rows, threshold 0.5),
best-of-N warm per impl, probe-bracketed like bench.py so the readings
are weather-adjudicable. Also asserts the two impls produce identical
pair sets (they are bit-identical by construction; this checks it live).

Usage: python tools/bench_minhash_ab.py [sf_dir] [passes]
Writes bench_minhash_ab.json at the repo root.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sitemapper_spark.probes import cpu_probe_ms, membw_probe_ms  # noqa: E402
from sitemapper_spark.session import get_spark  # noqa: E402
from sitemapper_spark.operators.dedup_ops import minhash_near_dup_pairs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("minhash_ab", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def run(impl: str) -> dict:
        rows = []
        for i in range(passes):
            p0 = cpu_probe_ms()
            t0 = time.time()
            n = minhash_near_dup_pairs(
                docs, threshold=0.5, k=128, bands=64, rows_per_band=2,
                sig_impl=impl,
            ).count()
            sec = time.time() - t0
            p1 = cpu_probe_ms()
            rows.append({"run": "cold" if i == 0 else f"warm{i}",
                         "sec": round(sec, 2), "pairs": n,
                         "cpu_probe_ms": [p0, p1],
                         "membw_probe_ms": [membw_probe_ms()]})
        return {"passes": rows,
                "best_warm_sec": min(r["sec"] for r in rows[1:] or rows)}

    out = {"sf_dir": sf_dir, "k": 128, "bands": 64, "rows_per_band": 2,
           "impl": {impl: run(impl) for impl in ("catalyst", "numpy")}}

    # live identity check (oracle already pins catalyst; this pins the A/B)
    a = set(map(tuple, minhash_near_dup_pairs(
        docs, threshold=0.5, k=128, bands=64, rows_per_band=2,
        sig_impl="catalyst").collect()))
    b = set(map(tuple, minhash_near_dup_pairs(
        docs, threshold=0.5, k=128, bands=64, rows_per_band=2,
        sig_impl="numpy").collect()))
    assert a == b, f"impl mismatch: {len(a ^ b)} differing pairs"
    out["identical_pairs"] = True
    out["n_pairs"] = len(a)

    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "bench_minhash_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
