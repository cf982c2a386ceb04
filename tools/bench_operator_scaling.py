"""Operator-level scaling: the per-URL work of a crawl round (image
decode+verify, link canonicalization, dedup hashing) as ONE Spark stage
over a cache-resident corpus, at N=8 vs 4N=32 cores in separate JVMs.

Rationale: the BFS fixpoint's per-round driver latency (~10s of job
scheduling + state materialization) is CONSTANT per round — on a real
4N-executor cluster each round processes billions of rows and that
latency vanishes, but on one 32-core box a test-sized crawl cannot make
it vanish (Amdahl). This harness therefore measures the part that a
bigger cluster actually parallelizes: the data-proportional operator
work. tools/bench_scaling.py measures the full loop; BENCH.md reports
both, with output-identity checks.

Usage: python tools/bench_operator_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)


def steal_now():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    return v[7], sum(v)

from pyspark.sql import functions as F
from sitemapper_spark.session import get_spark
from sitemapper_spark.functions.udfs import clean_links_udf
from sitemapper_spark.operators.multimodal import decode_verify

cpus = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark("opscale_%%d" %% cpus, master="local[%%d]" %% cpus,
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
corpus = spark.read.parquet(path)

# warm the page cache + JIT once (not timed against the other level
# unfairly: both levels warm identically)
corpus.select(F.count("url")).collect()

# stage 1: image decode + PSNR/caption verify (mapInPandas, Arrow).
# Two passes; keep the faster (JIT/python-worker warmup + hypervisor
# weather — same best-of rule as tools/bench_scaling.py).
t_decode, steal_decode = None, None
for _ in range(2):
    s0, j0 = steal_now()
    t0 = time.perf_counter()
    n_ok = decode_verify(corpus).filter(F.col("ok")).count()
    dt = time.perf_counter() - t0
    s1, j1 = steal_now()
    if t_decode is None or dt < t_decode:
        t_decode = dt
        steal_decode = round(100.0 * (s1 - s0) / max(1, j1 - j0), 1)

# stage 2: canonicalize + explode + hash-dedup count (pandas UDF + JVM)
t_canon, steal_canon = None, None
for _ in range(2):
    s0, j0 = steal_now()
    t0 = time.perf_counter()
    cleaned = corpus.withColumn(
        "links", clean_links_udf(F.col("out_links"), F.col("url"), F.col("final_url"))
    )
    n_links = (
        cleaned.select(F.explode("links").alias("dst"))
        .select(F.xxhash64("dst").alias("h"))
        .agg(F.countDistinct("h").alias("n"))
        .first()["n"]
    )
    dt = time.perf_counter() - t0
    s1, j1 = steal_now()
    if t_canon is None or dt < t_canon:
        t_canon = dt
        steal_canon = round(100.0 * (s1 - s0) / max(1, j1 - j0), 1)

print(json.dumps({
    "cpus": cpus, "decoded_ok": n_ok, "decode_sec": round(t_decode, 2),
    "decode_rows_per_sec": round(n_ok / t_decode, 1),
    "distinct_links": n_links, "canon_sec": round(t_canon, 2),
    "canon_rows_per_sec": round(n_links / t_canon, 1),
    "steal_decode_pct": steal_decode, "steal_canon_pct": steal_canon,
}))
"""


def run_level(cpus: int, corpus_path: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), corpus_path],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "24g"},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-1500:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"worker local[{cpus}] failed")
    return json.loads(lines[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sys.path.insert(0, REPO)
    from sitemapper_spark.corpus import synth_corpus
    from sitemapper_spark.session import get_spark

    path = f"/tmp/opscale_corpus_p{n_pages}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark("opscale_gen", master="local[32]",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        synth_corpus(
            spark, n_pages=n_pages, n_hosts=256, links_per_page=8,
            with_images=True, img_w=24, img_h=16, error_fraction=0.0,
        ).write.mode("overwrite").parquet(path)
        spark.stop()

    low = run_level(8, path)
    high = run_level(32, path)
    eff_decode = (high["decode_rows_per_sec"] / low["decode_rows_per_sec"]) / 4
    eff_canon = (high["canon_rows_per_sec"] / low["canon_rows_per_sec"]) / 4
    print(json.dumps({
        "metric": "operator_scaling_efficiency_8_to_32",
        "decode_eff": round(eff_decode, 3),
        "canon_eff": round(eff_canon, 3),
        "low": low, "high": high, "n_pages": n_pages,
    }))


if __name__ == "__main__":
    main()
