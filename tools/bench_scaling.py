"""N-vs-4N scaling-efficiency protocol (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver instruction
the same crawl job runs at two parallelism levels — local[8] and
local[32] — on the SAME pre-generated corpus, in separate JVMs
(subprocesses). Reports throughput at both, efficiency
(T32/T8)/4, and asserts bit-identical crawl output across levels
(the determinism clause of the north_rule). Writes BENCH.md.

Usage: python tools/bench_scaling.py [n_pages] [n_hosts]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import hashlib, json, shutil, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from sitemapper_spark.session import get_spark
from sitemapper_spark.engine import CrawlConfig, CrawlEngine

cpus = int(sys.argv[1])
corpus_path = sys.argv[2]
spark = get_spark("scale_%%d" %% cpus, master="local[%%d]" %% cpus,
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
corpus = spark.read.parquet(corpus_path)
# 16 seeds per host (one sitemap per host): wide frontier from round 0
# so per-round payload work (decode+verify+canonicalize) dominates
# fixed round latency
seeds = [(r["u"], "s-" + r["host"], 4, 0.0)
         for r in corpus.groupBy("host")
         .agg(F.slice(F.array_sort(F.collect_list("url")), 1, 16).alias("us"))
         .select("host", F.explode("us").alias("u")).collect()]
ckpt = "/tmp/scale_ckpt_%%d" %% cpus
shutil.rmtree(ckpt, ignore_errors=True)
cfg = CrawlConfig(max_depth=4, per_host_budget=None, use_bloom=True,
                  bloom_min_visited=20_000, checkpoint_dir=ckpt,
                  hot_host_threshold=200_000, decode_verify_images=True)
t0 = time.perf_counter()
res = CrawlEngine(spark, corpus, cfg).run(seeds)
visited = sorted((r["sitemap_id"], r["url"], r["depth"]) for r in res.visited.collect())
elapsed = time.perf_counter() - t0
edges_n = res.edges.count()
digest = hashlib.sha256(json.dumps(visited).encode()).hexdigest()
shutil.rmtree(ckpt, ignore_errors=True)
print(json.dumps({"cpus": cpus, "visited": len(visited), "edges": edges_n,
                  "sec": round(elapsed, 2),
                  "urls_per_sec": round(len(visited) / elapsed, 1),
                  "sha256_visited": digest}))
"""


def run_level(cpus: int, corpus_path: str) -> dict:
    script = WORKER % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), corpus_path],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"worker local[{cpus}] produced no result")
    return json.loads(lines[-1])


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # workers inherit
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    img_w = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    img_h = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    sys.path.insert(0, REPO)
    from sitemapper_spark.corpus import synth_corpus
    from sitemapper_spark.session import get_spark

    corpus_path = f"/tmp/scale_corpus_p{n_pages}_h{n_hosts}_i{img_w}x{img_h}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark("scale_gen", master="local[32]",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        synth_corpus(
            spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=8,
            cross_host_fraction=0.15, error_fraction=0.02,
            with_images=True, img_w=img_w, img_h=img_h,
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    levels = {c: run_level(c, corpus_path) for c in (8, 32)}
    digests = {r["sha256_visited"] for r in levels.values()}
    assert len(digests) == 1, "crawl output differs across parallelism levels!"
    eff_8_32 = (levels[32]["urls_per_sec"] / levels[8]["urls_per_sec"]) / 4.0
    report = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff_8_32, 3),
        "eff_8_to_32_cores": round(eff_8_32, 3),
        "levels": levels,
        "identical_output": True,
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "img": f"{img_w}x{img_h}",
    }
    print(json.dumps(report))

    rows = "\n".join(
        f"| local[{c}] | {r['visited']} | {r['sec']} | {r['urls_per_sec']} |"
        for c, r in levels.items()
    )
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — crawl throughput + scaling efficiency\n\n"
            "Protocol per BASELINE.json north_rule adapted to the sandbox "
            "(no real cluster): the identical crawl job — fetch-join, image "
            "decode+verify (PSNR/caption per row), canonicalize, "
            "bloom+anti-join dedup, image-row append — on the identical "
            "corpus at N=8 and 4N=32 cores, separate JVMs, run serially.\n\n"
            f"Corpus: {n_pages} pages / {n_hosts} Zipf-skewed hosts, "
            f"{img_w}x{img_h} image payloads decoded+verified per fetch; "
            "16 seeds/host, BFS max_depth=4, bloom seen-filter on.\n\n"
            "| parallelism | visited URLs | wall sec | URLs/sec |\n"
            "|---|---|---|---|\n"
            f"{rows}\n\n"
            f"**Scaling efficiency N→4N (8→32 cores): {eff_8_32:.3f}** "
            "(north_rule target ≥ 0.8 between N and 4N executors)\n\n"
            f"Output identity across levels: sha256(visited) = "
            f"`{list(digests)[0][:16]}…` — the determinism clause holds at "
            "every parallelism.\n\n"
            "Caveats: local-mode cores share one JVM, one disk, one driver "
            "thread and the host with other tenants (ambient load 4-6), so "
            "the wide level pays oversubscription and shuffle-disk "
            "contention a real multi-executor cluster would not.\n"
        )


if __name__ == "__main__":
    main()
