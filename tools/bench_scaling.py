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
seeds = [(r["url"], "s-" + r["host"], 8, 0.0)
         for r in corpus.groupBy("host").agg(F.min("url").alias("url")).collect()]
ckpt = "/tmp/scale_ckpt_%%d" %% cpus
shutil.rmtree(ckpt, ignore_errors=True)
cfg = CrawlConfig(max_depth=8, per_host_budget=50_000, use_bloom=True,
                  bloom_min_visited=20_000, checkpoint_dir=ckpt,
                  hot_host_threshold=20_000)
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
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    sys.path.insert(0, REPO)
    from sitemapper_spark.corpus import synth_corpus
    from sitemapper_spark.session import get_spark

    corpus_path = f"/tmp/scale_corpus_p{n_pages}_h{n_hosts}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark("scale_gen", master="local[32]",
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        synth_corpus(
            spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=8,
            cross_host_fraction=0.15, error_fraction=0.02,
            with_images=True, img_w=16, img_h=12,
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    low = run_level(8, corpus_path)
    high = run_level(32, corpus_path)
    assert low["sha256_visited"] == high["sha256_visited"], (
        "crawl output differs across parallelism levels!"
    )
    eff = (high["urls_per_sec"] / low["urls_per_sec"]) / 4.0
    report = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "low": low,
        "high": high,
        "identical_output": True,
        "n_pages": n_pages,
        "n_hosts": n_hosts,
    }
    print(json.dumps(report))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — crawl throughput + scaling efficiency\n\n"
            "Protocol per BASELINE.json north_rule adapted to the sandbox "
            "(no real cluster): the identical crawl job on the identical "
            "corpus at two parallelism levels, separate JVMs.\n\n"
            f"Corpus: {n_pages} pages / {n_hosts} Zipf-skewed hosts, image "
            "payloads on; BFS max_depth=8, politeness budget 50k/host/round, "
            "bloom seen-filter on.\n\n"
            "| parallelism | visited URLs | wall sec | URLs/sec |\n"
            "|---|---|---|---|\n"
            f"| local[8] | {low['visited']} | {low['sec']} | {low['urls_per_sec']} |\n"
            f"| local[32] | {high['visited']} | {high['sec']} | {high['urls_per_sec']} |\n\n"
            f"**Scaling efficiency (8→32 cores): {eff:.3f}** "
            "(north_rule target ≥ 0.8 between N and 4N executors)\n\n"
            f"Output identity across levels: sha256(visited) match = "
            f"`{low['sha256_visited'][:16]}…` — the determinism clause holds.\n\n"
            "Caveat: local-mode cores share one JVM, one disk and the "
            "driver thread, so fixed per-round job-scheduling overhead "
            "does not parallelize; on a real 4N-executor cluster the "
            "round's shuffle/scan work (which does scale) dominates.\n"
        )


if __name__ == "__main__":
    main()
