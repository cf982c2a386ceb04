"""Benchmark harness — one JSON line on stdout.

Headline: URLs fetched+deduped per second for a multi-host BFS crawl
over a synthetic Zipf-skewed image+caption corpus (the BASELINE.json
metric), plus per-query wall times for the relational operator suite at
$SPARK_GRAFT_SF_DIR. Corpus generation is deterministic and cached in
/tmp (setup, not timed).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_PAGES (override corpus
size). Run `python tools/bench_scaling.py` for the N-vs-4N-parallelism
scaling-efficiency protocol (results in BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3_like",
    "frontier_topk_per_host",
    "seen_anti_join",
    "adjacency_collect",
    "extract_explode",
    "events_hourly",
    "dedup_exact",
    "dedup_normalized",
    "token_count",
    "ann_cosine_topk",
    # dedup/ANN pipeline family (round-2 verdict #7: catch regressions
    # in per-round times, not just correctness)
    "minhash_near_dup",
    "simhash_dup_pairs",
    "srp_near_dup_prod",  # production band config (8x8 bits) — the
    # scale-shape row. The degenerate-but-provable 32x2 oracle config
    # (`srp_near_dup`) stays in queries()/oracle_sql() for CORRECTNESS
    # but is OUT of the timed suite (round-4 verdict nit #2): it
    # benches a deliberately near-all-pairs candidate plan that exists
    # only to make the oracle's recall provable — 33 s / 24% of the r4
    # suite wall measuring a shape no production config would run.
    "ivf_ann_topk",
    "image_near_dup",
]

# Per-query timing is best-of-N (default 2) warm passes: this box is
# hypervisor-shared (steal flips 1→20% within a minute) and JIT warmup
# inflates first passes 2-4x, so single cold passes swung 20-70%
# round-over-round on UNCHANGED queries — useless for regression
# catching. Best-of-2 warm is the same protocol tools/bench_scaling.py
# follows. Override with SPARK_GRAFT_BENCH_PASSES=1 for a quick look.
BENCH_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def corpus_path(n_pages: int, n_hosts: int) -> str:
    return f"/tmp/sitemapper_bench_corpus_p{n_pages}_h{n_hosts}"


def ensure_corpus(spark, n_pages: int, n_hosts: int) -> str:
    from sitemapper_spark.corpus import synth_corpus

    path = corpus_path(n_pages, n_hosts)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        df = synth_corpus(
            spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=8,
            cross_host_fraction=0.15, error_fraction=0.02, with_images=True,
            img_w=16, img_h=12,
        )
        df.write.mode("overwrite").parquet(path)
    return path


def run_crawl_bench(spark, corpus_dir: str, tag: str, shape: str) -> dict:
    """Two crawl shapes:

    * ``mega`` (headline): seeds = 1/8 of the corpus at max_depth=2 —
      production-shaped fat rounds where data-proportional stage work
      (fetch join, image decode+verify, canonicalize, dedup) dominates
      the round fixpoint, like 10^8-row rounds on a real cluster;
    * ``deep``: 1 seed/host, BFS max_depth=8 under a politeness budget
      — the fixpoint-dominated small-round regime (frontier ramps up
      from 64 URLs), reported for the round-overhead picture.
    """
    from pyspark.sql import functions as F

    from sitemapper_spark.engine import CrawlConfig, CrawlEngine
    from sitemapper_spark.schemas import SEEDS_SCHEMA

    corpus = spark.read.parquet(corpus_dir)
    if shape == "mega":
        seeds = corpus.filter(F.xxhash64("url") % 8 == 0).select(
            "url",
            F.concat(F.lit("bench-"), F.col("host")).alias("sitemap_id"),
            F.lit(2).alias("max_depth"),
            F.lit(0.0).alias("priority"),
        ).select(*[f.name for f in SEEDS_SCHEMA.fields])
        max_depth, budget = 2, None
    else:
        seeds = [
            (r["url"], f"bench-{r['host']}", 8, 0.0)
            for r in (
                corpus.groupBy("host")
                .agg(F.min("url").alias("url"))
                .collect()
            )
        ]
        max_depth, budget = 8, 50_000
    ckpt = f"/tmp/sitemapper_bench_ckpt_{tag}_{shape}"
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = CrawlConfig(
        max_depth=max_depth,
        per_host_budget=budget,
        use_bloom=True,
        bloom_min_visited=10_000,
        checkpoint_dir=ckpt,
        hot_host_threshold=20_000,
        salt_buckets=8,
        decode_verify_images=True,  # north_star: fetch/decode per round
    )
    engine = CrawlEngine(spark, corpus, cfg)
    # bracket every crawl pass with the weather probes (round-4 verdict
    # #3): suite JSONs become weather-adjudicable after the fact — the
    # r4 driver-bench window read every untouched sub-second query
    # 30-100% "slower" than r3 and nothing in the JSON could prove it
    # was the box, not the code
    from sitemapper_spark.probes import cpu_probe_ms, membw_probe_ms

    probe0, membw0 = cpu_probe_ms(), membw_probe_ms()
    t0 = time.perf_counter()
    result = engine.run(seeds)
    visited_n = result.visited.count()
    edges_n = result.edges.count()
    elapsed = time.perf_counter() - t0
    probe1, membw1 = cpu_probe_ms(), membw_probe_ms()
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "visited": visited_n,
        "edges": edges_n,
        "rounds": result.rounds,
        "sec": round(elapsed, 3),
        "urls_per_sec": round(visited_n / elapsed, 1),
        "cpu_probe_ms": [probe0, probe1],
        "membw_probe_ms": [membw0, membw1],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sitemapper_spark import queries as qlib
    from sitemapper_spark.session import get_spark

    spark = get_spark(
        "sitemapper_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    # scale the crawl corpus with the sf of the relational tables
    lineitem_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_pages = int(
        os.environ.get("SPARK_GRAFT_BENCH_PAGES", max(20_000, lineitem_rows // 3))
    )
    n_hosts = 64
    corpus_dir = ensure_corpus(spark, n_pages, n_hosts)

    def crawl_best(shape: str) -> dict:
        runs = [
            run_crawl_bench(spark, corpus_dir, tag=f"c{cpus}", shape=shape)
            for _ in range(BENCH_PASSES)
        ]
        best = dict(min(runs, key=lambda r: r["sec"]))
        # every pass's bracketing probes, not just the winner's — a
        # best-of-N headline is only adjudicable if the rejected
        # passes' weather is on record too
        best["pass_probes"] = [
            {
                "sec": r["sec"],
                "cpu_probe_ms": r["cpu_probe_ms"],
                "membw_probe_ms": r["membw_probe_ms"],
            }
            for r in runs
        ]
        return best

    crawl = crawl_best("mega")
    crawl_deep = crawl_best("deep")

    from sitemapper_spark.probes import probe_pair

    suite_probe0 = probe_pair()
    qtimes: dict[str, float] = {}
    registry = qlib.all_queries()
    for name in BENCH_QUERIES:
        fn = registry[name]
        best = None
        for _ in range(BENCH_PASSES):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        qtimes[name] = round(best, 3)
    suite_probe1 = probe_pair()
    qtimes["crawl_mega"] = crawl["sec"]
    qtimes["crawl_deep_bfs"] = crawl_deep["sec"]

    total = round(sum(qtimes.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl,
                "crawl_deep": crawl_deep,
                "urls_per_sec": crawl["urls_per_sec"],
                "corpus_pages": n_pages,
                "cpus": cpus,
                "timing": f"best_of_{BENCH_PASSES}_warm",
                # weather telemetry: suite-bracketing + per-crawl-pass
                # probes (healthy floor ~90 ms cpu / ~25 ms membw on
                # this box; >=1.25x/1.3x floor = polluted window —
                # same certification rule as tools/bench_scaling.py)
                "suite_probes": [suite_probe0, suite_probe1],
            }
        )
    )


if __name__ == "__main__":
    main()
