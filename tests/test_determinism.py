"""Parallelism-invariance: identical crawl output at different
partition counts (the reference's three-engine equivalence test,
`crawler_test.go:37-106`, generalized per SURVEY §5.5 — full
local[8]-vs-local[32] protocol lives in tools/bench_scaling.py)."""

import pytest
from pyspark.sql import functions as F

from sitemapper_spark import corpus as cm
from sitemapper_spark.engine import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def synth_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("det") / "pages")
    cm.synth_corpus(
        spark, n_pages=3000, n_hosts=6, links_per_page=5, with_images=False
    ).write.parquet(p)
    return p


def crawl_state(spark, corpus_path, tmp_path, npart, budget, bloom, max_depth=5):
    corpus = spark.read.parquet(corpus_path)
    seeds = [
        (r["url"], f"s-{r['host']}", max_depth, 0.0)
        for r in corpus.groupBy("host").agg(F.min("url").alias("url")).collect()
    ]
    cfg = CrawlConfig(
        max_depth=max_depth,
        per_host_budget=budget,
        use_bloom=bloom,
        bloom_min_visited=100,
        num_partitions=npart,
        checkpoint_dir=str(tmp_path / f"det_{npart}_{budget}_{bloom}_{max_depth}"),
    )
    res = CrawlEngine(spark, corpus, cfg).run(seeds)
    visited = {
        (r["sitemap_id"], r["url"], r["depth"], r["round"])
        for r in res.visited.collect()
    }
    edges = {
        (r["sitemap_id"], r["src"], r["dst"]) for r in res.edges.collect()
    }
    return visited, edges


def test_partitioning_invariance(spark, synth_path, tmp_path):
    a = crawl_state(spark, synth_path, tmp_path, npart=2, budget=None, bloom=False)
    b = crawl_state(spark, synth_path, tmp_path, npart=16, budget=None, bloom=False)
    assert a == b


def test_bloom_is_advisory_only(spark, synth_path, tmp_path):
    a = crawl_state(spark, synth_path, tmp_path, npart=8, budget=None, bloom=False)
    c = crawl_state(spark, synth_path, tmp_path, npart=8, budget=None, bloom=True)
    assert a == c  # bloom pre-filter must have zero effect on results


def test_politeness_preserves_coverage_when_depth_unbinding(spark, synth_path, tmp_path):
    """Budgeted crawls defer URLs to later rounds; like the reference's
    limited engine (`crawler_test.go:40-45` runs all engines only on a
    site of diameter < maxDepth), the visited SET and edges are
    identical whenever the depth limit doesn't bind; depth/round
    assignment may legitimately differ."""
    a = crawl_state(
        spark, synth_path, tmp_path, npart=8, budget=None, bloom=False, max_depth=40
    )
    b = crawl_state(
        spark, synth_path, tmp_path, npart=8, budget=150, bloom=False, max_depth=40
    )
    assert {(s, u) for s, u, d, r in a[0]} == {(s, u) for s, u, d, r in b[0]}
    assert a[1] == b[1]
