"""Hot-host salting: a Zipf-skewed frontier gets salt buckets for hosts
above the heat threshold, results stay identical (north_rule: explicit
salting for skewed domains)."""

from pyspark.sql import functions as F

from sitemapper_spark import corpus as cm
from sitemapper_spark.engine import CrawlConfig, CrawlEngine


def _crawl(spark, corpus_path, tmp_path, threshold, tag):
    corpus = spark.read.parquet(corpus_path)
    seeds = [
        (r["url"], f"s-{r['host']}", 6, 0.0)
        for r in corpus.groupBy("host").agg(F.min("url").alias("url")).collect()
    ]
    cfg = CrawlConfig(
        max_depth=6,
        use_bloom=False,
        num_partitions=8,
        hot_host_threshold=threshold,
        salt_buckets=4,
        checkpoint_dir=str(tmp_path / f"salt_{tag}"),
    )
    return CrawlEngine(spark, corpus, cfg).run(seeds)


def test_salting_spreads_hot_host_and_preserves_results(
    spark, tmp_path, tmp_path_factory
):
    p = str(tmp_path_factory.mktemp("saltc") / "pages")
    # log-uniform host sizes: host share is heavily skewed (FIXTURES §1)
    cm.synth_corpus(
        spark, n_pages=4000, n_hosts=4, links_per_page=6, with_images=False
    ).write.parquet(p)

    salted = _crawl(spark, p, tmp_path, threshold=50, tag="on")
    plain = _crawl(spark, p, tmp_path, threshold=None, tag="off")

    # identical crawl output with and without salting
    key = lambda res: (
        {(r["sitemap_id"], r["url"], r["depth"]) for r in res.visited.collect()},
        {(r["sitemap_id"], r["src"], r["dst"]) for r in res.edges.collect()},
    )
    assert key(salted) == key(plain)

    # the hot host's frontier rows actually received multiple salts
    import os

    rounds = sorted(
        d for d in os.listdir(salted.checkpoint_dir) if d.startswith("round=")
    )
    salts = set()
    for rd in rounds:
        fpath = os.path.join(salted.checkpoint_dir, rd, "frontier_next")
        if os.path.isdir(fpath):
            for r in (
                spark.read.parquet(fpath).select("salt").distinct().collect()
            ):
                salts.add(r["salt"])
    assert len(salts) > 1, "hot host never salted"
