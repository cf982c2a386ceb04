"""Continuous crawl mode: streaming seed intake drives batch crawl
epochs via foreachBatch, exactly once per seed file."""

import json
import os

from pyspark.sql import functions as F

from sitemapper_spark import corpus as cm
from sitemapper_spark.engine import CrawlConfig
from sitemapper_spark.streaming.continuous import ContinuousCrawl

ROOT = cm.testsite_root()


def test_streaming_seed_intake(spark, tmp_path):
    corpus = cm.testsite_corpus(spark)
    seeds_dir = str(tmp_path / "seeds_in")
    out_dir = str(tmp_path / "stream_out")
    os.makedirs(seeds_dir)
    with open(os.path.join(seeds_dir, "batch0.json"), "w") as f:
        f.write(
            json.dumps(
                {"url": ROOT, "sitemap_id": "s0", "max_depth": 2, "priority": 0.0}
            )
        )

    cc = ContinuousCrawl(
        spark, corpus, seeds_dir, out_dir,
        CrawlConfig(max_depth=2, use_bloom=False, num_partitions=4),
    )
    q = cc.start(trigger_once=True)
    q.awaitTermination(300)

    epochs = [d for d in os.listdir(out_dir) if d.startswith("epoch=")]
    assert len(epochs) == 1
    adj = spark.read.parquet(os.path.join(out_dir, epochs[0], "adjacency"))
    rows = {r["src"]: list(r["links"]) for r in adj.collect()}
    assert ROOT in rows and len(rows) == 4  # root + its 3 links at depth 2

    # a second trigger-once run with no new seed files processes nothing
    q2 = ContinuousCrawl(
        spark, corpus, seeds_dir, out_dir,
        CrawlConfig(max_depth=2, use_bloom=False, num_partitions=4),
    ).start(trigger_once=True)
    q2.awaitTermination(120)
    assert (
        len([d for d in os.listdir(out_dir) if d.startswith("epoch=")]) == 1
    )
