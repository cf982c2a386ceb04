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


def test_stateful_politeness_admission_across_microbatches(spark, tmp_path):
    """applyInPandasWithState politeness: per-host admitted counts live
    in the streaming state store, so a host exhausted in micro-batch 1
    admits nothing in micro-batch 2 — the cross-batch semantics
    foreachBatch alone cannot provide."""
    import json as _json

    from sitemapper_spark.streaming.politeness_stream import (
        politeness_admission_stream,
    )

    in_dir = tmp_path / "frontier_in"
    out_dir = tmp_path / "admission_out"
    ck_dir = tmp_path / "stream_ck"
    in_dir.mkdir()

    # batch 1: 4 urls for hostA (budget 3 -> admit top-3 by priority),
    #          1 url for hostB
    b1 = [
        {"sitemap_id": "s", "host": "a.com", "url": f"http://a.com/{i}",
         "priority": float(i)} for i in range(4)
    ] + [{"sitemap_id": "s", "host": "b.com", "url": "http://b.com/0",
          "priority": 0.0}]
    # batch 2: 2 more for hostA (0 room left), 1 more for hostB (room 2)
    b2 = [
        {"sitemap_id": "s", "host": "a.com", "url": f"http://a.com/x{i}",
         "priority": 99.0} for i in range(2)
    ] + [{"sitemap_id": "s", "host": "b.com", "url": "http://b.com/1",
          "priority": 1.0}]
    for i, (name, rows) in enumerate((("b1.json", b1), ("b2.json", b2))):
        p = in_dir / name
        with open(p, "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows))
        # distinct mtimes pin the micro-batch order (file source sorts
        # by modification time; same-ns writes would merge the batches)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))

    stream = (
        spark.readStream.schema(
            "sitemap_id string, host string, url string, priority double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = (
        politeness_admission_stream(stream, per_host_lifetime_budget=3)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(out_dir)).collect()
    admitted = sorted(r["url"] for r in out if r["admitted"])
    rejected = sorted(r["url"] for r in out if not r["admitted"])
    # hostA: top-3 of batch1 by priority desc (3,2,1); batch-2 rows are
    # rejected DESPITE priority 99 — the budget was spent in batch 1
    assert admitted == [
        "http://a.com/1", "http://a.com/2", "http://a.com/3",
        "http://b.com/0", "http://b.com/1",
    ]
    assert rejected == ["http://a.com/0", "http://a.com/x0", "http://a.com/x1"]
    # per-host totals never exceed the budget
    for r in out:
        assert r["host_admitted_total"] <= 3
