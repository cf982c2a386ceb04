"""Continuous crawl mode — Structured Streaming front-end (SURVEY §7).

The reference crawl is a terminating fixpoint, so the core engine is
batch-iterative; this module adds the optional always-on mode the
distributed variant gestures at (NATS subscription loop,
`crawlmanager.go:150-214`): seeds arrive as files in a watched
directory (the NATS `start` subject analog), each micro-batch drives
the batch engine via ``foreachBatch``, and results accumulate under one
output root. Exactly-once per seed batch comes from the streaming
checkpoint + the engine's own round manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..engine import CrawlConfig, CrawlEngine
from ..schemas import SEEDS_SCHEMA


class ContinuousCrawl:
    """File-source streaming seed intake → per-batch crawl runs."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        seeds_dir: str,
        output_dir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.corpus = corpus
        self.seeds_dir = seeds_dir
        self.output_dir = output_dir
        self.config = config or CrawlConfig(max_depth=2)
        os.makedirs(seeds_dir, exist_ok=True)
        os.makedirs(output_dir, exist_ok=True)

    def _process_batch(self, seeds_batch: DataFrame, epoch_id: int) -> None:
        if seeds_batch.isEmpty():
            return
        cfg = CrawlConfig(
            **{
                **self.config.__dict__,
                "checkpoint_dir": os.path.join(
                    self.output_dir, f"epoch={epoch_id:06d}", "ckpt"
                ),
            }
        )
        engine = CrawlEngine(self.spark, self.corpus, cfg)
        result = engine.run(seeds_batch)
        result.adjacency().write.mode("overwrite").parquet(
            os.path.join(self.output_dir, f"epoch={epoch_id:06d}", "adjacency")
        )

    def start(self, trigger_once: bool = True):
        """Start the stream; ``trigger_once`` drains pending seed files
        and stops (test/cron mode), otherwise runs continuously."""
        stream = (
            self.spark.readStream.schema(SEEDS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .json(self.seeds_dir)
        )
        writer = stream.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", os.path.join(self.output_dir, "_stream_ckpt")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
