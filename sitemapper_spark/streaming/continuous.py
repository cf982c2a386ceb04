"""Continuous crawl mode — Structured Streaming front-end (SURVEY §7).

The reference crawl is a terminating fixpoint, so the core engine is
batch-iterative; this module adds the optional always-on mode the
distributed variant gestures at (NATS subscription loop,
`crawlmanager.go:150-214`): seeds arrive as files in a watched
directory (the NATS `start` subject analog), each micro-batch drives
the batch engine via ``foreachBatch``, and results accumulate under one
output root. Exactly-once per seed batch comes from the streaming
checkpoint + the engine's own round manifests.

Cross-epoch politeness (round-2 verdict item 4): with
``per_host_lifetime_budget`` set, the seed stream is routed through the
stateful admission operator
(:func:`..streaming.politeness_stream.politeness_admission_stream`)
BEFORE the crawl, in the same streaming query — the per-host admitted
counters live in Spark's state store, so a host that exhausts its
budget in epoch 1 admits nothing in epoch 2, which per-epoch
``CrawlConfig.per_host_budget`` (a per-ROUND budget, reset every round
of every epoch) cannot express. Rejected seeds are written as
seed-file-formatted JSON under ``output_dir/rejected/`` so an operator
can re-submit them after raising the budget (auto-re-enqueueing into
``seeds_dir`` would spin forever against a lifetime cap). In budgeted
mode each admitted seed crawls at ``config.max_depth`` (the admission
schema carries scheduling columns only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import _HOST_RE, CrawlConfig, CrawlEngine
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
        per_host_lifetime_budget: int | None = None,
    ):
        self.spark = spark
        self.corpus = corpus
        self.seeds_dir = seeds_dir
        self.output_dir = output_dir
        self.config = config or CrawlConfig(max_depth=2)
        self.per_host_lifetime_budget = per_host_lifetime_budget
        os.makedirs(seeds_dir, exist_ok=True)
        os.makedirs(output_dir, exist_ok=True)

    def _crawl(self, seeds_batch: DataFrame, epoch_id: int) -> None:
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

    def _process_batch(self, seeds_batch: DataFrame, epoch_id: int) -> None:
        if seeds_batch.isEmpty():
            return
        self._crawl(seeds_batch, epoch_id)

    def _process_admitted_batch(self, admission: DataFrame, epoch_id: int) -> None:
        """Budgeted path: the batch is the admission operator's output —
        crawl the admitted rows, park the rejected ones.

        The batch is persisted for the duration: it is consumed by
        multiple actions (emptiness probes, the rejected write, the
        crawl), and an un-persisted stateful-admission plan would
        re-execute ``applyInPandasWithState`` — re-committing its state
        store — once per action. Rejected seeds go to an
        ``epoch=<id>``-keyed subdirectory with overwrite mode so a
        retried epoch (foreachBatch is at-least-once) rewrites rather
        than duplicates its rows."""
        admission = admission.persist()
        try:
            if admission.isEmpty():
                return
            rejected = admission.filter(~F.col("admitted")).select(
                "url",
                "sitemap_id",
                F.lit(self.config.max_depth).alias("max_depth"),
                "priority",
            )
            if not rejected.isEmpty():
                rejected.write.mode("overwrite").json(
                    os.path.join(
                        self.output_dir, "rejected", f"epoch={epoch_id:06d}"
                    )
                )
            admitted = admission.filter(F.col("admitted")).select(
                "url",
                "sitemap_id",
                F.lit(self.config.max_depth).alias("max_depth"),
                "priority",
            )
            if admitted.isEmpty():
                return
            self._crawl(admitted, epoch_id)
        finally:
            admission.unpersist()

    def start(self, trigger_once: bool = True):
        """Start the stream; ``trigger_once`` drains pending seed files
        and stops (test/cron mode), otherwise runs continuously."""
        stream = (
            self.spark.readStream.schema(SEEDS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .json(self.seeds_dir)
        )
        if self.per_host_lifetime_budget is not None:
            from .politeness_stream import politeness_admission_stream

            frontier = stream.select(
                "sitemap_id",
                F.regexp_extract(F.lower(F.col("url")), _HOST_RE, 1).alias(
                    "host"
                ),
                "url",
                "priority",
            )
            stream = politeness_admission_stream(
                frontier,
                per_host_lifetime_budget=self.per_host_lifetime_budget,
                key_cols=("host",),  # true per-server cap across sitemaps
            )
            batch_fn = self._process_admitted_batch
        else:
            batch_fn = self._process_batch
        writer = stream.writeStream.foreachBatch(batch_fn).option(
            "checkpointLocation", os.path.join(self.output_dir, "_stream_ckpt")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
