"""Per-host politeness: deterministic priority dequeue with carry-over.

The reference throttles with a token semaphore + randomized backoff
(`limiter.go:32-42`, `crawler.go:144-162`; distributed analog: k8s
quota + random re-flight sleep, `crawlmanager.go:84-89`). Randomized
retry is banned here (reproducibility), so the same admission control
becomes a deterministic operator: rank frontier rows per
(sitemap_id, host) by (priority desc, url asc) and dequeue the top
``budget``; the remainder carries over to the next round — the exact
deterministic analog of "blocked task retries later".

The rank window shuffles by (sitemap_id, host) — the same key the
frontier is stored/salted by, so at scale AQE sees an already
co-partitioned exchange. Ordering uses only stable row keys (never task
or arrival order) so the dequeue is identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dequeue_per_host"]


def dequeue_per_host(
    frontier: DataFrame,
    default_budget: int | None,
    robots: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (dequeued, carry_over) under per-host budgets.

    ``robots`` may carry a per-host ``max_fetches_per_round`` override
    (FIXTURES.md §4); null/absent budget means unlimited — with no
    budget anywhere the split is (frontier, empty) without a shuffle.
    """
    if default_budget is None and robots is None:
        return frontier, frontier.limit(0)

    w = Window.partitionBy("sitemap_id", "host").orderBy(
        F.desc("priority"), F.asc("url")
    )
    ranked = frontier.withColumn("_rank", F.row_number().over(w))

    if robots is not None:
        budgets = robots.select(
            F.col("host").alias("_bhost"),
            F.col("max_fetches_per_round").alias("_budget"),
        )
        ranked = ranked.join(
            F.broadcast(budgets), ranked["host"] == budgets["_bhost"], "left"
        ).drop("_bhost")
        eff = F.coalesce(F.col("_budget"), F.lit(default_budget))
    else:
        ranked = ranked.withColumn("_budget", F.lit(None).cast("int"))
        eff = F.lit(default_budget)

    admitted = F.when(eff.isNull(), F.lit(True)).otherwise(F.col("_rank") <= eff)
    dequeued = ranked.filter(admitted).drop("_rank", "_budget")
    carry = ranked.filter(~admitted).drop("_rank", "_budget")
    return dequeued, carry
