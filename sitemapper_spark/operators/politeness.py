"""Per-host politeness: deterministic priority dequeue with carry-over.

The reference throttles with a token semaphore + randomized backoff
(`limiter.go:32-42`, `crawler.go:144-162`; distributed analog: k8s
quota + random re-flight sleep, `crawlmanager.go:84-89`). Randomized
retry is banned here (reproducibility), so the same admission control
becomes a deterministic operator: rank frontier rows per
(sitemap_id, host) by (priority desc, url asc) and dequeue the top
``budget``; the remainder carries over to the next round — the exact
deterministic analog of "blocked task retries later".

Skew (the Zipf-head host): a single window over (sitemap_id, host)
would sort ALL of a hot host's frontier rows in one task. The dequeue
is therefore **two-phase top-k**, reusing the frontier's storage salt:

1. pre-rank per ``(sitemap_id, host, salt)`` and keep ``budget`` rows
   per salt bucket — each task sees at most one salt bucket of one
   host, so no task ever sorts more than ~1/salt_buckets of a hot
   host's rows;
2. re-rank the ≤ ``salt_buckets × budget`` survivors per
   ``(sitemap_id, host)`` and keep the global per-host top ``budget``.

Any row in the global per-host top-``budget`` has within-salt rank ≤
its per-host rank ≤ budget, so it always survives phase 1 — the
two-phase result is EXACTLY the single-window result, at any salting
(salt=0 everywhere degrades to the single-window plan). Ordering uses
only stable row keys (never task or arrival order) so the dequeue is
identical at any parallelism.
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

    _ORDER = (F.desc("priority"), F.asc("url"))
    if robots is not None:
        budgets = robots.select(
            F.col("host").alias("_bhost"),
            F.col("max_fetches_per_round").alias("_budget"),
        )
        frontier = frontier.join(
            F.broadcast(budgets), frontier["host"] == budgets["_bhost"], "left"
        ).drop("_bhost")
        eff = F.coalesce(F.col("_budget"), F.lit(default_budget))
    else:
        frontier = frontier.withColumn("_budget", F.lit(None).cast("int"))
        eff = F.lit(default_budget)

    # phase 1: bounded pre-top-k per salt bucket (hot hosts are salted
    # by the engine, so no single task sorts a whole hot host)
    w1 = Window.partitionBy("sitemap_id", "host", "salt").orderBy(*_ORDER)
    r1 = frontier.withColumn("_rank", F.row_number().over(w1))
    adm1 = F.when(eff.isNull(), F.lit(True)).otherwise(F.col("_rank") <= eff)
    carry_1 = r1.filter(~adm1).drop("_rank", "_budget")
    survivors = r1.filter(adm1).drop("_rank")

    # phase 2: exact per-host top-k over the bounded survivor set
    w2 = Window.partitionBy("sitemap_id", "host").orderBy(*_ORDER)
    r2 = survivors.withColumn("_rank", F.row_number().over(w2))
    adm2 = F.when(eff.isNull(), F.lit(True)).otherwise(F.col("_rank") <= eff)
    dequeued = r2.filter(adm2).drop("_rank", "_budget")
    carry = carry_1.unionByName(r2.filter(~adm2).drop("_rank", "_budget"))
    return dequeued, carry
