"""Continuous-mode politeness: stateful per-host admission control over
a frontier *stream* (SURVEY §7 / round-1 verdict stretch item).

The batch engine enforces politeness per round with a window top-k +
carry-over (`operators/politeness.py`). In continuous mode there are no
rounds — frontier rows arrive as an unbounded stream (the NATS `crawl`
subject analog, `sitemapper/internal/nats.go:14-19`) — so the budget
must be enforced against *state that persists across micro-batches*:
the reference's token semaphore (`limiter.go:32-42`) generalized to one
counter per (sitemap_id, host) group, held in Spark's streaming state
store.

``applyInPandasWithState`` gives exactly that shape: rows are grouped
by host, each trigger the group's Arrow batch arrives in one vectorized
call together with the group's `GroupState`, and the admitted count
written back survives to the next trigger. Admission within a batch is
deterministic: rows sort by (priority desc, url asc) — the same stable
order as the batch dequeue — and the first `budget - admitted_so_far`
are admitted; the rest are emitted with ``admitted = false`` (the
streaming analog of the batch engine's carry-over, left to the caller
to re-enqueue or drop, mirroring the reference's immediate-error
``RunFunc`` contract rather than its random-sleep retry).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["politeness_admission_stream", "ADMISSION_SCHEMA"]

ADMISSION_SCHEMA = StructType(
    [
        StructField("sitemap_id", StringType()),
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("priority", DoubleType()),
        StructField("admitted", BooleanType()),
        StructField("host_admitted_total", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("admitted", LongType())])


def politeness_admission_stream(
    frontier_stream: DataFrame, per_host_budget: int
) -> DataFrame:
    """Admit at most ``per_host_budget`` URLs per (sitemap_id, host)
    over the stream's lifetime, highest priority first within each
    trigger; state persists across micro-batches via the state store.

    Input stream schema must contain (sitemap_id, host, url, priority).
    Returns the admission stream in ``ADMISSION_SCHEMA`` shape.
    """

    def admit(
        key: Tuple[str, str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (admitted_so_far,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic admission order — stable row keys only, never
        # arrival order (matches operators/politeness._ORDER)
        batch = batch.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        room = max(0, per_host_budget - admitted_so_far)
        n = len(batch)
        admitted_flags = pd.Series([True] * min(room, n) + [False] * max(0, n - room))
        admitted_so_far += int(admitted_flags.sum())
        state.update((admitted_so_far,))
        yield pd.DataFrame(
            {
                "sitemap_id": batch["sitemap_id"],
                "host": batch["host"],
                "url": batch["url"],
                "priority": batch["priority"],
                "admitted": admitted_flags,
                "host_admitted_total": admitted_so_far,
            }
        )

    return (
        frontier_stream.groupBy("sitemap_id", "host")
        .applyInPandasWithState(
            admit,
            outputStructType=ADMISSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
