"""Continuous-mode politeness: stateful per-host admission control over
a frontier *stream* (SURVEY §7 / round-1 verdict stretch item).

The batch engine enforces politeness per round with a window top-k +
carry-over (`operators/politeness.py`). In continuous mode there are no
rounds — frontier rows arrive as an unbounded stream (the NATS `crawl`
subject analog, `sitemapper/internal/nats.go:14-19`) — so admission
must be enforced against *state that persists across micro-batches*
(``applyInPandasWithState``: one vectorized Arrow call per
(sitemap_id, host) group per trigger, with the group's ``GroupState``).

Two explicitly-named budget semantics (they are NOT the same thing as
the batch engine's ``CrawlConfig.per_host_budget``, which is per-ROUND
and re-admits carried rows next round):

* ``per_host_lifetime_budget`` — a hard cap on total admissions per
  (sitemap_id, host) over the stream's lifetime. The counter only ever
  grows; a host that spends it is done. Use for cross-epoch crawl
  quotas (ContinuousCrawl wires this).
* ``max_in_flight_per_host`` — the reference limiter's token-semaphore
  semantics (`limiter.go:32-42`: token taken at dispatch, returned on
  completion), generalized per host. Requires completion feedback:
  rows where ``completion_col`` is true return a token (they are state
  updates, not requests, and produce no output rows); request rows are
  admitted while in-flight < budget. Budgets recover, so a host is
  throttled, never starved.

Both default to None = unlimited (matching the engine's documented
'unlimited' value — admission is a no-op pass-through, no state
arithmetic, no crash). Admission within a batch is deterministic:
rows sort by (priority desc, url asc) — the same stable order as the
batch dequeue.
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

# (total admitted ever, currently in flight)
_STATE_SCHEMA = StructType(
    [StructField("admitted", LongType()), StructField("in_flight", LongType())]
)


def politeness_admission_stream(
    frontier_stream: DataFrame,
    per_host_lifetime_budget: int | None = None,
    max_in_flight_per_host: int | None = None,
    completion_col: str | None = None,
    key_cols: tuple[str, ...] = ("sitemap_id", "host"),
) -> DataFrame:
    """Stateful per-``key_cols`` admission over a frontier stream.

    Exactly one of the two budgets may be set (see module docstring for
    their distinct semantics); both None admits everything while still
    tracking per-host totals. Input stream schema must contain
    (sitemap_id, host, url, priority) plus ``completion_col`` (boolean)
    when ``max_in_flight_per_host`` is used. Returns the admission
    stream in ``ADMISSION_SCHEMA`` shape.

    ``key_cols`` picks the budget granularity: the default matches the
    batch engine's (sitemap_id, host) keying; ``("host",)`` makes the
    budget a true per-server cap shared across sitemaps (what
    ContinuousCrawl uses — a web server doesn't care which crawl job
    the requests belong to). Non-key columns ride along unchanged.
    """
    if per_host_lifetime_budget is not None and max_in_flight_per_host is not None:
        raise ValueError(
            "set per_host_lifetime_budget OR max_in_flight_per_host, not both"
        )
    if max_in_flight_per_host is not None and completion_col is None:
        raise ValueError(
            "max_in_flight_per_host needs completion feedback: pass "
            "completion_col (boolean column marking token-return rows)"
        )

    def admit(
        key: Tuple[str, str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        admitted_so_far, in_flight = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if completion_col is not None:
            done = batch[completion_col].fillna(False).astype(bool)
            in_flight = max(0, in_flight - int(done.sum()))
            batch = batch[~done]
        # deterministic admission order — stable row keys only, never
        # arrival order (matches operators/politeness._ORDER)
        batch = batch.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        n = len(batch)
        if per_host_lifetime_budget is not None:
            room = max(0, per_host_lifetime_budget - admitted_so_far)
        elif max_in_flight_per_host is not None:
            room = max(0, max_in_flight_per_host - in_flight)
        else:
            room = n  # unlimited: admit everything
        n_adm = min(room, n)
        admitted_flags = pd.Series([True] * n_adm + [False] * (n - n_adm))
        admitted_so_far += n_adm
        in_flight += n_adm
        state.update((admitted_so_far, in_flight))
        if n == 0:  # pure-completion batch: state updated, nothing emitted
            return
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

    cols = ["sitemap_id", "host", "url", "priority"]
    if completion_col is not None:
        cols.append(completion_col)
    return (
        frontier_stream.select(*cols)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            admit,
            outputStructType=ADMISSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
