"""Plan-inspection helpers: capture ``explain`` output so tests can
assert physical-plan properties (pushdown, broadcast, column pruning)
instead of hoping for them."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    text = plan_text(df)
    assert "PushedFilters" in text and fragment in text, text


def assert_broadcast_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text, text


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names appearing in any parquet scan ReadSchema lines."""
    cols: list[str] = []
    for line in plan_text(df).splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(
                c.split(":")[0].strip() for c in inside.split(",") if ":" in c
            )
    return cols
