"""robots.txt gating as a broadcast join + JVM-side prefix predicate.

Engine extension mandated by the north_rule (the reference has no
robots handling). The robots table is tiny relative to the frontier,
so it broadcasts; the prefix test runs entirely in Catalyst
(``exists`` over the disallow array — no Python), and hosts without a
robots row pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_robots_gate"]


def apply_robots_gate(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop candidate URLs matching any disallow prefix for their host."""
    if robots is None:
        return candidates
    rules = robots.select(
        F.col("host").alias("_rhost"),
        F.col("disallow_prefixes").alias("_disallow"),
    )
    joined = candidates.join(
        F.broadcast(rules), candidates["host"] == rules["_rhost"], "left"
    )
    blocked = F.exists(
        F.coalesce(F.col("_disallow"), F.array()),
        lambda p: F.col("url").startswith(p),
    )
    return joined.filter(~blocked).drop("_rhost", "_disallow")
