"""Corpus IO: Iceberg-first with parquet fallback, bucketed-table path
for shuffle-free fetch joins.

At 100 TB the corpus table should be:

* **Iceberg**, partitioned by ``bucket(N, url)`` so every round's
  fetch-join prunes + co-locates (the engine joins on ``url``);
* or a Spark **bucketed table** (``bucketBy(N, "url")``), which gives
  Catalyst a known output partitioning — the fetch join then shuffles
  only the (small) frontier side.

The container has no Iceberg runtime jars, so ``write_corpus`` tries
Iceberg and falls back to plain/bucketed parquet with the same layout;
everything is format-agnostic downstream (the engine only sees a
DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_corpus(
    df: DataFrame,
    path_or_table: str,
    bucket_by_url: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Write the pages corpus; returns how to load it back.

    ``bucket_by_url=N`` uses a saveAsTable bucketed layout (co-located
    fetch joins); otherwise a plain parquet directory.
    """
    spark = df.sparkSession
    if iceberg_available(spark) and not path_or_table.startswith("/"):
        df.writeTo(path_or_table).using("iceberg").createOrReplace()
        return f"table:{path_or_table}"
    if bucket_by_url:
        name = "".join(
            c if c.isalnum() else "_" for c in path_or_table.strip("/")
        )
        (
            df.write.mode(mode)
            .bucketBy(bucket_by_url, "url")
            .sortBy("url")
            .option("path", path_or_table)
            .saveAsTable(name)
        )
        return f"table:{name}"
    df.write.mode(mode).parquet(path_or_table)
    return f"path:{path_or_table}"


def load_corpus(spark: SparkSession, ref: str) -> DataFrame:
    """Load a corpus written by :func:`write_corpus` (``table:``/
    ``path:`` refs, or a bare filesystem path)."""
    if ref.startswith("table:"):
        return spark.table(ref[len("table:"):])
    if ref.startswith("path:"):
        return spark.read.parquet(ref[len("path:"):])
    return spark.read.parquet(ref)
