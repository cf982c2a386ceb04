"""Physical-plan assertions: the optimizations we rely on must actually
appear in the executed plan, not be hoped for (predicate pushdown,
broadcast joins, column pruning keeping the image payload out of the
crawl path)."""

import pytest
from pyspark.sql import functions as F

from sitemapper_spark.plans import (
    assert_broadcast_join,
    plan_text,
    scan_read_schema,
)


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_filter_pushdown_reaches_parquet_scan(spark, sf):
    df = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter(F.col("o_totalprice") < 1000.0)
        .select("o_orderkey")
    )
    text = plan_text(df)
    assert "PushedFilters" in text
    assert "o_totalprice" in text.split("PushedFilters", 1)[1][:200]


def test_column_pruning_projects_scan(spark, sf):
    df = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey")
    cols = scan_read_schema(df)
    assert cols == ["l_orderkey"]


def test_small_dim_join_goes_broadcast(spark, sf):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    assert_broadcast_join(joined)


def test_crawl_fetch_path_never_reads_image_bytes(spark, tmp_path):
    """The corpus 'bytes' column must be pruned out of every scan in the
    crawl path (SURVEY §7 hard parts: keep payload out of shuffles)."""
    from sitemapper_spark import corpus as cm
    from sitemapper_spark.engine import CrawlConfig, CrawlEngine

    path = str(tmp_path / "pages")
    cm.testsite_corpus(spark).write.parquet(path)
    corpus = spark.read.parquet(path)
    engine = CrawlEngine(spark, corpus, CrawlConfig(max_depth=2))
    # fetch_side is the only projection of the corpus the round loop uses
    cols = scan_read_schema(engine.fetch_side)
    assert "bytes" not in cols
    assert set(cols) <= {"url", "status", "final_url", "out_links", "html"}


def test_anti_join_strategy_present(spark, sf):
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    anti = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    text = plan_text(anti)
    assert "LeftAnti" in text
