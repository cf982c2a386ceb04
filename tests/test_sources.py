"""Corpus IO: parquet fallback + bucketed-table path round-trip."""

from sitemapper_spark import corpus as cm
from sitemapper_spark.sources import load_corpus, write_corpus


def test_parquet_roundtrip(spark, tmp_path):
    df = cm.testsite_corpus(spark)
    ref = write_corpus(df, str(tmp_path / "pages_pq"))
    back = load_corpus(spark, ref)
    assert back.count() == 7
    assert set(back.columns) == set(df.columns)


def test_bucketed_table_roundtrip(spark, tmp_path):
    df = cm.testsite_corpus(spark)
    ref = write_corpus(df, str(tmp_path / "pages_bkt"), bucket_by_url=4)
    back = load_corpus(spark, ref)
    assert back.count() == 7
    # bucketed layout: multiple part files per the bucket spec
    spark.sql(f"DROP TABLE IF EXISTS {ref.split(':', 1)[1]}")
