"""Text-analysis column functions over the documents table."""

import pytest
from pyspark.sql import functions as F

from sitemapper_spark.functions import text as X

ROWS = [
    (0, "The cat and the dog sat in the house of the king. The end."),
    (1, "el perro y el gato de la casa en los campos del rey"),
    (2, "le chat et le chien de la maison en les champs du roi"),
    (3, "x" * 10),
    (4, "word " * 150),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_count(docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", X.token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    assert got[0] == len(ROWS[0][1].split())
    assert got[3] == 1
    assert got[4] == 150


def test_lang_id(docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", X.lang_id_col(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "fr"
    assert got[3] == "other"


def test_quality_score_ranges(docs):
    got = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", X.quality_score_col(F.col("text")).alias("q")
        ).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[0] > got[3]  # prose beats junk


def test_fingerprint_order_insensitive_stability(docs, spark):
    fp = docs.select("doc_id", X.fingerprint_col(F.col("text")).alias("fp"))
    a = {r["doc_id"]: r["fp"] for r in fp.collect()}
    b = {r["doc_id"]: r["fp"] for r in fp.collect()}
    assert a == b
    assert len(set(a.values())) == len(a)  # distinct docs → distinct prints
    # identical content → identical fingerprint
    dup = spark.createDataFrame(
        [(10, ROWS[0][1]), (11, ROWS[0][1])], "doc_id long, text string"
    ).select("doc_id", X.fingerprint_col(F.col("text")).alias("fp"))
    vals = [r["fp"] for r in dup.collect()]
    assert vals[0] == vals[1]
