"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl (documents-derived page graph →
2-round BFS → adjacency); ``queries``/``oracle_sql`` expose every
operator from SURVEY.md §2 relationally plus the training-pipeline
extras, oracle-checked against DuckDB by the driver.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sitemapper_spark import queries as qlib
from sitemapper_spark.corpus import corpus_from_documents
from sitemapper_spark.engine import CrawlConfig, CrawlEngine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the deterministic page graph derived from the
    sf0.001 documents table (5 hosts, one seed each, max_depth=3) and
    return the adjacency with link counts and BFS depths."""
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    corpus = corpus_from_documents(spark, sf_dir, n_hosts=5)
    cfg = CrawlConfig(
        max_depth=3,
        per_host_budget=64,
        use_bloom=False,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), "smk_entry_ckpt"),
    )
    engine = CrawlEngine(spark, corpus, cfg)
    seeds = [
        (f"http://docs{h}.example.com/d/{h}.html", f"seed-{h}", 3, 0.0)
        for h in range(5)
    ]
    result = engine.run(seeds)
    adjacency = result.adjacency()
    visited = result.visited.select("sitemap_id", F.col("url").alias("src"), "depth")
    return (
        adjacency.join(visited, ["sitemap_id", "src"])
        .select(
            "sitemap_id",
            "src",
            F.size("links").alias("n_links"),
            "depth",
            F.array_join("links", ",").alias("links_csv"),
        )
        .orderBy("sitemap_id", "src")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline
    extras). Keys without an ``oracle_sql`` entry are the genuinely
    non-SQL-expressible ops (full crawl, minhash-LSH, multimodal
    decode) — the driver records rows-only checks for those."""
    q = qlib.all_queries()
    q["crawl_bfs_adjacency"] = _crawl_bfs_adjacency
    return q


def oracle_sql() -> dict[str, str]:
    return qlib.all_oracles()


def _crawl_bfs_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full crawl engine over the documents-derived corpus (rows-only:
    the BFS fixpoint is not expressible as one SQL statement; golden
    parity is covered by tests/test_engine_golden.py)."""
    corpus = corpus_from_documents(spark, sf_dir, n_hosts=5)
    cfg = CrawlConfig(
        max_depth=2,
        per_host_budget=64,
        use_bloom=False,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), "smk_q_ckpt"),
    )
    engine = CrawlEngine(spark, corpus, cfg)
    result = engine.run([("http://docs0.example.com/d/0.html", "q", 2, 0.0)])
    return result.adjacency().select(
        "src", F.size("links").alias("n_links"),
        F.array_join("links", ",").alias("links_csv"),
    )
