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
    sql = qlib.all_oracles()
    sql["crawl_bfs_adjacency"] = _SQL_CRAWL_BFS_ADJACENCY
    return sql


def _crawl_bfs_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full crawl engine (BFS fixpoint, visited anti-join, adjacency
    aggregation) over the documents-derived page graph, ORACLED: the
    graph uses the SQL-expressible modular link rule so a DuckDB
    recursive CTE reproduces the exact visited set (every URL at its
    minimal depth < max_depth, `crawler.go:93` gate) and per-src sorted
    link sets. Golden parity vs the reference fixture is separately
    covered by tests/test_engine_golden.py."""
    corpus = corpus_from_documents(spark, sf_dir, n_hosts=5, link_rule="modular")
    cfg = CrawlConfig(
        max_depth=2,
        per_host_budget=None,
        use_bloom=False,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), "smk_q_ckpt"),
    )
    engine = CrawlEngine(spark, corpus, cfg)
    result = engine.run([("http://docs0.example.com/d/0.html", "q", 2, 0.0)])
    return result.adjacency().select(
        "src", F.size("links").alias("n_links"),
        F.array_join("links", ",").alias("links_csv"),
    )


# The BFS fixpoint as a bounded-depth recursive CTE over the SAME
# deterministic page graph (modular link rule of corpus_from_documents:
# host = doc_id % 5, targets = hidx + 5 * ((doc_id*37 + j*101 + 13) %
# n_on_host) for j in 0..3; the seed's host is docs0 and the graph is
# host-closed, so only host-0 docs participate). Visited = minimal
# depth < max_depth (= 2); adjacency = sorted distinct out-links of
# every visited URL, zero-link pages kept with '' (crawler.go:173).
_SQL_CRAWL_BFS_ADJACENCY = """
WITH RECURSIVE
nd AS (SELECT count(*) AS n FROM documents),
noh AS (SELECT (n + 4) // 5 AS m FROM nd),
edges AS (
  SELECT DISTINCT d.doc_id AS src_id,
         5 * ((d.doc_id * 37 + j.j * 101 + 13) % noh.m) AS dst_id
  FROM documents d, (SELECT unnest(range(0, 4)) AS j) j, noh
  WHERE d.doc_id % 5 = 0
),
bfs(id, depth) AS (
  SELECT 0, 0
  UNION
  SELECT e.dst_id, b.depth + 1
  FROM bfs b JOIN edges e ON e.src_id = b.id
  WHERE b.depth + 1 < 2
),
visited AS (SELECT DISTINCT id FROM bfs),
adj AS (
  SELECT v.id AS src_id,
         list_sort(list(DISTINCT
           'http://docs0.example.com/d/' || e.dst_id || '.html')) AS links
  FROM visited v JOIN edges e ON e.src_id = v.id
  GROUP BY v.id
)
SELECT 'http://docs0.example.com/d/' || v.id || '.html' AS src,
       coalesce(len(a.links), 0) AS n_links,
       coalesce(array_to_string(a.links, ','), '') AS links_csv
FROM visited v LEFT JOIN adj a ON a.src_id = v.id
"""
