"""robots.txt gating + per-host budget overrides inside the engine
(engine extension per north_rule; FIXTURES.md §4)."""

import pytest

from sitemapper_spark import corpus as cm
from sitemapper_spark.engine import CrawlConfig, CrawlEngine
from sitemapper_spark.schemas import ROBOTS_SCHEMA

ROOT = cm.testsite_root()


@pytest.fixture()
def robots_df(spark):
    return spark.createDataFrame(
        [("localhost:2015", ["http://localhost:2015/aubergine"], None)],
        ROBOTS_SCHEMA,
    )


def test_disallow_prefix_blocks_subtree(spark, tmp_path, robots_df):
    corpus = cm.testsite_corpus(spark)
    cfg = CrawlConfig(
        max_depth=5, use_bloom=False, num_partitions=4,
        checkpoint_dir=str(tmp_path / "robots"),
    )
    engine = CrawlEngine(spark, corpus, cfg, robots=robots_df)
    res = engine.run([(ROOT, "r", 5, 0.0)])
    adj = res.adjacency_dict("r")
    # /aubergine and /aubergine/* are never VISITED (seeds are exempt,
    # like a crawler that only consults robots for discovered links)…
    assert f"{ROOT}/aubergine" not in adj
    assert f"{ROOT}/aubergine/lemon.html" not in adj
    # …but links TO them are still recorded on visited pages
    assert f"{ROOT}/aubergine" in adj[ROOT]
    # the rest of the site is reached via non-blocked paths
    assert f"{ROOT}/tomato.html" in adj
    assert f"{ROOT}/biscuit/pomegranate.html" in adj


def test_budget_override_from_robots(spark, tmp_path):
    robots = spark.createDataFrame(
        [("localhost:2015", [], 1)], ROBOTS_SCHEMA
    )
    corpus = cm.testsite_corpus(spark)
    cfg = CrawlConfig(
        max_depth=5, per_host_budget=None, use_bloom=False, num_partitions=4,
        checkpoint_dir=str(tmp_path / "budget"),
    )
    engine = CrawlEngine(spark, corpus, cfg, robots=robots)
    res = engine.run([(ROOT, "r", 5, 0.0)])
    # per-round lineage: never more than 1 URL dequeued for the host
    assert all(
        r["urls_dequeued"] <= 1 for r in res.lineage.collect()
    )
    # crawl still completes the whole site (deferred, not dropped)
    assert len(res.adjacency_dict("r")) == 7
