"""Round-2 features: two-phase salted politeness dequeue, sharded
bloom seen-filter, LSH hot-bucket guard, custom priority functions,
broadcast-fetch threshold fallback, seed-root collapse, and the
caption invariant on the documents-derived corpus."""

import itertools

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sitemapper_spark import corpus as cm
from sitemapper_spark.engine import CrawlConfig, CrawlEngine
from sitemapper_spark.operators import dedup_ops as D
from sitemapper_spark.operators.politeness import dequeue_per_host

FRONTIER_COLS = "sitemap_id string, host string, salt int, priority double, url string"


def _mk_frontier(spark, n_hot=400, n_cold=10, n_salts=4):
    rows = [
        ("s", "hot.example.com", i % n_salts, float(i % 7),
         f"http://hot.example.com/{i:05d}")
        for i in range(n_hot)
    ] + [
        ("s", "cold.example.com", 0, float(i), f"http://cold.example.com/{i:05d}")
        for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, FRONTIER_COLS), rows


class TestTwoPhaseDequeue:
    def test_equals_single_window_topk(self, spark):
        budget = 9
        frontier, rows = _mk_frontier(spark)
        dequeued, carry = dequeue_per_host(frontier, budget)
        got = {(r["host"], r["url"]) for r in dequeued.collect()}

        expected = set()
        for host in {"hot.example.com", "cold.example.com"}:
            hs = sorted(
                (r for r in rows if r[1] == host), key=lambda r: (-r[3], r[4])
            )[:budget]
            expected |= {(r[1], r[4]) for r in hs}
        assert got == expected
        # conservation: dequeued ∪ carry == frontier, disjoint
        assert dequeued.count() + carry.count() == len(rows)
        assert (
            dequeued.select("url").intersect(carry.select("url")).count() == 0
        )

    def test_phase1_bounds_hot_host_fanin(self, spark):
        """No phase-2 task can receive more than salt_buckets × budget
        rows for one host: the phase-1 pre-top-k (per salt bucket)
        provably caps the survivor set."""
        budget, n_salts = 9, 4
        frontier, _ = _mk_frontier(spark, n_hot=4000, n_salts=n_salts)
        # replicate phase 1 exactly (same ordering keys as the operator)
        w1 = Window.partitionBy("sitemap_id", "host", "salt").orderBy(
            F.desc("priority"), F.asc("url")
        )
        survivors = (
            frontier.withColumn("_r", F.row_number().over(w1))
            .filter(F.col("_r") <= budget)
        )
        per_host = {
            r["host"]: r["n"]
            for r in survivors.groupBy("host").agg(F.count("*").alias("n")).collect()
        }
        assert per_host["hot.example.com"] <= n_salts * budget
        # and the operator's dequeue output is a subset of the survivors
        dq, _ = dequeue_per_host(frontier, budget)
        surv_urls = {r["url"] for r in survivors.collect()}
        assert {r["url"] for r in dq.collect()} <= surv_urls

    def test_two_window_plan(self, spark):
        from sitemapper_spark.plans import plan_text

        frontier, _ = _mk_frontier(spark)
        dq, _ = dequeue_per_host(frontier, 5)
        txt = plan_text(dq)
        assert txt.count("Window") >= 2  # pre-top-k + exact re-rank


class TestShardedBloom:
    def test_shard_build_probe_no_false_negatives(self, spark):
        from sitemapper_spark.operators.bloom import (
            build_bloom_shards,
            merge_bloom_shards,
            split_by_bloom_shards,
        )

        n_shards, m_bits, k = 4, 1 << 16, 5
        a = spark.range(0, 3000, numPartitions=4).select(
            F.xxhash64(F.col("id").cast("string")).alias("h")
        )
        b = spark.range(3000, 6000, numPartitions=4).select(
            F.xxhash64(F.col("id").cast("string")).alias("h")
        )
        shards = merge_bloom_shards(
            build_bloom_shards(a, "h", n_shards, m_bits, k),
            build_bloom_shards(b, "h", n_shards, m_bits, k),
        )
        both = a.unionByName(b)
        fresh, maybe = split_by_bloom_shards(both, "h", shards, n_shards, m_bits, k)
        assert fresh.count() == 0  # no false negatives, ever
        assert maybe.count() == 6000
        other = spark.range(100_000, 106_000, numPartitions=4).select(
            F.xxhash64(F.col("id").cast("string")).alias("h")
        )
        fresh2, _ = split_by_bloom_shards(other, "h", shards, n_shards, m_bits, k)
        assert fresh2.count() >= 5800  # FP rate bounded

    def test_sharded_crawl_identical_output(self, spark, tmp_path):
        corpus = cm.synth_corpus(
            spark, n_pages=1200, n_hosts=3, with_images=False
        )
        corpus.write.parquet(str(tmp_path / "pages"))
        corpus = spark.read.parquet(str(tmp_path / "pages"))
        seeds = [
            (r["url"], f"s-{r['host']}", 4, 0.0)
            for r in corpus.groupBy("host").agg(F.min("url").alias("url")).collect()
        ]

        def crawl(tag, **kw):
            cfg = CrawlConfig(
                max_depth=4, num_partitions=8, bloom_min_visited=0,
                checkpoint_dir=str(tmp_path / tag), **kw,
            )
            res = CrawlEngine(spark, corpus, cfg).run(seeds)
            return {
                (r["sitemap_id"], r["url"], r["depth"])
                for r in res.visited.collect()
            }

        exact = crawl("noBloom", use_bloom=False)
        sharded = crawl("sharded", use_bloom=True, bloom_shards=4,
                        bloom_expected_urls=10_000)
        assert sharded == exact


class TestHotBucketGuard:
    def test_exact_copies_do_not_explode_candidates(self, spark):
        base = [
            (i, "the quick brown fox jumps over the lazy dog variant "
                + " ".join(f"w{i}x{j}" for j in range(6)))
            for i in range(5)
        ]
        copies = [(100 + i, base[0][1]) for i in range(100)]  # 100 exact dups
        docs = spark.createDataFrame(base + copies, "doc_id long, text string")

        # representatives collapse the 101-member group to ONE row, so
        # LSH banding sees 5 reps — candidate pair count is tiny
        from sitemapper_spark.operators.dedup_ops import (
            exact_dedup,
            lsh_candidate_pairs,
            minhash_signature_col,
            shingles_col,
            tokens_col,
        )

        reps = docs.join(
            exact_dedup(docs).select(F.col("keeper").alias("doc_id")),
            "doc_id", "left_semi",
        )
        sigs = reps.select(
            "doc_id",
            minhash_signature_col(
                shingles_col(tokens_col(F.col("text"))), k=64
            ).alias("sig"),
        )
        n_cand = lsh_candidate_pairs(sigs).count()
        assert n_cand <= 5 * 4 / 2  # ≤ all-pairs of the 5 reps

        # and the guarded pipeline still returns the full (quadratic,
        # correct) pair set: every copy pairs with every other at 1.0
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_near_dup_pairs(docs, threshold=0.9).collect()
        }
        grp = [0] + [100 + i for i in range(100)]
        expected_within = set(itertools.combinations(sorted(grp), 2))
        got_ones = {p for p, j in pairs.items() if j == 1.0}
        assert expected_within <= got_ones

    def test_guarded_equals_unguarded(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta eta theta"),
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta eta iota"),
                (3, "one two three four five six seven eight"),
            ],
            "doc_id long, text string",
        )
        kw = dict(threshold=0.3, k=128, bands=64, rows_per_band=2)
        guarded = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_near_dup_pairs(docs, **kw).collect()
        }
        plain = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_near_dup_pairs(
                docs, collapse_exact=False, **kw
            ).collect()
        }
        assert guarded == plain


class TestCustomPriority:
    def test_priority_fn_controls_dequeue_order(self, spark, tmp_path):
        """Under a binding budget, a custom priority (prefer DEEP pages:
        priority = +depth) inverts the default order (prefer shallow)."""
        corpus = cm.testsite_corpus(spark)
        root = cm.testsite_root()

        def crawl(tag, **kw):
            cfg = CrawlConfig(
                max_depth=6, per_host_budget=1, use_bloom=False,
                num_partitions=4, checkpoint_dir=str(tmp_path / tag), **kw,
            )
            res = CrawlEngine(spark, corpus, cfg).run([(root, "p", 6, 0.0)])
            return {
                r["url"]: (r["round"], r["depth"]) for r in res.visited.collect()
            }

        default = crawl("default")
        custom = crawl("custom", priority_fn=lambda: F.col("depth").cast("double"))
        # same visited set (priority changes order, not reachability)
        assert set(default) == set(custom)
        # with budget=1 the per-round pick follows priority: under
        # depth-priority the deepest queued page is dequeued first, so
        # at least one URL is visited in a different round
        assert any(default[u][0] != custom[u][0] for u in default)


def test_broadcast_threshold_fallback_identical(spark, tmp_path):
    """broadcast_fetch_max=0 forces the shuffle-join fetch path; the
    crawl output must be identical to the broadcast path, and the
    per-round image decode+verify must still run (the urls-only image
    key slice keeps its own broadcast threshold — decoupled from the
    fetch broadcast so the `bytes` column never follows the fetch into
    a shuffle)."""
    import os

    corpus = cm.testsite_corpus(spark)
    root = cm.testsite_root()

    def crawl(tag, bmax):
        cfg = CrawlConfig(
            max_depth=5, use_bloom=False, num_partitions=4,
            broadcast_fetch_max=bmax, decode_verify_images=True,
            checkpoint_dir=str(tmp_path / tag),
        )
        return CrawlEngine(spark, corpus, cfg).run([(root, "b", 5, 0.0)])

    ra, rb = crawl("bcast", 2_000_000), crawl("shuffle", 0)
    a, b = ra.adjacency_dict("b"), rb.adjacency_dict("b")
    assert a == b and len(a) == 7
    for res in (ra, rb):
        img = spark.read.parquet(
            os.path.join(res.checkpoint_dir, "round=00000", "images")
        )
        assert img.filter("ok").count() > 0


def test_seed_root_collapse_and_dedup(spark, tmp_path):
    """Multi-seed sitemap with mixed schemes: round-0 host-relative
    links must canonicalize under the SAME collapsed root scheme as
    later rounds; duplicate seed rows are visited once."""
    rows = [
        ("http://mixed.example.com/a.html", "mixed.example.com", 200,
         "http://mixed.example.com/a.html", None, ["/c.html"],
         "i0", None, 1, 1, "png", "c", 0),
        ("https://mixed.example.com/b.html", "mixed.example.com", 200,
         "https://mixed.example.com/b.html", None, ["/c.html"],
         "i1", None, 1, 1, "png", "c", 0),
        ("http://mixed.example.com/c.html", "mixed.example.com", 200,
         "http://mixed.example.com/c.html", None, [],
         "i2", None, 1, 1, "png", "c", 0),
    ]
    corpus = spark.createDataFrame(rows, cm.PAGES_SCHEMA)
    cfg = CrawlConfig(
        max_depth=2, use_bloom=False, num_partitions=4,
        checkpoint_dir=str(tmp_path / "mixed"),
    )
    seeds = [
        ("http://mixed.example.com/a.html", "m", 2, 0.0),
        ("https://mixed.example.com/b.html", "m", 2, 0.0),
        ("http://mixed.example.com/a.html", "m", 2, 0.0),  # duplicate
    ]
    res = CrawlEngine(spark, corpus, cfg).run(seeds)
    visited = [r["url"] for r in res.visited.collect()]
    assert len(visited) == len(set(visited)), "duplicate seed visited twice"
    adj = res.adjacency_dict("m")
    # collapsed root = lexicographic min = the http:// seed, so the
    # host-relative /c.html from BOTH seed pages canonicalizes to http
    assert adj["http://mixed.example.com/a.html"] == [
        "http://mixed.example.com/c.html"
    ]
    assert adj["https://mixed.example.com/b.html"] == [
        "http://mixed.example.com/c.html"
    ]


def test_documents_corpus_caption_invariant(spark, sf_dir):
    """corpus_from_documents must satisfy the decode-verify caption
    invariant (input_hint): caption == caption_for(url) on every row."""
    from sitemapper_spark.operators.multimodal import decode_verify

    pages = cm.corpus_from_documents(spark, sf_dir, with_images=True)
    agg = decode_verify(pages).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
        F.count(F.when(F.col("caption_ok"), 1)).alias("n_cap"),
    ).first()
    assert agg["n"] > 0
    assert agg["n_ok"] == agg["n"]
    assert agg["n_cap"] == agg["n"]
