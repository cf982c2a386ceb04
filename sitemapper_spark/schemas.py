"""Fixed explicit schemas for every engine table.

The reference has no schema system (Go structs, `sitemap.go:11-21`);
here every table is a fixed ``StructType`` — never inferred — so
checkpoint/resume and oracle comparison are deterministic
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The crawlable corpus — replaces live HTTP (`crawler.go:260-276`): a
# fetch is a join against this table. Extends the mandated image+caption
# shape (BASELINE.json.input_hint) with crawl-addressable columns.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("final_url", T.StringType(), False),
        T.StructField("html", T.StringType(), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# Distributed frontier — the NATS CrawlMessage analog (`nats.go:14-19`)
# plus scheduling columns (priority, salt) per the north_rule.
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("root", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("parent", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# Visited set — the SiteMap key set / results_by_sitemap_id URL column
# (`sitemap.go:49-53`, `cassandra.go:166-182`).
VISITED_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# Adjacency edges — linkMap rows (`sitemap.go:11-14`).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# Per-round, per-partition lineage/metrics — the crawl_jobs status
# machine analog (`cassandra.go:79-80`, `crawlmanager.go:76-96`).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("urls_dequeued", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("links_found", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("max_depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

# robots.txt gating + per-host politeness budget (FIXTURES.md §4;
# reference analog: Limiter tokens, `limiter.go:14-25`).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("max_fetches_per_round", T.IntegerType(), True),
    ]
)

ADJACENCY_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("links", T.ArrayType(T.StringType()), False),
    ]
)
