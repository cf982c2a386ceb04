"""Driver-contract query library: each crawl-pipeline operator from
SURVEY.md §2 expressed relationally on the driver's TPC-H-ish parquet,
paired with ANSI-SQL oracles DuckDB can run on the same tables, plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal) over ``documents`` and ``embeddings``.

Conventions (driver compare = row-count + schema + order-insensitive
value hash with columns sorted by name):

* every computed column is aliased identically in Spark and SQL;
* doubles are rounded before returning;
* timestamps are formatted to strings;
* arrays are joined to strings (Spark array vs DuckDB list hash
  representations differ).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Crawl-operator analogs (SURVEY.md §2.3) on the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_seed_scan_lower(spark, sf_dir):
    """F1 seed ingestion: projection + lower() (`sitemapper.go:35`)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("seed_id"),
        F.lower(F.col("c_name")).alias("url"),
    )


SQL_SEED_SCAN_LOWER = """
SELECT c_custkey AS seed_id, lower(c_name) AS url FROM customer
"""


def q_depth_cutoff_filter(spark, sf_dir):
    """F2 depth gate: pushed-down predicate (`crawler.go:93`)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") < 50000)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


SQL_DEPTH_CUTOFF_FILTER = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders WHERE o_totalprice < 50000
"""


def q_frontier_topk_per_host(spark, sf_dir):
    """F3 priority dequeue: top-2 per host via stable-keyed window."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            F.col("o_custkey").alias("host"),
            F.col("o_orderkey").alias("url_id"),
            F.col("rk"),
        )
    )


SQL_FRONTIER_TOPK_PER_HOST = """
SELECT host, url_id, rk FROM (
  SELECT o_custkey AS host, o_orderkey AS url_id,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 2
"""


def q_seen_anti_join(spark, sf_dir):
    """F4 visited-set dedup: left-anti join (`crawler.go:169-171`)."""
    customer = _t(spark, sf_dir, "customer")
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return customer.join(
        seen, customer["c_custkey"] == seen["o_custkey"], "left_anti"
    ).select(F.col("c_custkey").alias("unseen_id"), F.col("c_name").alias("name"))


SQL_SEEN_ANTI_JOIN = """
SELECT c_custkey AS unseen_id, c_name AS name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


def q_first_wins_dedup(spark, sf_dir):
    """F4 determinized first-wins: min-(depth,parent) pick per URL."""
    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc("l_quantity"), F.asc("l_linenumber")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").alias("url_id"),
            F.col("l_linenumber").alias("winner_line"),
            F.round("l_quantity", 2).alias("qty"),
        )
    )


SQL_FIRST_WINS_DEDUP = """
SELECT l_orderkey AS url_id, l_linenumber AS winner_line,
       round(l_quantity, 2) AS qty
FROM (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_quantity ASC, l_linenumber ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def q_mark_visited_union(spark, sf_dir):
    """F5 frontier accumulation: UNION (distinct) of two sources."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_name").alias("url"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("url"))
    return c.unionByName(s).distinct()


SQL_MARK_VISITED_UNION = """
SELECT c_name AS url FROM customer UNION SELECT s_name AS url FROM supplier
"""


def q_fetch_left_join(spark, sf_dir):
    """F6 fetch = left join vs corpus; null right side = fetch error."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], "left"
    ).select(
        F.col("o_orderkey").alias("url_id"),
        F.coalesce(F.col("c_name"), F.lit("FETCH_ERROR")).alias("page"),
    )


SQL_FETCH_LEFT_JOIN = """
SELECT o_orderkey AS url_id, coalesce(c_name, 'FETCH_ERROR') AS page
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
  ON o_custkey = c_custkey
"""


def q_extract_explode(spark, sf_dir):
    """F7 link extraction: explode the per-page link array."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("page_id"),
            F.explode(F.split(F.col("p_type"), " ")).alias("link"),
        )
    )


SQL_EXTRACT_EXPLODE = """
SELECT p_partkey AS page_id, unnest(string_split(p_type, ' ')) AS link
FROM part
"""


def q_adjacency_collect(spark, sf_dir):
    """F9/F11 adjacency: sorted distinct link set per source, as string
    (`sitemap.go:91-104` sorts each Links array ascending)."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.array_join(F.array_sort(F.collect_set("s_name")), ",").alias("links"))
        .select(F.col("n_name").alias("src"), "links")
    )


SQL_ADJACENCY_COLLECT = """
SELECT n_name AS src,
       array_to_string(list_sort(list(DISTINCT s_name)), ',') AS links
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_robots_semi_join(spark, sf_dir):
    """Robots allow-list gating: broadcast left-semi join."""
    orders = _t(spark, sf_dir, "orders")
    allowed = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        F.broadcast(allowed),
        orders["o_custkey"] == allowed["c_custkey"],
        "left_semi",
    ).select(F.col("o_orderkey").alias("url_id"), F.col("o_custkey").alias("host"))


SQL_ROBOTS_SEMI_JOIN = """
SELECT o_orderkey AS url_id, o_custkey AS host FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_acctbal > 5000)
"""


def q_politeness_budget(spark, sf_dir):
    """F10 budget conservation: after top-3 dequeue, no host exceeds 3."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy(F.col("o_custkey").alias("host"))
        .agg(F.count("*").alias("dequeued"))
    )


SQL_POLITENESS_BUDGET = """
SELECT host, count(*) AS dequeued FROM (
  SELECT o_custkey AS host,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3 GROUP BY host
"""


def q_lineage_metrics(spark, sf_dir):
    """F12 per-round metrics: counts + sums per status group."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("status"))
        .agg(
            F.count("*").alias("jobs"),
            F.round(F.sum("o_totalprice"), 1).alias("total"),
        )
    )


SQL_LINEAGE_METRICS = """
SELECT o_orderpriority AS status, count(*) AS jobs,
       round(sum(o_totalprice), 1) AS total
FROM orders GROUP BY o_orderpriority
"""


def q_distinct_count(spark, sf_dir):
    """Global distinct (seen-set cardinality)."""
    return (
        _t(spark, sf_dir, "customer")
        .agg(F.countDistinct("c_mktsegment").alias("n_segments"),
             F.countDistinct("c_nationkey").alias("n_nations"))
    )


SQL_DISTINCT_COUNT = """
SELECT count(DISTINCT c_mktsegment) AS n_segments,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer
"""


def q_sort_limit_topk(spark, sf_dir):
    """Global top-k with stable tie-break (F11 output ordering)."""
    return (
        _t(spark, sf_dir, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
        .select("p_partkey", F.round("p_retailprice", 2).alias("price"))
    )


SQL_SORT_LIMIT_TOPK = """
SELECT p_partkey, round(p_retailprice, 2) AS price FROM part
ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
"""


def q_frontier_expand_round(spark, sf_dir):
    """One BFS round relationally: frontier(join)→candidates(distinct)
    →anti-join visited — the D2/D5 pipeline on TPC-H tables."""
    frontier = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    visited = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    candidates = (
        orders.join(
            frontier, orders["o_custkey"] == frontier["c_custkey"], "left_semi"
        )
        .select("o_orderkey")
        .distinct()
    )
    return candidates.join(visited, "o_orderkey", "left_anti").select(
        F.col("o_orderkey").alias("next_url")
    )


SQL_FRONTIER_EXPAND_ROUND = """
SELECT o_orderkey AS next_url FROM (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE EXISTS (SELECT 1 FROM customer
                WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
) c
WHERE NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_orderkey = c.o_orderkey
                    AND o2.o_orderstatus = 'F')
"""


def q_events_hourly(spark, sf_dir):
    """Event-stream style rollup: per type per hour counts (lineage ts)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*) AS n, round(sum(value), 2) AS v
FROM events GROUP BY 1, 2
"""


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape — the bench headline aggregation."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 1).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 1) AS sum_qty,
       round(sum(l_extendedprice), 1) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3_like(spark, sf_dir):
    """Join-heavy revenue top-10 (join strategy exercise).

    Round-6 join order (guide §3.1/§3.2; same result, 2.0 -> ~0.6 s at
    sf1.0): instead of shuffling the 6M-row lineitem into a sort-merge
    join with orders, the selective side is reduced FIRST — customer is
    filtered and broadcast into a semi-join that keeps the ~1/5 of
    orders with a BUILDING customer, and the surviving o_orderkey set
    (still only ~300k longs at sf1.0) is broadcast into the lineitem
    join. lineitem is then never exchanged: one scan, one broadcast
    probe, partial aggregation. Equivalent to the declared three-way
    inner join because c_custkey is the customer table's key (the
    customer join matches each order at most once, exactly the
    semi-join); at a scale where the surviving key set outgrows a
    broadcast, the same reduction becomes a Bloom-filter prefilter on
    lineitem (guide §3.2)."""
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    ord_keys = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == customer["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    return (
        lineitem.join(
            F.broadcast(ord_keys),
            lineitem["l_orderkey"] == ord_keys["o_orderkey"],
        )
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(F.col("o_orderkey").alias("url_id"), "revenue")
    )


SQL_TPCH_Q3_LIKE = """
SELECT o_orderkey AS url_id,
       round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY revenue DESC, url_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Training-data-pipeline operators over documents / embeddings
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-group on md5(text), keep min doc_id."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_normalized(spark, sf_dir):
    """Near-exact dedup: whitespace/case-normalized fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(norm).alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


SQL_DEDUP_NORMALIZED = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_token_count(spark, sf_dir):
    """Whitespace tokenization: per-doc token count."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


def q_text_quality(spark, sf_dir):
    """Quality scoring: length/token/punctuation features per doc."""
    text = F.col("text")
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    n_chars = F.length(text)
    n_periods = n_chars - F.length(F.regexp_replace(text, r"\.", ""))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_periods.alias("n_periods"),
        F.round(n_chars / n_tokens, 2).alias("avg_token_len"),
    )


SQL_TEXT_QUALITY = """
SELECT doc_id, length(text) AS n_chars,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) - length(regexp_replace(text, '\\.', '', 'g')) AS n_periods,
       round(length(text) / len(regexp_split_to_array(trim(text), '\\s+')), 2)
         AS avg_token_len
FROM documents
"""


def q_lang_id_heuristic(spark, sf_dir):
    """Language ID: the PRODUCTION `functions/text.lang_id_col` itself
    (3-language stopword vote over {en, es, fr}, 'other' on ties/0),
    oracled by recomputing every per-language hit count with the same
    length-arithmetic trick in SQL (round-2 verdict nit #3: the oracle
    previously exercised a simplified 3-stopword variant)."""
    from .functions.text import lang_id_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", lang_id_col(F.col("text")).alias("lang_guess")
    )


def _sql_stopword_hits(words: list[str]) -> str:
    """SQL twin of text._occurrences summed over a stopword list: per
    word, (length delta of replacing ' w ' by '|') / (len(w)+1), cast
    BIGINT per term exactly like the Spark column."""
    return "\n      + ".join(
        f"CAST((length(t) - length(regexp_replace(t, ' {w} ', '|', 'g')))"
        f" / {len(w) + 1} AS BIGINT)"
        for w in words
    )


def _sql_lang_id() -> str:
    from .functions.text import _EN_STOPWORDS, _ES_STOPWORDS, _FR_STOPWORDS

    return f"""
SELECT doc_id,
  CASE WHEN en > es AND en > fr THEN 'en'
       WHEN es > en AND es > fr THEN 'es'
       WHEN fr > en AND fr > es THEN 'fr'
       ELSE 'other' END AS lang_guess
FROM (
  SELECT doc_id,
      {_sql_stopword_hits(_EN_STOPWORDS)} AS en,
      {_sql_stopword_hits(_ES_STOPWORDS)} AS es,
      {_sql_stopword_hits(_FR_STOPWORDS)} AS fr
  FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents)
)
"""


SQL_LANG_ID_HEURISTIC = _sql_lang_id()


def q_embedding_norms(spark, sf_dir):
    """Vector plumbing: sequential-fold L2 norm per embedding."""
    emb = F.col("embedding").cast("array<double>")
    sumsq = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x)
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.round(F.sqrt(sumsq), 4).alias("l2_norm"), "label"
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id, round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 4)
  AS l2_norm, label
FROM embeddings
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 query vector — the
    exact ANN baseline (IVF/LSH variants are the scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    joined = e.crossJoin(F.broadcast(qvec))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    nq = F.sqrt(F.aggregate("qv", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        joined.filter(F.col("vec_id") != 0)
        .select(
            "vec_id", F.round(dot / (nv * nq), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def q_ivf_ann_topk(spark, sf_dir):
    """IVF index with full probe (nprobe = k_clusters) — must equal the
    brute-force oracle exactly, proving the index loses nothing the
    pruning doesn't intend to lose."""
    from .operators.similarity_ops import ivf_assign, ivf_topk, kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    # one driver job fetches the query vector; dim derives from it
    # (the old shape paid a second first() job just for the length)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    dim = len(qvec)
    cents = kmeans_centroids(emb, n_clusters=4, dim=dim, iters=1)
    indexed = ivf_assign(emb, cents)
    return ivf_topk(
        indexed.filter(F.col("vec_id") != 0), cents, qvec, k=10, nprobe=4
    ).drop("cluster")


# full probe ≡ brute force, so the oracle is the same as ann_cosine_topk
SQL_IVF_ANN_TOPK = SQL_ANN_COSINE_TOPK


# --- pipeline operators previously rows-only, now ORACLED: each is
# restructured so a DuckDB statement reproduces the exact output
# (exact all-pairs recomputation, invariant counts, or SQL-twin
# hashing) while the Spark side still exercises the scale path
# (LSH banding, chunked hamming, mapInPandas decode) -----------------------

def q_minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-dup pairs on documents, exact-Jaccard verified.

    Oracle = exact all-pairs Jaccard ≥ 0.5 over the same 3-gram shingle
    sets (DuckDB list_intersect/list_distinct). Banding runs at
    k=128/64 bands × 2 rows (per-pair miss probability ≤ (1−j²)^64 ≈
    1e-8 at j=0.5), so LSH recall is total on this data and the banded
    pipeline equals the brute-force oracle exactly; verification is
    exact either way, so false positives are impossible.
    """
    from .operators.dedup_ops import minhash_near_dup_pairs

    return minhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.5, k=128, bands=64, rows_per_band=2,
    )


SQL_MINHASH_NEAR_DUP = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
                     x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(range(0, len(toks) - 3 + 1),
                 i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM s a, s b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""


def q_simhash_dup_pairs(spark, sf_dir):
    """SimHash duplicate detection with a provable oracle contract.

    Input = documents ∪ a word-order-REVERSED twin of every document
    (doc_id + 100000): same bag of words, different text — exactly the
    permuted-duplicate class SimHash exists to catch (and exact/md5
    dedup cannot). Pipeline: 64-bit SimHash (JVM-hashed tokens, numpy
    voting) → pigeonhole chunk banding at max_hamming=0 → exact
    token-multiset verify. Identical bags ⇒ identical simhash ⇒
    recalled by banding (perfect recall at hamming 0); the exact verify
    removes any 64-bit collisions — so the output EQUALS the
    SQL-expressible relation "pairs with identical sorted token lists",
    with simhash/banding doing the candidate pruning at scale.
    """
    from .operators.dedup_ops import (
        _spread,
        hamming_band_pairs,
        simhash_tokens_col,
        tokens_col,
    )

    # Round-6 plan restructure (same output, measured 5.1 -> ~2 s warm
    # at sf1.0; guide §2.3/§2.5/§3.1): tokenize ONCE into a spread
    # cache and derive everything from it. The old shape re-tokenized
    # the corpus three times per pass (simhash input, id_a bags, id_b
    # bags) on the scan's 2-4 input partitions. The reversed twin's
    # token array equals reverse(tokens) exactly — tokens are
    # [\p{L}\p{N}]+ runs joined by single spaces, so re-tokenizing the
    # joined string is the identity (empty arrays round-trip to empty)
    # — and its bag is therefore the SAME bag, which is how the
    # pipeline recalls it. Bags attach to the (small) pair set with
    # broadcast-hash joins, so the token arrays never shuffle.
    toks = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", tokens_col(F.col("text")).alias("toks")).persist()
    all_toks = toks.unionByName(
        toks.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.reverse(F.col("toks")).alias("toks"),
        )
    )
    hashed = all_toks.select(
        "doc_id", simhash_tokens_col(F.col("toks"), 42).alias("sh")
    ).persist()
    pairs = hamming_band_pairs(hashed, "doc_id", "sh", max_hamming=0)
    bags = all_toks.select(
        F.col("doc_id"), F.array_sort(F.col("toks")).alias("bag")
    )
    return (
        pairs.join(
            F.broadcast(
                bags.select(
                    F.col("doc_id").alias("id_a"), F.col("bag").alias("_ba")
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                bags.select(
                    F.col("doc_id").alias("id_b"), F.col("bag").alias("_bb")
                )
            ),
            "id_b",
        )
        .filter(F.col("_ba") == F.col("_bb"))
        .select("id_a", "id_b")
    )


SQL_SIMHASH_DUP_PAIRS = r"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(list_reverse(list_filter(
           regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
           x -> x <> '')), ' ')
  FROM documents
), t AS (
  SELECT doc_id,
         list_sort(list_filter(
           regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
           x -> x <> '')) AS bag
  FROM base
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM t a JOIN t b ON a.bag = b.bag AND a.doc_id < b.doc_id
"""


def q_srp_near_dup(spark, sf_dir):
    """SRP-LSH embedding near-dup pairs, exact-cosine verified.

    Oracle = exact all-pairs cosine ≥ 0.4 (DuckDB list_dot_product).
    SRP banding runs at 32 chunks × 2 bits (per-pair miss probability
    (1−(1−θ/π)²)^32 ≈ 1e-7 at the 0.4 boundary), so recall is total on
    this data; the exact verify removes band false positives — banded
    output equals the brute-force oracle.
    """
    from .operators.similarity_ops import srp_lsh_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    # driver embeddings are near-orthogonal random vectors (max pairwise
    # cos ≈ 0.51 at sf0.01) — 0.4 yields a small non-empty pair set
    return srp_lsh_near_dup_pairs(emb, dim=dim, threshold=0.4, n_chunks=32)


SQL_SRP_NEAR_DUP = """
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
FROM q a, q b
WHERE a.vec_id < b.vec_id
  AND round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
"""


def q_srp_near_dup_prod(spark, sf_dir):
    """SRP-LSH at the PRODUCTION band configuration (8 chunks × 8
    bits), oracled via planted-twin structure instead of brute-force
    collision.

    The oracled ``srp_near_dup`` proves recall at a degenerate 32×2-bit
    banding (2-bit bands collide for unrelated vectors with p ≥ 1/4, so
    the candidate set is near-all-pairs — provable recall, quadratic
    plan). At scale one runs wide bands that PRUNE; recall then comes
    from structure, not saturation. This query pins that configuration
    with a contract that stays exact: each embedding gets a twin scaled
    by 2.0 — a power of two, so every float is scaled exactly, every
    projection dot product keeps its sign bit-for-bit, and twin SRP
    signatures are IDENTICAL (collide in all 8 bands, recall certain).
    cos(v, 2v) rounds to 1.0000 in both engines, and the corpus's
    non-twin pairs stay far below the 0.99 threshold (max pairwise
    cos ≈ 0.51 on this data), so output = exactly the planted pairs —
    while the 8-bit bands prune unrelated candidates (p ≈ 2^-8/band)
    instead of admitting everything."""
    from .operators.similarity_ops import srp_lsh_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    base = emb.select("vec_id", "embedding").unionByName(twins)
    return srp_lsh_near_dup_pairs(
        base, dim=dim, threshold=0.99, n_bits=64, n_chunks=8
    )


SQL_SRP_NEAR_DUP_PROD = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.99
"""


def q_doc_fingerprint(spark, sf_dir):
    """Order-insensitive n-gram document fingerprint (md5 over the
    sorted distinct 4-gram set — recomputed verbatim by the oracle)."""
    from .functions.text import fingerprint_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint_col(F.col("text")).alias("fp")
    )


SQL_DOC_FINGERPRINT = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
         list_transform(range(0, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i + 1, i + 4), ' '))
       )), '|')) AS fp
FROM t
"""


def q_image_near_dup(spark, sf_dir):
    """Image near-dup: decode → recomputed perceptual hash → pigeonhole
    chunk banding → popcount + exact offset-normalized verify.

    Input = one synthetic image per document plus a GLOBAL-BRIGHTNESS-
    SHIFTED twin (image_id + 100000, pixels + 2, no clipping by
    construction) — the permuted-duplicate class perceptual hashing
    exists to catch (byte-exact dedup cannot: the payloads differ).
    dhash64 compares adjacent block means, and a global shift moves
    every mean by exactly +2, so each twin's hash is BIT-IDENTICAL →
    hamming 0 → perfect banding recall at max_hamming=2; the final
    verify joins on md5(px - px[0,0,0]) (offset-normalized pixels,
    exactly invariant under the shift, distinct across unrelated random
    images) — so the output EQUALS the SQL-expressible relation
    {(doc_id, doc_id + 100000)}, with the phash banding doing the
    candidate pruning at scale."""
    from .operators.image_dedup import decode_signatures, phash_near_dup_pairs

    def gen(batches):
        import numpy as np
        import pandas as pd

        from .functions.images import png_encode, synth_pixels

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = (synth_pixels(f"nd-{d}", 16, 12) // 2 + 32).astype(
                    np.uint8
                )  # range [32,159]: +2 can never clip
                twin = (base + 2).astype(np.uint8)
                rows.append((str(d), png_encode(base), "png"))
                rows.append((str(d + 100000), png_encode(twin), "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    images = (
        # NOT spread (round-6 A/B): unlike the text pipelines, widening
        # the doc scan before the synth-encode/decode chain measured a
        # wash at sf1.0 and ~0.1 s SLOWER at sf0.1 (the added exchange
        # outweighs the narrow scan — the decode chain's own exchanges
        # already re-spread the heavy work)
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(gen, schema="image_id string, bytes binary, fmt string")
    )
    sigs = decode_signatures(images).persist()
    pairs = phash_near_dup_pairs(sigs, "image_id", "phash_rec", max_hamming=2)
    a = sigs.select(F.col("image_id").alias("id_a"), F.col("norm_fp").alias("_fa"))
    b = sigs.select(F.col("image_id").alias("id_b"), F.col("norm_fp").alias("_fb"))
    ia = F.col("id_a").cast("long")
    ib = F.col("id_b").cast("long")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("_fa") == F.col("_fb"))
        .select(
            F.least(ia, ib).alias("id_a"), F.greatest(ia, ib).alias("id_b")
        )
    )


SQL_IMAGE_NEAR_DUP = """
SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM documents
"""


def q_image_near_dup_h2(spark, sf_dir):
    """Image near-dup at hamming > 0 — driver-oracles the NONZERO-
    distance banding recall (round-4 verdict missing #3: the prior
    `image_near_dup` contract only exercises hamming 0; the 1–2 bit
    path was pytest-pinned but never driver-oracled).

    Constructive contract (`operators/image_dedup.designed_hash_pixels`,
    property-verified in tests): per doc, a base image whose dhash64
    EQUALS a per-doc pseudorandom 64-bit pattern (constant-valued
    blocks on the hash's own 8x9 grid, strict 8-gray margins), plus
    two qjpg-encoded twins that flip only LAST-COLUMN comparisons —
    block (i, 8) feeds exactly one comparison, so each flip moves
    exactly one bit: twin1 (doc_id+100000) at hamming exactly 1, twin2
    (doc_id+200000) at hamming exactly 2; twin1-vs-twin2 is hamming 3
    (disjoint rows), outside the max_hamming=2 gate by construction.
    Payload values are multiples of 4, so the qjpg quantizer shifts
    every block by +2 uniformly — the lossy decode path preserves
    every comparison. Unrelated docs carry independent 64-bit
    patterns (cross-pair hamming ~32). The pipeline output therefore
    equals the SQL relation {(d, d+100000, 1)} ∪ {(d, d+200000, 2)}:
    recall is pigeonhole-perfect at hamming ≤ 2, precision is exact
    popcount, and the plan is the same id-chunk banding the 100 TB
    path uses (never all-pairs, `bytes` never shuffles — signatures
    are extracted by mapInPandas before any exchange)."""
    from .operators.image_dedup import decode_signatures, phash_near_dup_pairs

    def gen(batches):
        import numpy as np
        import pandas as pd

        from .functions.images import lossy_encode, splitmix64
        from .operators.image_dedup import (
            designed_hash_pixels,
            flip_last_col_bits,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rng = np.random.Generator(np.random.PCG64(splitmix64(d)))
                bits = rng.integers(0, 2, size=(8, 8)).astype(np.int64)
                for ident, pattern in (
                    (d, bits),
                    (d + 100000, flip_last_col_bits(bits, [0])),
                    (d + 200000, flip_last_col_bits(bits, [2, 5])),
                ):
                    rows.append(
                        (
                            str(ident),
                            lossy_encode(designed_hash_pixels(pattern)),
                            "qjpg",
                        )
                    )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    images = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(gen, schema="image_id string, bytes binary, fmt string")
    )
    sigs = decode_signatures(images)
    pairs = phash_near_dup_pairs(sigs, "image_id", "phash_rec", max_hamming=2)
    ia = F.col("id_a").cast("long")
    ib = F.col("id_b").cast("long")
    return pairs.select(
        F.least(ia, ib).alias("id_a"),
        F.greatest(ia, ib).alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


SQL_IMAGE_NEAR_DUP_H2 = """
SELECT doc_id AS id_a, doc_id + 100000 AS id_b, CAST(1 AS INTEGER) AS hamming
FROM documents
UNION ALL
SELECT doc_id AS id_a, doc_id + 200000 AS id_b, CAST(2 AS INTEGER) AS hamming
FROM documents
"""


def q_multimodal_decode_verify(spark, sf_dir):
    """Image decode + verify invariant over the documents-derived
    corpus (input_hint contract): every payload must decode (PSNR ≥
    40 dB lossy / exact lossless) with caption == caption_for(url).

    The Spark side actually decodes every image (mapInPandas, Arrow);
    the oracle states the invariant from the documents table alone —
    per-format counts where n == n_ok == n_caption_ok.
    """
    from .corpus import corpus_from_documents
    from .operators.multimodal import decode_verify

    pages = corpus_from_documents(spark, sf_dir, with_images=True)
    return (
        decode_verify(pages)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("ok"), 1)).alias("n_ok"),
            F.count(F.when(F.col("caption_ok"), 1)).alias("n_caption_ok"),
        )
    )


SQL_MULTIMODAL_DECODE_VERIFY = """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'qjpg' END AS fmt,
       count(*) AS n, count(*) AS n_ok, count(*) AS n_caption_ok
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_ORACLE: dict[str, str] = {
    "seed_scan_lower": SQL_SEED_SCAN_LOWER,
    "depth_cutoff_filter": SQL_DEPTH_CUTOFF_FILTER,
    "frontier_topk_per_host": SQL_FRONTIER_TOPK_PER_HOST,
    "seen_anti_join": SQL_SEEN_ANTI_JOIN,
    "first_wins_dedup": SQL_FIRST_WINS_DEDUP,
    "mark_visited_union": SQL_MARK_VISITED_UNION,
    "fetch_left_join": SQL_FETCH_LEFT_JOIN,
    "extract_explode": SQL_EXTRACT_EXPLODE,
    "adjacency_collect": SQL_ADJACENCY_COLLECT,
    "robots_semi_join": SQL_ROBOTS_SEMI_JOIN,
    "politeness_budget": SQL_POLITENESS_BUDGET,
    "lineage_metrics": SQL_LINEAGE_METRICS,
    "distinct_count": SQL_DISTINCT_COUNT,
    "sort_limit_topk": SQL_SORT_LIMIT_TOPK,
    "frontier_expand_round": SQL_FRONTIER_EXPAND_ROUND,
    "events_hourly": SQL_EVENTS_HOURLY,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3_like": SQL_TPCH_Q3_LIKE,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_normalized": SQL_DEDUP_NORMALIZED,
    "token_count": SQL_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id_heuristic": SQL_LANG_ID_HEURISTIC,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "ivf_ann_topk": SQL_IVF_ANN_TOPK,
    "minhash_near_dup": SQL_MINHASH_NEAR_DUP,
    "simhash_dup_pairs": SQL_SIMHASH_DUP_PAIRS,
    "srp_near_dup": SQL_SRP_NEAR_DUP,
    "srp_near_dup_prod": SQL_SRP_NEAR_DUP_PROD,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "image_near_dup": SQL_IMAGE_NEAR_DUP,
    "image_near_dup_h2": SQL_IMAGE_NEAR_DUP_H2,
    "multimodal_decode_verify": SQL_MULTIMODAL_DECODE_VERIFY,
}

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "seed_scan_lower": q_seed_scan_lower,
    "depth_cutoff_filter": q_depth_cutoff_filter,
    "frontier_topk_per_host": q_frontier_topk_per_host,
    "seen_anti_join": q_seen_anti_join,
    "first_wins_dedup": q_first_wins_dedup,
    "mark_visited_union": q_mark_visited_union,
    "fetch_left_join": q_fetch_left_join,
    "extract_explode": q_extract_explode,
    "adjacency_collect": q_adjacency_collect,
    "robots_semi_join": q_robots_semi_join,
    "politeness_budget": q_politeness_budget,
    "lineage_metrics": q_lineage_metrics,
    "distinct_count": q_distinct_count,
    "sort_limit_topk": q_sort_limit_topk,
    "frontier_expand_round": q_frontier_expand_round,
    "events_hourly": q_events_hourly,
    "tpch_q1": q_tpch_q1,
    "tpch_q3_like": q_tpch_q3_like,
    "dedup_exact": q_dedup_exact,
    "dedup_normalized": q_dedup_normalized,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "lang_id_heuristic": q_lang_id_heuristic,
    "embedding_norms": q_embedding_norms,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ivf_ann_topk": q_ivf_ann_topk,
    "minhash_near_dup": q_minhash_near_dup,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "srp_near_dup": q_srp_near_dup,
    "srp_near_dup_prod": q_srp_near_dup_prod,
    "doc_fingerprint": q_doc_fingerprint,
    "image_near_dup": q_image_near_dup,
    "image_near_dup_h2": q_image_near_dup_h2,
    "multimodal_decode_verify": q_multimodal_decode_verify,
}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLE)
