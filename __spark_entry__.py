"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` exercises one operator family from
SURVEY.md §2 using the sandcrawler_spark engine; ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL over the same parquet tables.
Crawl-domain inputs (URL frontier, capture index, robots budgets) are
derived deterministically from the TPC-H-ish driver tables with
SQL-expressible transforms so both engines see identical inputs.

Every query has an oracle entry. Three oracle styles:
  - true SQL twins (most queries): DuckDB recomputes the semantics
    independently over the same parquet inputs;
  - derived twins for the UDF families (simhash, ann_lsh): the md5
    math behind the signatures is replayed in SQL bit arithmetic /
    hex decoding, validated byte-exact against the Python tier;
  - corpus twins for the four synthetic-corpus queries
    (fetch_statuses, extraction_roundtrip, grobid_hook,
    revisit_resolution): the seed=42 corpus is PERSISTED to parquet
    once (fixtures/corpus_seed42/) and both engines read those same
    files — Spark runs the operators, DuckDB independently recomputes
    the semantics in SQL (the bounded hop loop as chained per-hop
    CTEs, revisit resolution as a window + self-join, the grobid/
    pdftrio stub arithmetic from the cdx-recorded sha1hex, extraction
    word counts from the pinned text column).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


_T_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized table reader: spark.read.parquet does schema/footer
    discovery eagerly (a driver job per call), which at ~2 tables per
    query dominated the 250-query sweep's fixed cost. The DataFrame is
    lazy and immutable, so handing the same plan object to every query
    changes nothing downstream (NOT .cache() — that would swap scans
    to InMemoryTableScan and break the pushdown plan audits). Keyed by
    applicationId so a new session never receives plans bound to a
    dead JVM (same discipline as _CORPUS_CACHE)."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    if key not in _T_CACHE:
        if _T_CACHE and next(iter(_T_CACHE))[0] != key[0]:
            _T_CACHE.clear()
        _T_CACHE[key] = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _T_CACHE[key]


def _emb_dim(spark: SparkSession, sf_dir: str) -> int:
    """Memoized embedding dimensionality (a first() job per probe
    otherwise — several ANN queries ask)."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "__dim__")
    if key not in _T_CACHE:
        e = _t(spark, sf_dir, "embeddings")
        _T_CACHE[key] = len(e.select("embedding").first()[0])
    return _T_CACHE[key]


# ---------------------------------------------------------------------------
# Derived crawl inputs (Spark side; SQL twins live in the oracle CTEs)
# ---------------------------------------------------------------------------

def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL frontier derived from orders: one URL per order, ~50 hosts
    (site_id = o_custkey % 50 -> mild skew via custkey distribution),
    priority from o_orderpriority ('1-URGENT' -> 5 ... '5-LOW' -> 1)."""
    o = _t(spark, sf_dir, "orders")
    site = (F.col("o_custkey") % 50).cast("int")
    host = F.concat(F.lit("site"), site.cast("string"), F.lit(".example.com"))
    return o.select(
        F.concat(F.lit("https://"), host, F.lit("/order/"), F.col("o_orderkey").cast("string")).alias("url"),
        host.alias("host"),
        (F.lit(6) - F.substring("o_orderpriority", 1, 1).cast("int")).alias("priority"),
        site.alias("site_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
        F.col("o_orderstatus"),
    )


_URLS_CTE = """
urls AS (
  SELECT 'https://site' || CAST(CAST(o_custkey % 50 AS INT) AS VARCHAR) || '.example.com/order/' || CAST(o_orderkey AS VARCHAR) AS url,
         'site' || CAST(CAST(o_custkey % 50 AS INT) AS VARCHAR) || '.example.com' AS host,
         CAST(6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS INT) AS priority,
         CAST(o_custkey % 50 AS INT) AS site_id,
         o_orderkey, o_orderdate, o_orderstatus
  FROM orders
)
"""


def _captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-shaped capture index derived from events: url identifies a
    user stream, datetime from ts, status/mimetype from event_type.
    Deduped to one capture per (url, datetime) second for deterministic
    window ranking."""
    e = _t(spark, sf_dir, "events")
    cap = e.select(
        F.concat(F.lit("https://stream.example.org/u/"), F.col("user_id").cast("string")).alias("url"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("datetime"),
        F.col("event_type").alias("mimetype"),
        F.when(F.col("event_type") == "purchase", 226)
        .when(F.col("event_type").isin("click", "view"), 200)
        .otherwise(404)
        .alias("status_code"),
        F.md5(F.col("event_id").cast("string")).alias("sha1hex"),
        (F.col("event_id") % 1000).cast("long").alias("warc_csize"),
        F.concat(F.lit("CRAWL-"), (F.col("event_id") % 7).cast("string"), F.lit("/x.warc.gz")).alias("warc_path"),
        F.col("event_id"),
    )
    w = Window.partitionBy("url", "datetime").orderBy("event_id")
    return cap.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


_CAPTURES_CTE = """
captures AS (
  SELECT * FROM (
    SELECT 'https://stream.example.org/u/' || CAST(user_id AS VARCHAR) AS url,
           strftime(ts, '%Y%m%d%H%M%S') AS datetime,
           event_type AS mimetype,
           CAST(CASE WHEN event_type = 'purchase' THEN 226
                     WHEN event_type IN ('click', 'view') THEN 200
                     ELSE 404 END AS INT) AS status_code,
           md5(CAST(event_id AS VARCHAR)) AS sha1hex,
           CAST(event_id % 1000 AS BIGINT) AS warc_csize,
           'CRAWL-' || CAST(event_id % 7 AS VARCHAR) || '/x.warc.gz' AS warc_path,
           event_id,
           ROW_NUMBER() OVER (PARTITION BY 'https://stream.example.org/u/' || CAST(user_id AS VARCHAR), strftime(ts, '%Y%m%d%H%M%S') ORDER BY event_id) AS _rn
    FROM events
  ) WHERE _rn = 1
)
"""


def _aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents subset + planted near-duplicates (doc_id + 100000,
    text with a appended tail) — the near-dup family needs true
    positives to find."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") < 50)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended tail words")).alias("text"),
        )
    )
    return d.unionByName(dups)


_AUG_DOCS_CTE = """
aug_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' appended tail words' AS text
  FROM documents WHERE doc_id < 50
)
"""

_SHINGLES_CTE = """
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                      i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
        FROM aug_docs)
)
"""

# shared MinHash-LSH candidate pipeline (k=8, bands=4, 3-gram shingles)
# used by the minhash_lsh / jaccard_pairs / neardup_dedupe oracles
_LSH_CTES = (
    _AUG_DOCS_CTE.strip()
    + ",\n"
    + _SHINGLES_CTE.strip()
    + """,
sigs AS (
  SELECT doc_id,
         [list_min(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ':' || s))) FOR i IN range(0, 8)] AS sig
  FROM shingled WHERE len(sh) > 0
),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*2+1:b*2+2], ',')) AS bkey
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM cands c
  JOIN shingled a ON a.doc_id = c.id_a
  JOIN shingled b ON b.doc_id = c.id_b
  WHERE len(a.sh) > 0 AND len(b.sh) > 0
)"""
)


# ---------------------------------------------------------------------------
# Synthetic web corpus (shared, cached) for the non-SQL crawl queries
# ---------------------------------------------------------------------------

_CORPUS_CACHE: dict = {}

_CORPUS_TABLES = ("pages", "cdx", "ingest_request", "robots")


def _corpus_dir() -> str:
    """Persist the seed=42 synthetic corpus as parquet (once) and
    return the directory. Both engines read these SAME files: the
    Spark queries via spark.read.parquet, the DuckDB oracles via
    read_parquet() — which is what makes the four corpus oracles true
    independent twins instead of frozen goldens."""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "corpus_seed42")
    if all(os.path.exists(os.path.join(out, f"{t}.parquet")) for t in _CORPUS_TABLES):
        return out
    from sandcrawler_spark.sources.synth import write_corpus_parquet

    # build into a tmp dir, then atomically move each file into place
    # (concurrent builders produce byte-identical files; os.replace
    # makes the race harmless)
    tmp = f"{out}.tmp-{os.getpid()}"
    write_corpus_parquet(tmp, seed=42, n_urls=120, n_hosts=12)
    os.makedirs(out, exist_ok=True)
    for t in _CORPUS_TABLES:
        os.replace(os.path.join(tmp, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
    os.rmdir(tmp)
    return out


def _corpus(spark: SparkSession):
    # key by applicationId, not id(spark): a stopped session's address
    # can be reused by a new SparkSession, which would then receive
    # DataFrames bound to the dead JVM session
    key = spark.sparkContext.applicationId
    if key not in _CORPUS_CACHE:
        cd = _corpus_dir()
        _CORPUS_CACHE.clear()
        _CORPUS_CACHE[key] = {
            name: spark.read.parquet(os.path.join(cd, f"{name}.parquet"))
            for name in _CORPUS_TABLES
        }
    return _CORPUS_CACHE[key]


def _corpus_cdx_ranked(spark: SparkSession) -> DataFrame:
    """The seed-42 corpus CDX as a ranked key dimension: rid is a
    deterministic 0-based index (ORDER BY surt, datetime — unique in
    this corpus), plus parsed scheme/host/path. The re-keyed
    session-15/16 queries join sf-scaled tables to this 256-row
    broadcast dimension (doc_id % 256 = rid), so their join keys carry
    the corpus's REAL scheme mix and Zipf-skewed host distribution
    (journal0 ~1/3 of captures) instead of uniform doc_id % k
    arithmetic (VERDICT r4 'What's wrong #3'). The rid window is a
    global orderBy over a fixed 256-row relation — bounded by
    construction, never corpus-sized."""
    from pyspark.sql import Window

    cdx = _corpus(spark)["cdx"]
    rest = F.expr("substring(url, instr(url, '://') + 3)")
    host = F.substring_index(rest, "/", 1)
    return cdx.select(
        (F.row_number().over(Window.orderBy("surt", "datetime")) - 1)
        .cast("long").alias("rid"),
        "url", "mimetype", "status_code", "sha1hex", "warc_csize", "redirect_url",
        F.expr("substring(url, 1, instr(url, '://') - 1)").alias("scheme"),
        host.alias("host"),
        F.substring(rest, F.length(host) + 1, F.lit(1_000_000)).alias("path"),
    )


def _corpus_cdx_ranked_cte() -> str:
    """DuckDB twin of _corpus_cdx_ranked over the same parquet."""
    cd = _corpus_dir().replace("'", "''")
    return f"""
cdxr AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY surt, datetime) - 1 AS BIGINT) AS rid,
         url, mimetype, status_code, sha1hex, warc_csize, redirect_url,
         substring(url, 1, instr(url, '://') - 1) AS scheme,
         split_part(substring(url, instr(url, '://') + 3), '/', 1) AS host,
         substring(substring(url, instr(url, '://') + 3),
                   length(split_part(substring(url, instr(url, '://') + 3), '/', 1)) + 1) AS path
  FROM read_parquet('{cd}/cdx.parquet')
)""".strip()


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1/A7: grouped aggregation with exact-arithmetic outputs
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


def q_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: the HBaseStatusCountJob shape
    return _t(spark, sf_dir, "events").groupBy(F.col("event_type").alias("status")).agg(
        F.count("*").alias("n")
    )


def q_hit_rate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7: hit-rate by source (integer outputs; no float aggregation)
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_totalprice") > 100000.0, 1).otherwise(0)).alias("n_hit"),
        F.count("*").alias("n_total"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-rule core: per-host quota scheduling, skew-safe ranking
    from sandcrawler_spark.operators.politeness import schedule_politeness

    urls = _urls(spark, sf_dir)
    robots = (
        urls.select("host", "site_id")
        .distinct()
        .select(
            "host",
            (F.lit(1) + (F.col("site_id") % 4)).cast("int").alias("max_parallel"),
            F.lit(0.5).alias("crawl_delay_s"),
            F.array().cast("array<string>").alias("disallow_prefixes"),
        )
    )
    sched = schedule_politeness(urls.select("url", "host", "priority"), robots)
    return sched.select(
        "url",
        "host",
        "priority",
        F.col("quota").cast("int").alias("quota"),
        F.col("crawl_round").cast("int").alias("crawl_round"),
        F.col("seq_in_round").cast("int").alias("seq_in_round"),
    )


def q_politeness_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # crawl-delay budget: quota = min(max_parallel, floor(window/delay))
    # — hosts with long Crawl-delay get their per-round quota capped
    from sandcrawler_spark.operators.politeness import schedule_politeness

    urls = _urls(spark, sf_dir)
    robots = (
        urls.select("host", "site_id")
        .distinct()
        .select(
            "host",
            (F.lit(2) + (F.col("site_id") % 6)).cast("int").alias("max_parallel"),
            (F.lit(10.0) * (1 + F.col("site_id") % 8)).alias("crawl_delay_s"),
            F.array().cast("array<string>").alias("disallow_prefixes"),
        )
    )
    sched = schedule_politeness(urls.select("url", "host", "priority"), robots, round_window_s=60.0)
    return sched.select(
        "url",
        "host",
        F.col("quota").cast("int").alias("quota"),
        F.col("crawl_round").cast("int").alias("crawl_round"),
    )


def q_politeness_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event-time politeness enforcement: the static (round, seq) budget
    # realized as planned fetch timestamps, rolled up by the event-time
    # window layer — no host window may exceed its quota
    from sandcrawler_spark.operators.politeness import planned_fetch_times, schedule_politeness
    from sandcrawler_spark.streaming.eventtime import windowed_host_rates

    urls = _urls(spark, sf_dir)
    robots = (
        urls.select("host", "site_id")
        .distinct()
        .select(
            "host",
            (F.lit(2) + (F.col("site_id") % 6)).cast("int").alias("max_parallel"),
            (F.lit(10.0) * (1 + F.col("site_id") % 8)).alias("crawl_delay_s"),
            F.array().cast("array<string>").alias("disallow_prefixes"),
        )
    )
    sched = schedule_politeness(urls.select("url", "host", "priority"), robots, round_window_s=60.0)
    timed = planned_fetch_times(sched, epoch="2024-01-01 00:00:00", round_window_s=60.0)
    rates = windowed_host_rates(timed, ts_col="planned_ts", host_col="host", window="60 seconds")
    quotas = sched.groupBy("host").agg(F.max("quota").alias("quota"))
    epoch_s = F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("long")
    return rates.join(quotas, on="host").select(
        "host",
        ((F.col("window_start").cast("long") - epoch_s) / 60).cast("int").alias("window_idx"),
        F.col("n_fetched").cast("bigint").alias("n_fetched"),
        F.col("quota").cast("int").alias("quota"),
        (F.col("n_fetched") <= F.col("quota")).alias("ok"),
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robots.txt parsing over SQL-constructed bodies: agent-specific
    # group beats '*', crawl-delay floats, empty files permissive
    from sandcrawler_spark.functions.robots import robots_udf

    urls = _urls(spark, sf_dir)
    hosts = urls.select("host", "site_id").distinct()
    sid = F.col("site_id")
    body = (
        F.when(sid % 3 == 0, F.concat(
            F.lit("User-agent: sandcrawler\nDisallow: /admin/\nCrawl-delay: "),
            sid.cast("string"),
            F.lit("\n\nUser-agent: *\nDisallow: /private/\nCrawl-delay: 99"),
        ))
        .when(sid % 3 == 1, F.concat(
            F.lit("User-agent: *\nDisallow: /tmp/\nDisallow: /p/"), sid.cast("string"), F.lit("/\n"),
        ))
        .otherwise(F.lit(""))
    )
    df = hosts.select("host", "site_id", F.encode(body, "utf-8").alias("body"))
    p = df.select("host", robots_udf(F.col("body"), F.lit("sandcrawler/2.0")).alias("r"))
    return p.select(
        "host",
        F.col("r.crawl_delay_s").alias("crawl_delay_s"),
        F.size("r.disallow_prefixes").alias("n_disallow"),
        F.try_element_at("r.disallow_prefixes", F.lit(1)).alias("first_disallow"),
        F.col("r.n_groups").alias("n_groups"),
    )


def q_robots_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 9309 §2.2.2 rule matching: '*'/'$' wildcards, longest rule
    # wins, Allow beats Disallow on ties; site_id%4==3 hosts have no
    # rules and exercise the plain-prefix fast path
    from sandcrawler_spark.functions.robots import robots_disallowed_col

    urls = _urls(spark, sf_dir)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    path = (
        F.when(k % 5 == 0, F.concat(F.lit("/admin/r"), ks))
        .when(k % 5 == 1, F.concat(F.lit("/order/"), ks, F.lit(".php")))
        .when(k % 5 == 2, F.concat(F.lit("/fishing/"), ks))
        .when(k % 5 == 3, F.concat(F.lit("/docs/p"), ks, F.lit(".htm")))
        .otherwise(F.concat(F.lit("/order/"), ks))
    )
    m = F.col("site_id") % 4
    empty = F.array().cast("array<string>")
    dis = (
        F.when(m == 0, F.array(F.lit("/admin"), F.lit("/*.php$")))
        .when(m == 1, F.array(F.lit("/fish*"), F.lit("/*.htm")))
        .when(m == 2, F.array(F.lit("/")))
        .otherwise(empty)
    )
    alw = (
        F.when(m == 0, F.array(F.lit("/admin/public")))
        .when(m == 1, F.array(F.lit("/docs/")))
        .when(m == 2, F.array(F.lit("/order")))
        .otherwise(empty)
    )
    df = urls.select(
        "host",
        k.cast("bigint").alias("o_orderkey"),
        path.alias("path"),
        dis.alias("d"),
        alw.alias("a"),
    )
    return df.select(
        "host",
        "o_orderkey",
        "path",
        robots_disallowed_col(F.col("path"), F.col("d"), F.col("a")).alias("disallowed"),
    )


def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    # soft-404 detection: 200-status pages whose content is an error
    # page — anchored title tier, tiny-error-body tier, hard non-200s
    # pass through as NULL (already classified)
    from sandcrawler_spark.functions.soft404 import soft404_reason_col

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    status = (
        F.when(k % 7 == 2, 404).when(k % 7 == 5, 500).otherwise(200)
    ).cast("int")
    title = (
        F.when(k % 7 == 0, F.lit("404 Page Not Found"))
        .when(k % 7 == 3, F.concat(F.lit("Understanding Error 404 Handling #"), ks))
        .otherwise(F.concat(F.lit("Document "), ks))
    )
    body = (
        F.when(k % 7 == 1, F.lit("Sorry, the page you requested was not found on this server."))
        .when(k % 7 == 4, F.lit("This article does not exist anymore."))
        .when(k % 7 == 3, F.concat(
            F.col("text"),
            F.lit(" A misconfigured server returns error 404 pages for valid URLs."),
        ))
        .otherwise(F.col("text"))
    )
    f = d.select(
        k.cast("bigint").alias("doc_id"),
        status.alias("status"),
        title.alias("title"),
        body.alias("body"),
    )
    reason = soft404_reason_col(F.col("status"), F.col("title"), F.col("body"))
    return f.select(
        "doc_id",
        "status",
        reason.alias("reason"),
        reason.isNotNull().alias("is_soft404"),
    )


def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    # encoding repair: UTF-8-read-as-cp1252 mojibake is synthesized
    # with the engine's own make_mojibake_col (m in {0,3}) and must
    # round-trip back to the clean text; m==1 is plain ASCII (no
    # indicator), m==2 holds a GENUINE '€' that must NOT be touched
    # (its bytes don't form valid UTF-8)
    from sandcrawler_spark.functions.encoding import (
        fix_mojibake_col,
        make_mojibake_col,
    )

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    m = k % 4
    clean = (
        F.when(m == 0, F.concat(F.lit("café "), F.col("text"), F.lit(" — déjà vu €9")))
        .when(m == 1, F.col("text"))
        .when(m == 2, F.concat(F.lit("real € stays: "), F.col("text")))
        .otherwise(F.concat(F.lit("naïve "), F.col("text")))
    )
    broken = F.when(m.isin(0, 3), make_mojibake_col(clean)).otherwise(clean)
    f = d.select(
        k.cast("bigint").alias("doc_id"),
        clean.alias("clean"),
        broken.alias("broken"),
    ).withColumn("fixed", fix_mojibake_col(F.col("broken")))
    return f.select(
        "doc_id",
        "broken",
        "fixed",
        (F.col("fixed") == F.col("clean")).alias("recovered"),
    )


def q_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # public-suffix (eTLD+1) extraction: politeness/budget grouping key
    # at domain granularity — exercises exact rules at 1/2/3 labels,
    # the *.ck wildcard, the !www.ck exception, private hosting
    # suffixes (github.io), and the implicit-'*' unknown-TLD path
    from sandcrawler_spark.functions.psl import with_registered_domain

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    m = k % 8
    host = (
        F.when(m == 0, F.concat(F.lit("shop"), ks, F.lit(".example.com")))
        .when(m == 1, F.concat(F.lit("news"), ks, F.lit(".bbc.co.uk")))
        .when(m == 2, F.concat(F.lit("u"), ks, F.lit(".github.io")))
        .when(m == 3, F.concat(F.lit("api"), ks, F.lit(".company.com.au")))
        .when(m == 4, F.concat(F.lit("w"), ks, F.lit(".site.ck")))
        .when(m == 5, F.lit("www.ck"))
        .when(m == 6, F.concat(F.lit("node"), ks, F.lit(".compute.amazonaws.com")))
        .otherwise(F.concat(F.lit("intranet"), ks, F.lit(".unknowntld")))
    )
    df = o.select(k.cast("bigint").alias("o_orderkey"), host.alias("host"))
    return with_registered_domain(df, "host").select(
        "o_orderkey", "host", "public_suffix", "registered_domain"
    )


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6: frontier minus seen-set (exact left-anti path)
    from sandcrawler_spark.operators.seen import unseen_exact

    urls = _urls(spark, sf_dir)
    frontier = urls.select(F.col("url").alias("canon_url"))
    seen = urls.filter(F.col("o_orderkey") % 3 == 0).select(F.col("url").alias("canon_url"))
    return unseen_exact(frontier, seen, "canon_url").select(F.col("canon_url").alias("url"))


def q_seen_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scale path: partitioned-bloom prefilter + exact rescue; equals
    # q_seen_antijoin by construction (same oracle SQL)
    from sandcrawler_spark.operators.seen import build_bloom, unseen_bloom_exact

    urls = _urls(spark, sf_dir)
    frontier = urls.select(F.col("url").alias("canon_url"))
    seen = urls.filter(F.col("o_orderkey") % 3 == 0).select(F.col("url").alias("canon_url"))
    # size the bloom from the parquet row count (footer-stats-only job)
    # instead of letting build_bloom count the filtered/projected seen
    # set — sizing only needs an estimate (the exact rescue corrects
    # any extra false positives)
    n_orders = _t(spark, sf_dir, "orders").count()
    bloom = build_bloom(
        seen, "canon_url", n_buckets=32,
        expected_keys_per_bucket=max(64, n_orders // 3 // 32 + 1),
    )
    return unseen_bloom_exact(frontier, seen, bloom, "canon_url", 32).select(
        F.col("canon_url").alias("url")
    )


def q_seen_cuckoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the deletable seen-set half of the north star's "bloom/cuckoo"
    # pair: build over seen, EVICT the recrawl-due slice (orderkey%9 —
    # the delete a bloom cannot do), then prefilter+exact-rescue. The
    # oracle is the plain anti-join vs (seen minus evicted).
    from sandcrawler_spark.operators.cuckoo import (
        build_cuckoo,
        delete_cuckoo,
        unseen_cuckoo_exact,
    )

    urls = _urls(spark, sf_dir)
    frontier = urls.select(F.col("url").alias("canon_url"))
    seen0 = urls.filter(F.col("o_orderkey") % 3 == 0)
    evicted = seen0.filter(F.col("o_orderkey") % 9 == 0).select(
        F.col("url").alias("canon_url")
    )
    seen0 = seen0.select(F.col("url").alias("canon_url"))
    n_orders = _t(spark, sf_dir, "orders").count()
    ck = build_cuckoo(
        seen0, "canon_url", n_buckets=32,
        expected_keys_per_bucket=max(64, n_orders // 3 // 32 + 1),
    )
    ck = delete_cuckoo(ck, evicted, "canon_url", 32)
    seen1 = seen0.exceptAll(evicted)
    return unseen_cuckoo_exact(frontier, seen1, ck, "canon_url", 32).select(
        F.col("canon_url").alias("url")
    )


def q_best_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: lookup_best composite ranking over the derived capture index
    from sandcrawler_spark.operators.bestcapture import lookup_best

    caps = _captures(spark, sf_dir)
    best = lookup_best(caps, best_mimetype="click")
    return best.select("url", "datetime", "event_id", "status_code", "mimetype")


def q_asof_closest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the closest-timestamp (as-of) join
    from sandcrawler_spark.operators.bestcapture import lookup_closest

    caps = _captures(spark, sf_dir)
    targets = (
        caps.select("url")
        .distinct()
        .withColumn("target_dt", F.to_timestamp(F.lit("2024-01-15 12:00:00")))
    )
    got = lookup_closest(caps, targets)
    return got.select("url", "datetime", "event_id")


def q_paper_filter_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F2/F3 + A4 + W2: the filter-cdx-paper-pdfs pig slice — heuristic
    # URL regex filter, one row per content hash, crawl order columns
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    path_name = F.regexp_replace(F.col("p_name"), " ", "-")
    url = F.when(
        pk % 3 == 0,
        F.concat(
            F.lit("https://journal"), (pk % 20).cast("string"), F.lit(".edu/pubs/10."),
            (F.lit(1000) + pk % 9000).cast("string"), F.lit("/"), path_name,
        ),
    ).otherwise(
        F.concat(F.lit("https://site"), (pk % 20).cast("string"), F.lit(".com/items/"), path_name)
    )
    dt = F.date_format(F.date_add(F.lit("2024-01-01").cast("date"), (pk % 365).cast("int")), "yyyyMMdd000000")
    doc_hash = F.md5(F.concat(F.col("p_name"), F.lit("|"), F.col("p_brand")))
    df = p.select(url.alias("url"), dt.alias("datetime"), doc_hash.alias("doc_hash"))
    df = df.filter(
        F.col("url").rlike("/(pubs|research|publications|articles|papers|fulltext)/")
        | F.col("url").rlike(r"/10\.[0-9]{3,5}/")
    )
    w = Window.partitionBy("doc_hash").orderBy("datetime", "url")
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def q_tarball_filter_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4 + A4 + W2: the filter-cdx-tarball.pig slice — archive mimetype
    # + .tar.gz URL filter, one row per content hash, deterministic
    # global (surt, datetime) order
    from sandcrawler_spark.operators.cdxslice import cdx_variant_slice

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    suffix = (
        F.when(pk % 4 == 0, ".tar.gz").when(pk % 4 == 1, ".pdf")
        .when(pk % 4 == 2, ".py").otherwise("")
    )
    mime = (
        F.when(pk % 5 == 0, "application/gzip")
        .when(pk % 5 == 1, "application/octet-stream")
        .when(pk % 5 == 2, "application/pdf")
        .when(pk % 5 == 3, "text/plain")
        .otherwise("application/x-gtar")
    )
    cdx = p.select(
        F.concat(
            F.lit("com,example,site"), (pk % 20).cast("string"), F.lit(")/files/"),
            F.regexp_replace(F.col("p_name"), " ", "-"), suffix,
        ).alias("surt"),
        F.date_format(F.date_add(F.lit("2024-01-01").cast("date"), (pk % 365).cast("int")), "yyyyMMdd000000").alias("datetime"),
        mime.alias("mimetype"),
        F.when(pk % 13 == 0, 404).otherwise(200).alias("status_code"),
        F.md5(F.concat(F.col("p_name"), F.lit("|"), (pk % 4).cast("string"))).alias("sha1hex"),
    )
    out = cdx_variant_slice(cdx, "tarball", n_partitions=8)
    return out.select("surt", "datetime", "sha1hex")


def q_surt_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C1/C3: clean_url + SURT + host over messy URL variants
    from sandcrawler_spark.functions.urls import clean_url_udf, host_col, surt_udf

    urls = _urls(spark, sf_dir)
    pk = F.col("o_orderkey")
    sid = F.col("site_id").cast("string")
    raw = (
        F.when(pk % 5 == 0, F.concat(F.lit("HTTPS://WWW.Site"), sid, F.lit(".Example.COM/Order/"), pk.cast("string")))
        .when(pk % 5 == 1, F.concat(F.lit("https://site"), sid, F.lit(".example.com:443/order/"), pk.cast("string")))
        .otherwise(F.concat(F.lit("https://site"), sid, F.lit(".example.com/order/"), pk.cast("string")))
    )
    df = urls.select(raw.alias("raw_url"))
    return df.select(
        "raw_url",
        clean_url_udf(F.col("raw_url")).alias("canon_url"),
        surt_udf(F.col("raw_url")).alias("surt"),
        host_col(F.col("raw_url")).alias("host"),
    )


def q_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.functions.textstats import char_count_col, word_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count_col(F.col("text")).alias("n_words"),
        char_count_col(F.col("text")).cast("long").alias("n_chars_calc"),
    )


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch reading-ease / FK grade level in integer micro-units —
    # deterministic vowel-group syllable proxy, pure Catalyst
    from sandcrawler_spark.functions.textstats import readability

    return readability(_t(spark, sf_dir, "documents"))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.functions.textstats import (
        punct_ratio_col,
        quality_score_col,
        stopword_ratio_col,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(stopword_ratio_col(F.col("text")), 6).alias("stopword_ratio"),
        F.round(punct_ratio_col(F.col("text")), 6).alias("punct_ratio"),
        F.round(quality_score_col(F.col("text")), 6).alias("quality"),
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE-ish LLM token budgeting — pure Catalyst regexp_count
    from sandcrawler_spark.functions.textstats import bpe_token_count_col, word_count_col

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_token_count_col(F.col("text")).cast("int").alias("n_bpe_tokens"),
        word_count_col(F.col("text")).alias("n_words"),
    )


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # winnowing (rolling-hash) fingerprints as (doc, fingerprint) rows
    from sandcrawler_spark.functions.textstats import winnow_fingerprints

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnow_fingerprints(d, k=5, w=4)


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-defined chunking dedupe: shift-resilient chunk-hash
    # duplication report (window=16, expected chunk ~64 chars)
    from sandcrawler_spark.operators.cdc import cdc_dedupe_stats

    return cdc_dedupe_stats(
        _t(spark, sf_dir, "documents"), window=16, divisor=64, min_occurrences=2
    )


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc top-3 TF-IDF keywords, integer micro-nat idf, skew-safe
    # df aggregate + doc-bounded window
    from sandcrawler_spark.operators.search import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=3)


def q_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # inverted-index build, rolled up per term: (term, doc_freq,
    # corpus_tf) for terms appearing in >= 10 docs
    from sandcrawler_spark.operators.search import build_postings

    d = _t(spark, sf_dir, "documents")
    return (
        build_postings(d, min_doc_freq=10)
        .groupBy("term")
        .agg(
            F.max("doc_freq").alias("doc_freq"),
            F.sum("tf").cast("long").alias("corpus_tf"),
        )
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 ranked retrieval: query = the corpus's own top-3
    # non-stopword terms (self-contained + deterministic), k=15
    from sandcrawler_spark.functions.textstats import EN_STOPWORDS
    from sandcrawler_spark.operators.search import bm25_topk, top_terms

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, top_terms(d, n=3, exclude=EN_STOPWORDS), k=15)


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # positional phrase matching for the corpus's own most frequent
    # bigram (deterministic tiebreak) — self-contained like bm25_search
    from sandcrawler_spark.operators.lm import train_bigram_lm
    from sandcrawler_spark.operators.search import phrase_search

    d = _t(spark, sf_dir, "documents")
    bi, _, _ = train_bigram_lm(d)
    top = bi.orderBy(F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc()).take(1)[0]
    return phrase_search(d, [top.w1, top.w2])


def q_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bigram-LM perplexity filter: train on the corpus, score every
    # doc's log-prob in integer micro-nats (CCNet-style quality gate)
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm

    d = _t(spark, sf_dir, "documents")
    bi, uni, vocab = train_bigram_lm(d)
    return lm_score_docs(d, bi, uni, vocab)


def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unicode NFC: decomposed 'e'+U+0301 prefixes (m==1) must hash
    # identically to composed U+00E9 ones (m==2) after normalization;
    # the ASCII fast path keeps the Arrow UDF off m==0 rows entirely
    from sandcrawler_spark.functions.unicode_norm import is_nfc_col, nfc_col

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    m = k % 3
    raw = (
        F.when(m == 1, F.concat(F.lit("café naivë "), F.col("text")))
        .when(m == 2, F.concat(F.lit("café naivë "), F.col("text")))
        .otherwise(F.col("text"))
    )
    f = d.select(k.cast("bigint").alias("doc_id"), raw.alias("raw"))
    norm = F.when(is_nfc_col(F.col("raw")), F.col("raw")).otherwise(
        nfc_col(F.col("raw"))
    )
    return f.select(
        "doc_id",
        norm.alias("normalized"),
        (norm != F.col("raw")).alias("changed"),
        F.md5(norm).alias("norm_md5"),
    )


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet's head/middle/tail split: per-language perplexity tertiles
    # over the bigram-LM scores — the rank is the skew-safe
    # ranked_within_key (a dominant language never serializes into
    # one window task), per-lang sizes broadcast back
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm
    from sandcrawler_spark.operators.politeness import ranked_within_key

    d = _t(spark, sf_dir, "documents")
    bi, uni, vocab = train_bigram_lm(d)
    scored = lm_score_docs(d, bi, uni, vocab).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    ranked = ranked_within_key(
        scored, "lang", prio_col="logprob_micronat", tiebreak="doc_id"
    )
    n = scored.groupBy("lang").agg(F.count("*").alias("_n"))
    out = ranked.join(F.broadcast(n), "lang")
    b = F.expr("(rank_in_key * 3) div _n")
    return out.select(
        "doc_id",
        "lang",
        "logprob_micronat",
        F.when(b == 0, "head").when(b == 1, "middle").otherwise("tail").alias("bucket"),
    )


def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4 line/page cleaning rules (Raffel et al. 2020 §2.2) over the
    # persisted seed-42 corpus pages' extracted text (real newline +
    # sentence structure); clean_md5 gives byte-level verification
    from sandcrawler_spark.functions.c4filters import with_c4_verdict

    p = _corpus(spark)["pages"].filter(F.col("text").isNotNull())
    return with_c4_verdict(p, "text").select(
        "url", "n_lines", "n_lines_kept", "n_sentences",
        "clean_words", "clean_md5", "page_kept",
    )


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/GPT-3-style linear quality classifier: closed-form NB
    # trained distributed on lang=='en' as the positive class, every
    # doc scored by integer micro-nat log-odds under the model
    from sandcrawler_spark.operators.quality_clf import (
        nb_score_docs,
        train_nb_classifier,
    )

    d = _t(spark, sf_dir, "documents")
    w = train_nb_classifier(
        d.withColumn("_label", (F.col("lang") == "en").cast("int")), "_label"
    )
    return nb_score_docs(d, w)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR importance weights: hashed-unigram LMs for the in-domain
    # target (English docs) and the raw corpus; every doc scored by
    # its integer micro-nat log importance ratio toward the target
    from sandcrawler_spark.operators.dsir import dsir_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_weights(d, d.filter(F.col("lang") == "en"))


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-target anchor-text profile from raw HTML (count, distinct
    # texts, modal text); the oracle rebuilds the anchors RELATIONALLY
    # from lineitem/supplier/nation, so the regexp extraction must
    # recover (href, text) pairs exactly
    from sandcrawler_spark.operators.linkgraph import (
        anchor_summary,
        extract_anchor_texts,
    )

    return anchor_summary(extract_anchor_texts(_link_pages(spark, sf_dir)))


def q_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    # z-order layout end-to-end: write events Morton-clustered on
    # (user_id, minute-of-month), manifest-prune a 2-dim box query,
    # aggregate the survivors — the result must equal a plain filter
    # (pruning may only skip files, never change answers)
    import os as _os

    from sandcrawler_spark.plans.zorder import pruned_read, write_zordered

    e = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        ((F.unix_timestamp("ts") - F.unix_timestamp(
            F.lit("2024-01-01 00:00:00").cast("timestamp"))) / 60)
        .cast("long").alias("minute"),
    )
    path = _os.path.join(
        "/tmp", "sandcrawler_zorder", _os.path.basename(_os.path.normpath(sf_dir))
    )
    write_zordered(e, path, "user_id", "minute", n_files=16)
    hit = pruned_read(spark, path, a_range=(10, 24), b_range=(2_000, 20_000))
    return (
        hit.filter(
            F.col("user_id").between(10, 24) & F.col("minute").between(2_000, 20_000)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


def q_host_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # water-filling round-budget arbitration: per-host URL demand vs a
    # global fetch budget of 10k — small hosts satisfied, big hosts
    # capped at the common water level, exact integer total
    from sandcrawler_spark.operators.budget import allocate_budget

    demands = _urls(spark, sf_dir).groupBy("host").agg(
        F.count("*").cast("long").alias("demand")
    )
    return allocate_budget(demands, 10_000)


_CONTEXT_WINDOW = 256


def q_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence packing, concat-and-slice (the GPT-2/Pile layout): docs
    # concatenated in stable doc_id order and sliced into fixed
    # context windows — each doc's token span and the window range it
    # crosses, from ONE global cumsum (no driver loop, no per-bin
    # sequential fill); `div` keeps the window ids integer-exact at
    # offsets past 2^53 where double math would drift
    from sandcrawler_spark.functions.textstats import word_count_col
    from sandcrawler_spark.operators.cumsum import global_cumsum

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        word_count_col(F.col("text")).cast("long").alias("n_tokens"),
    )
    c = global_cumsum(d, [F.col("doc_id").asc()], "n_tokens", out_col="cum")
    return c.withColumn("tok_start", F.col("cum") - F.col("n_tokens")).select(
        "doc_id",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start div {_CONTEXT_WINDOW}").alias("win_start"),
        F.expr(f"(cum - 1) div {_CONTEXT_WINDOW}").alias("win_end"),
    )


def q_domain_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PSL x water-filling composition: fetch budget arbitrated at
    # REGISTERED-DOMAIN granularity — 4 fat domains (every shop<k>
    # subdomain collapses into example.com) against thousands of
    # singleton github.io-style sites; hosts that ARE a public suffix
    # (registered_domain NULL) can't hold budget and are excluded
    from sandcrawler_spark.operators.budget import allocate_budget

    base = q_registered_domain(spark, sf_dir)
    demands = (
        base.filter(F.col("registered_domain").isNotNull())
        .groupBy(F.col("registered_domain").alias("host"))
        .agg(F.count("*").cast("long").alias("demand"))
    )
    return allocate_budget(demands, 8_000).withColumnRenamed("host", "domain")


def q_cumulative_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed global running total (range shuffle + partition
    # cumsums + broadcast offsets — no single-task window stage);
    # integer cents keep it engine-exact
    from sandcrawler_spark.operators.cumsum import global_cumsum

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return global_cumsum(
        e, [F.col("ts").asc(), F.col("event_id").asc()], "cents", out_col="cum_cents"
    ).select("event_id", "cum_cents")


def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token-budget corpus packing: rank docs by quality (integer
    # micro score, deterministic tiebreak), admit in rank order until
    # the 20k-token budget is crossed — greedy mixture assembly as a
    # global cumsum + threshold, no driver loop
    from sandcrawler_spark.functions.textstats import (
        quality_score_col,
        word_count_col,
    )
    from sandcrawler_spark.operators.cumsum import global_cumsum

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(quality_score_col(F.col("text")) * 1_000_000)
        .cast("long")
        .alias("q_micro"),
        word_count_col(F.col("text")).cast("long").alias("n_tokens"),
    )
    c = global_cumsum(
        d,
        [F.col("q_micro").desc(), F.col("doc_id").asc()],
        "n_tokens",
        out_col="cum_tokens",
    )
    return c.filter(F.col("cum_tokens") <= 20_000).select(
        "doc_id", "q_micro", "n_tokens", "cum_tokens"
    )


def q_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact distributed percentiles (linear interpolation — the same
    # definition DuckDB's quantile_cont uses) per event type
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed BPE tokenizer training: 6 merge rounds over the
    # corpus vocabulary; each round's winner depends on the previous
    # round's rebuilt state, so the oracle check compounds
    from sandcrawler_spark.operators.bpe import bpe_learn

    return bpe_learn(_t(spark, sf_dir, "documents"), k=6)


_BPE_ENCODE_MERGES = [("a", "t"), ("e", "r"), ("s", "c"), ("at", "a"), ("o", "w")]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizer ENCODE step: apply a fixed ordered merge list to the
    # corpus vocabulary (bpe_merges trains; this segments) — the
    # ('at','a') merge compounds on round 1's output ('data' ->
    # d|at|a -> d|ata), so the check exercises merge ordering
    from sandcrawler_spark.operators.bpe import bpe_segment

    seg = bpe_segment(_t(spark, sf_dir, "documents"), _BPE_ENCODE_MERGES)
    return seg.select(
        "word",
        "freq",
        F.size("units").cast("long").alias("n_units"),
        F.array_join("units", " ").alias("units"),
    )


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap-based sessionization of the event stream (session_window —
    # the same operator runs stateful over a watermarked stream)
    from sandcrawler_spark.streaming.eventtime import sessionize

    e = _t(spark, sf_dir, "events")
    return sessionize(e, key_col="user_id", ts_col="ts", gap="30 minutes", value_col="value")


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding-cosine near-dup: planted exact duplicates must pair with
    # their originals at cosine 1.0 through the LSH-bucketed self-join
    from sandcrawler_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    aug = e.unionByName(dups)
    dim = _emb_dim(spark, sf_dir)
    return embedding_neardup_pairs(aug, dim=dim, threshold=0.95, n_planes=8, seed=42)


# multilingual plant phrases, explicit escapes (editor-safe): Russian
# "privet mir", Han text, Arabic "marhaba" — each replaces the body so
# its script dominates
_CYR_PHRASE = "Привет мир"
_HAN_PHRASE = "中文文档内容"
_ARA_PHRASE = "مرحبا بالعالم"


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unicode writing-system router: planted Cyrillic/Han/Arabic docs
    # (doc_id % 4) must profile to their script; the rest stay Latin
    from sandcrawler_spark.functions.script import script_profile

    d = _t(spark, sf_dir, "documents")
    t = (
        F.when(F.col("doc_id") % 4 == 1, F.repeat(F.lit(_CYR_PHRASE + " "), 30))
        .when(F.col("doc_id") % 4 == 2, F.repeat(F.lit(_HAN_PHRASE), 40))
        .when(F.col("doc_id") % 4 == 3, F.repeat(F.lit(_ARA_PHRASE + " "), 25))
        .otherwise(F.col("text"))
    )
    return script_profile(
        d.select(F.col("doc_id").cast("bigint").alias("doc_id"), t.alias("text"))
    )


_LANG_PLANTS = {
    1: "der hund und die katze ist nicht ein tier mit auf sich",
    2: "le chat est dans les maisons que pour une qui pas",
    3: "el gato es una de las casas que por con para los",
    4: "il gatto che non sono per una con del di gli",
    5: "zz qq xx vv ww yy kk jj",
}


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-language closed-class-word ID: planted de/fr/es/it docs
    # must classify to their language, gibberish to 'und', the
    # untouched English corpus text to 'en'
    from sandcrawler_spark.functions.script import lang_profile

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    for m, phrase in _LANG_PLANTS.items():
        t = F.when(F.col("doc_id") % 6 == m, F.repeat(F.lit(phrase + " "), 10)).otherwise(t)
    return lang_profile(
        d.select(F.col("doc_id").cast("bigint").alias("doc_id"), t.alias("text"))
    )


def _lang_profile_oracle(min_hits_ppm: int = 40_000) -> str:
    """lang_profile twin: same tokenization, per-language constant
    word lists, integer ppm, max + first-match priority tie-break."""
    from sandcrawler_spark.functions.script import _LANG_PRIORITY, LANG_STOPWORDS

    plants = "\n           ".join(
        f"WHEN {m} THEN repeat('{p} ', 10)" for m, p in _LANG_PLANTS.items()
    )
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({LANG_STOPWORDS[lg]!r}, t))) AS BIGINT) AS h_{lg}"
        for lg in _LANG_PRIORITY
    )
    ppm_cols = ",\n         ".join(
        f"CASE WHEN n_tokens > 0 THEN (h_{lg} * CAST(1000000 AS BIGINT)) // n_tokens ELSE 0 END AS {lg}_ppm"
        for lg in _LANG_PRIORITY
    )
    max_ppm = f"GREATEST({', '.join(lg + '_ppm' for lg in _LANG_PRIORITY)})"
    chain = "\n            ".join(
        f"WHEN {lg}_ppm = mx THEN '{lg}'" for lg in _LANG_PRIORITY
    )
    cols = ", ".join(lg + "_ppm" for lg in _LANG_PRIORITY)
    return f"""
WITH lp_docs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE CAST(doc_id % 6 AS INT)
           {plants}
           ELSE text END AS t
  FROM documents
),
lp_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS toks
  FROM lp_docs
),
lp_hits AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         {hit_cols}
  FROM lp_tok
),
lp_ppm AS (
  SELECT doc_id, n_tokens,
         {ppm_cols}
  FROM lp_hits
),
lp_mx AS (SELECT *, {max_ppm} AS mx FROM lp_ppm)
SELECT doc_id, n_tokens, {cols},
       CASE WHEN n_tokens = 0 OR mx < {min_hits_ppm} THEN 'und'
            {chain}
       END AS lang_pred
FROM lp_mx
"""


def _lang_mismatch_oracle(min_hits_ppm: int = 40_000) -> str:
    """lang_mismatch twin: lang_profile's stopword-hit pipeline over
    the persisted corpus pages, grouped declared-vs-predicted (the
    mime_sniff report shape)."""
    from sandcrawler_spark.functions.script import _LANG_PRIORITY, LANG_STOPWORDS

    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({LANG_STOPWORDS[lg]!r}, t))) AS BIGINT) AS h_{lg}"
        for lg in _LANG_PRIORITY
    )
    ppm_cols = ",\n         ".join(
        f"CASE WHEN n_tokens > 0 THEN (h_{lg} * CAST(1000000 AS BIGINT)) // n_tokens ELSE 0 END AS {lg}_ppm"
        for lg in _LANG_PRIORITY
    )
    max_ppm = f"GREATEST({', '.join(lg + '_ppm' for lg in _LANG_PRIORITY)})"
    chain = "\n            ".join(
        f"WHEN {lg}_ppm = mx THEN '{lg}'" for lg in _LANG_PRIORITY
    )
    plants = "\n           ".join(
        f"WHEN {m} THEN text || ' ' || repeat('{p} ', 8)"
        for m, p in _LANG_PLANTS.items()
    )
    return f"""
WITH {_corpus_oracle_tables()},
lm_docs AS (
  SELECT url, lang AS declared,
         CASE CAST(CAST('0x' || substr(md5(url), 1, 4) AS UBIGINT) % 6 AS INT)
           {plants}
           ELSE text END AS text
  FROM c_pages
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
lm_tok AS (
  SELECT url, declared,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM lm_docs
),
lm_hits AS (
  SELECT url, declared, CAST(len(toks) AS BIGINT) AS n_tokens,
         {hit_cols}
  FROM lm_tok
),
lm_ppm AS (
  SELECT url, declared, n_tokens,
         {ppm_cols}
  FROM lm_hits
),
lm_mx AS (SELECT *, {max_ppm} AS mx FROM lm_ppm),
lm_pred AS (
  SELECT url, declared,
         CASE WHEN n_tokens = 0 OR mx < {min_hits_ppm} THEN 'und'
            {chain}
         END AS predicted
  FROM lm_mx
)
SELECT declared, predicted, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(CASE WHEN declared <> predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
FROM lm_pred GROUP BY declared, predicted
"""


def _script_oracle() -> str:
    """script_profile twin: the same hex ranges in RE2 syntax, the
    same first-match dominance chain and integer ppm."""
    from sandcrawler_spark.functions.script import _PRIORITY, SCRIPT_RANGES

    def re2(body: str) -> str:
        return "".join(
            f"\\x{{{ord(ch):04X}}}" if ord(ch) > 127 else ch for ch in body
        )

    cnt_cols = ",\n         ".join(
        f"CAST(len(regexp_extract_all(t, '[{re2(SCRIPT_RANGES[s])}]')) AS BIGINT) AS {s}_n"
        for s in _PRIORITY
    )
    total = " + ".join(f"{s}_n" for s in _PRIORITY)
    max_c = f"GREATEST({', '.join(s + '_n' for s in _PRIORITY)})"
    dom_chain = "\n            ".join(
        f"WHEN {s}_n = mx THEN '{s}'" for s in _PRIORITY
    )
    cols = ", ".join(s + "_n" for s in _PRIORITY)
    return f"""
WITH sdocs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 1 THEN repeat('{_CYR_PHRASE} ', 30)
           WHEN 2 THEN repeat('{_HAN_PHRASE}', 40)
           WHEN 3 THEN repeat('{_ARA_PHRASE} ', 25)
           ELSE text END AS t
  FROM documents
),
scnts AS (SELECT doc_id, {cnt_cols} FROM sdocs),
stot AS (SELECT *, CAST({total} AS BIGINT) AS n_letters, {max_c} AS mx FROM scnts)
SELECT doc_id, {cols}, n_letters,
       CASE WHEN n_letters = 0 THEN 'none'
            {dom_chain}
       END AS dominant_script,
       CASE WHEN n_letters > 0 THEN (mx * CAST(1000000 AS BIGINT)) // n_letters
            ELSE 0 END AS dominant_ppm
FROM stot
"""


def q_corpus_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source dataset-card stats: trigram diversity (template-farm
    # detector) + bytes-per-token fertility, integer fixed-point
    from sandcrawler_spark.operators.diagnostics import corpus_diagnostics

    return corpus_diagnostics(_t(spark, sf_dir, "documents"), key_col="source")


def q_quality_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Borda rank-fusion of three incomparable per-doc signals (token
    # count, type-token ratio, punctuation count): one range-shuffle
    # global rank per signal via global_cumsum, never a single-task
    # window; rank 1 = best, ties by doc_id
    from sandcrawler_spark.functions.textstats import tokens_col
    from sandcrawler_spark.operators.diagnostics import borda_fuse

    d = _t(spark, sf_dir, "documents")
    toks = tokens_col(F.lower(F.col("text")))
    sig = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(filter(split(lower(text), '\\\\s+'), x -> x != ''))) AS BIGINT)"
            " * CAST(1000000 AS BIGINT)"
            " div greatest(CAST(size(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS BIGINT), 1)"
        ).alias("ttr_ppm"),
        F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")).cast("long").alias("n_punct"),
    )
    return borda_fuse(sig, ["n_tokens", "ttr_ppm", "n_punct"])


def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order-independent per-source content checksum (the shard
    # publication receipt): sum of 60-bit row digests mod 2^61-1
    from sandcrawler_spark.operators.diagnostics import corpus_manifest

    return corpus_manifest(_t(spark, sf_dir, "documents"), key_col="source")


def q_topic_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D4-style topic rebalancing: trained k-means cells as strata,
    # count^0.7 temperature rates, deterministic md5 keep pass
    from sandcrawler_spark.operators.similarity import cluster_balanced_sample

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cluster_balanced_sample(
        e, total_budget=300, alpha=0.7, kmeans_iters=2, centroid_mod=50
    )


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # leakage-safe train/val/test split hashed at SOURCE granularity:
    # every doc of one source rides the same split, so near-dups
    # within a site never straddle train and the eval sets
    from sandcrawler_spark.operators.sampling import leakage_safe_split

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source"
    )
    return leakage_safe_split(d, "source", val_ppm=150_000, test_ppm=150_000)


def q_semantic_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup: k-means cells bound the pairwise cosine, eps-graph
    # components collapse to min-id representatives — the planted
    # exact duplicates (vec_id+10000 clones) must land in their
    # original's cell and dedupe onto the original id
    from sandcrawler_spark.operators.similarity import semantic_dedupe

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return semantic_dedupe(
        e.unionByName(dups), eps=0.95, kmeans_iters=2, centroid_mod=50
    )


def q_lang_pred_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.functions.textstats import lang_id_en_score_col

    d = _t(spark, sf_dir, "documents")
    pred = F.when(lang_id_en_score_col(F.col("text")) >= 0.08, "en").otherwise("other")
    return d.groupBy(F.col("lang"), pred.alias("pred")).agg(F.count("*").alias("n"))


def q_fingerprint_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.operators.dedupe import exact_dedupe

    d = _t(spark, sf_dir, "documents")
    return exact_dedupe(d, "text", "doc_id")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SCALE path: LSH block -> exact jaccard verify only on
    # candidates (the crossJoin fallback exists for tiny inputs but is
    # deliberately not what the driver exercises)
    from sandcrawler_spark.operators.dedupe import lsh_candidates, ngram_jaccard_pairs

    docs = _aug_docs(spark, sf_dir)
    cands = lsh_candidates(docs, n_shingle=3, k=8, bands=4)
    return ngram_jaccard_pairs(docs, n_shingle=3, threshold=0.5, candidates=cands)


def q_line_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # within-doc line dedup (RefinedWeb/FineWeb): planted boilerplate
    # lines (share button twice, cookie notice twice) collapse to
    # their first occurrence, order preserved
    from sandcrawler_spark.operators.dedupe import dedupe_lines_within_doc

    d = _t(spark, sf_dir, "documents")
    ks = F.col("doc_id").cast("string")
    t = F.concat(
        F.lit("Share on Facebook\n"),
        F.col("text"),
        F.lit("\nShare on Facebook\nCookie notice\nCookie notice\n"),
        ks,
    )
    f = d.select(F.col("doc_id").cast("bigint").alias("doc_id"), t.alias("text"))
    return dedupe_lines_within_doc(f)


def _bp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source site template planted deterministically: an 80%-of-
    # docs header pair (doc_id % 5 != 0) and a 100% footer — the mined
    # table must recover exactly these and nothing from the bodies
    d = _t(spark, sf_dir, "documents")
    hdr = F.concat(
        F.lit("Top stories from "), F.col("source"),
        F.lit("\nSubscribe to "), F.col("source"), F.lit(" premium\n"),
    )
    t = F.concat(
        F.when(F.col("doc_id") % 5 != 0, hdr).otherwise(F.lit("")),
        F.col("text"),
        F.lit("\n(c) 2024 "), F.col("source"), F.lit(" media"),
    )
    return d.select(
        F.col("source").alias("host"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        t.alias("text"),
    )


def q_host_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-document site-template mining: per-host line document
    # frequency with an integer >= 50%-of-docs cut (the corpus-level
    # cleanup within-doc line dedup can't see)
    from sandcrawler_spark.operators.boilerplate import host_boilerplate_lines

    return host_boilerplate_lines(_bp_docs(spark, sf_dir), min_pct=50, min_docs=3)


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mine + strip roundtrip: planted headers/footers removed from
    # every doc, body lines untouched, order preserved
    from sandcrawler_spark.operators.boilerplate import (
        host_boilerplate_lines,
        strip_boilerplate,
    )

    docs = _bp_docs(spark, sf_dir)
    bp = host_boilerplate_lines(docs, min_pct=50, min_docs=3)
    return strip_boilerplate(docs, bp)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # directional containment on the SAME LSH blocks: the planted dups
    # are originals + an appended tail, so containment(orig in dup)
    # ~= 1.0 even where symmetric jaccard dips below its threshold
    from sandcrawler_spark.operators.dedupe import (
        lsh_candidates,
        ngram_containment_pairs,
    )

    docs = _aug_docs(spark, sf_dir)
    cands = lsh_candidates(docs, n_shingle=3, k=8, bands=4)
    return ngram_containment_pairs(
        docs, n_shingle=3, threshold=0.9, candidates=cands
    )


def q_dedupe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocking recall of banded LSH vs exact all-pairs jaccard truth
    # (>= 0.5), for two band configs — the recall knob measured as a
    # driver query (more bands of fewer rows => higher recall, more
    # candidates). Integer micro recall keeps it engine-exact.
    from sandcrawler_spark.operators.dedupe import lsh_candidates, ngram_jaccard_pairs

    docs = _aug_docs(spark, sf_dir)
    truth = ngram_jaccard_pairs(docs, n_shingle=3, threshold=0.5).select("id_a", "id_b")
    rows = []
    for label, bands in (("lsh_b4", 4), ("lsh_b8", 8)):
        cands = lsh_candidates(docs, n_shingle=3, k=8, bands=bands)
        found = truth.join(cands, on=["id_a", "id_b"], how="left_semi")
        rows.append(
            truth.agg(F.count("*").cast("long").alias("n_true"))
            .crossJoin(found.agg(F.count("*").cast("long").alias("n_found")))
            .select(
                F.lit(label).alias("method"),
                "n_true",
                "n_found",
                F.floor(F.col("n_found") * 1_000_000 / F.col("n_true"))
                .cast("long")
                .alias("recall_micro"),
            )
        )
    return rows[0].unionByName(rows[1])


def q_neardup_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end near-dup dedup: LSH candidates -> jaccard verify ->
    # connected components -> min-id representative per cluster
    from sandcrawler_spark.operators.dedupe import neardup_dedupe

    docs = _aug_docs(spark, sf_dir)
    return neardup_dedupe(docs, n_shingle=3, k=8, bands=4, threshold=0.5)


def _structured_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic multi-line structure: the synth
    corpus has no newlines, so line/paragraph operators get text
    rebuilt as 4 lines — two content slices (the second repeating the
    doc's opening words, planting intra-doc n-gram repetition), a
    boilerplate line shared by EVERY doc (cross-doc paragraph dup),
    and for every third doc the boilerplate repeated (intra-doc line
    dup). Mirrored exactly by the _STRUCT_DOCS_CTE DuckDB twin."""
    boiler = "cookie notice accept all cookies"
    t = F.col("text")
    structured = F.concat(
        F.substring(t, 1, 60), F.lit("\n"),
        F.lit(boiler), F.lit("\n"),
        F.substring(t, 61, 120), F.lit(" "), F.substring(t, 1, 30), F.lit("\n"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(boiler)).otherwise(
            F.substring(t, 121, 60)
        ),
    )
    return _t(spark, sf_dir, "documents").select("doc_id", structured.alias("text"))


_STRUCT_DOCS_CTE = """
struct_docs AS (
  SELECT doc_id,
         substr(text, 1, 60) || chr(10) ||
         'cookie notice accept all cookies' || chr(10) ||
         substr(text, 61, 120) || ' ' || substr(text, 1, 30) || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN 'cookie notice accept all cookies'
              ELSE substr(text, 121, 60) END AS text
  FROM documents
)
"""


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher repetition gates (dup lines / top 2-gram / dup 5-grams)
    # over the structured corpus — explode+groupBy shapes, no nested
    # array-lambda O(n^2) traps
    from sandcrawler_spark.functions.repetition import gopher_repetition

    return gopher_repetition(_structured_docs(spark, sf_dir), top_n=2, dup_n=5)


def q_paragraph_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-global paragraph dedupe: first occurrence (doc_id, pos)
    # wins; every doc keeps its surviving paragraphs in order
    from sandcrawler_spark.operators.dedupe import paragraph_dedupe

    return paragraph_dedupe(_structured_docs(spark, sf_dir))


def q_span_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ExactSubstr-style global span dedupe at 8-gram granularity over
    # the augmented corpus (planted full-text duplicates get their
    # copied spans stripped; originals survive untouched)
    from sandcrawler_spark.operators.dedupe import span_dedupe

    return span_dedupe(_aug_docs(spark, sf_dir), n=8)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant deterministic PII on every 4th doc, count + redact; output
    # the redacted text's md5 so byte-level redaction is oracle-checked
    from sandcrawler_spark.functions.pii import pii_counts, redact_pii_col

    d = _t(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or +14155550"),
            (F.lit(100) + F.col("doc_id") % 900).cast("string"),
            F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".77"),
        ),
    ).otherwise(F.col("text"))
    d = d.select("doc_id", planted.alias("text"))
    cnts = pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        cnts["n_emails"].cast("int").alias("n_emails"),
        cnts["n_phones"].cast("int").alias("n_phones"),
        cnts["n_ipv4"].cast("int").alias("n_ipv4"),
        F.md5(redact_pii_col(F.col("text"))).alias("redacted_md5"),
    )


def _warc_build(spark: SparkSession, sf_dir: str):
    """Deterministic WARC files from documents (Catalyst concat/encode,
    8 files × 25 records) plus the CDX-style index a crawler writes at
    archive time: (path, offset, url, digest) per record, offsets from
    a window cumulative sum. Returns (blobs, cdx)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://site"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "),
        F.octet_length("text").cast("string"), F.lit("\r\n\r\n"), F.col("text"),
    )
    head = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
        F.lit("\r\nWARC-Date: 2020-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(url, F.lit(" 2020-01-01T00:00:00Z"))),
        F.lit(">\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        F.octet_length(http).cast("string"), F.lit("\r\n\r\n"),
    )
    recs = d.select(
        (F.col("doc_id") % 8).alias("file_id"),
        "doc_id",
        url.alias("url"),
        F.md5("text").alias("digest"),
        F.concat(head, http, F.lit("\r\n\r\n")).alias("rec"),
    )
    blobs = (
        recs.groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                    lambda s: s["rec"],
                ),
                "",
            ).alias("blob_str")
        )
        .select(
            F.concat(F.lit("warc/part-"), F.col("file_id").cast("string"),
                     F.lit(".warc")).alias("path"),
            F.encode("blob_str", "utf-8").alias("content"),
        )
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("file_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdx = recs.select(
        F.concat(F.lit("warc/part-"), F.col("file_id").cast("string"),
                 F.lit(".warc")).alias("path"),
        F.coalesce(F.sum(F.octet_length("rec")).over(win), F.lit(0)).alias("offset"),
        "url", "digest",
    )
    return blobs, cdx


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WARC codec end-to-end: build multi-record WARC files JVM-side,
    # parse them back with the mapInPandas record scanner, emit
    # per-record fields incl. byte offsets; the oracle recomputes every
    # field (offsets included) from documents
    from sandcrawler_spark.sources.warcfmt import scan_warc_blobs

    blobs, _ = _warc_build(spark, sf_dir)
    return scan_warc_blobs(blobs).select(
        "path", "rec_offset", "target_uri", "warc_date",
        "http_status", "mime", "rec_content_length", "payload_md5",
    )


def q_warc_fetch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the reference's petabox fetch addressing (ia.py fetch_petabox:
    # look up a record by (warc_path, offset), verify the CDX digest
    # against the fetched payload) as a distributed equi-join between
    # the CDX index and the parsed WARC records
    from sandcrawler_spark.sources.warcfmt import scan_warc_blobs

    blobs, cdx = _warc_build(spark, sf_dir)
    parsed = scan_warc_blobs(blobs).select(
        F.col("path").alias("p_path"), "rec_offset",
        "http_status", "mime", "payload_md5",
    )
    return cdx.join(
        parsed,
        (cdx["path"] == parsed["p_path"]) & (cdx["offset"] == parsed["rec_offset"]),
        "inner",
    ).select(
        "url", "path", "offset",
        (F.col("digest") == F.col("payload_md5")).alias("digest_ok"),
        "http_status", "mime",
    )


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic stratified corpus sampling: level every language to
    # ~20 docs; every keep decision is md5-replayable in the oracle
    from sandcrawler_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample_rates,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    rates = stratified_sample_rates(d, "lang", target_per_key=20)
    out = deterministic_sample(d, rates, key_col="lang", id_col="doc_id")
    return out.select(
        "doc_id", "lang",
        F.round("rate", 6).alias("rate"),
        F.round("u", 6).alias("u"),
        "kept",
    )


def q_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # benchmark decontamination: flag docs sharing any 8-gram with the
    # "benchmark" slice (docs 0-4); bench gram-set broadcasts
    from sandcrawler_spark.operators.dedupe import benchmark_decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 5).select("text")
    return benchmark_decontaminate(docs, bench, n=8, min_hits=1)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.operators.dedupe import lsh_candidates

    docs = _aug_docs(spark, sf_dir)
    return lsh_candidates(docs, n_shingle=3, k=8, bands=4)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle replays the md5 bit-vote in DuckDB (get_bit over unhex'd
    # md5 + HUGEINT shifts), validated byte-exact vs the pandas UDF
    from sandcrawler_spark.operators.dedupe import simhash_pairs

    docs = _aug_docs(spark, sf_dir)
    return simhash_pairs(docs, max_hamming=7)


def q_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # brute-force cosine top-k, rounded before ranking so the oracle
    # ranks identically despite last-ulp float differences
    from sandcrawler_spark.operators.similarity import cosine_sim_col

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    j = e.join(F.broadcast(queries))
    sim = F.round(cosine_sim_col(F.col("embedding"), F.col("q_vec")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.select("q_id", "vec_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle rebuilds the seeded md5 hyperplanes in SQL (hex->uint32)
    # and replays the sign-bit bucketing + in-bucket cosine rank
    from sandcrawler_spark.operators.similarity import ann_lsh

    e = _t(spark, sf_dir, "embeddings")
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dim = _emb_dim(spark, sf_dir)
    return ann_lsh(sample, e, dim=dim, k=3, n_planes=4, seed=42)


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-probe recall knob: every 1-bit-flipped signature probed too
    from sandcrawler_spark.operators.similarity import ann_lsh

    e = _t(spark, sf_dir, "embeddings")
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dim = _emb_dim(spark, sf_dir)
    return ann_lsh(sample, e, dim=dim, k=3, n_planes=4, seed=42, multiprobe=True)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF coarse-quantizer ANN: id-mod centroids, nprobe=2 cells probed
    from sandcrawler_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(sample, e, k=3, centroid_mod=25, nprobe=2)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall@5 of every ANN method vs the exact top-5 (the knobs'
    # benefit measured as a driver query, not just asserted in pytest);
    # ivf_trained uses deterministic 2-iteration k-means centroids
    from sandcrawler_spark.operators.similarity import (
        ann_lsh,
        ivf_topk,
        kmeans_centroids,
        knn_join,
    )

    e = _t(spark, sf_dir, "embeddings")
    sample = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dim = _emb_dim(spark, sf_dir)
    truth = knn_join(sample, e, k=5).select("q_id", "vec_id")
    km = kmeans_centroids(e, n_iters=2, centroid_mod=25)
    methods = [
        ("lsh", ann_lsh(sample, e, dim=dim, k=5, n_planes=4, seed=42)),
        ("lsh_multiprobe", ann_lsh(sample, e, dim=dim, k=5, n_planes=4, seed=42, multiprobe=True)),
        ("ivf", ivf_topk(sample, e, k=5, centroid_mod=25, nprobe=2)),
        ("ivf_trained", ivf_topk(sample, e, k=5, centroid_mod=25, nprobe=2, centroids=km)),
        # the recall/cost knob: doubling nprobe probes 4/25 of the
        # cells and should lift recall well past the nprobe=2 tier
        ("ivf_trained_nprobe4", ivf_topk(sample, e, k=5, centroid_mod=25, nprobe=4, centroids=km)),
    ]
    union = None
    for name, df in methods:
        part = df.select(F.lit(name).alias("method"), "q_id", "vec_id")
        union = part if union is None else union.unionByName(part)
    tn = truth.agg(F.count("*").alias("_nt"))
    hits = (
        union.join(truth, on=["q_id", "vec_id"], how="inner")
        .groupBy("method")
        .agg(F.count("*").alias("_nh"))
    )
    names = spark.createDataFrame([(n,) for n, _ in methods], ["method"])
    return (
        names.join(hits, on="method", how="left")
        .crossJoin(tn)
        .select(
            "method",
            F.col("_nt").cast("bigint").alias("n_truth"),
            F.coalesce("_nh", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(F.coalesce("_nh", F.lit(0)) / F.col("_nt"), 4).alias("recall"),
        )
    )


_PQ_M = 8          # subspaces (64-dim corpus -> 8-dim subvectors)
_PQ_ITERS = 2      # Lloyd iterations per subspace
_PQ_KSUB = 16      # FIXED codewords per subspace (corpus-size-independent)
_PQ_CAP = 1024     # bounded training sample (stride = max(1, n // cap))
# r4 knob sweep used ksub ~= n/10 (unbounded — the r4 scale-killer);
# the fixed-ksub discipline here keeps codebook = m * ksub rows and
# training <= ~2*cap rows at ANY corpus size. At sf0.01 (n=500,
# stride=1) recall@5 with m=8/ksub=16 measures ~0.45 vs exact L2.


def _pq_book(spark: SparkSession, sf_dir: str):
    # memoized like _t: five PQ queries share one training run per
    # (session, sf) — the codebook is a pure function of the corpus,
    # so re-training per query was pure sweep fixed cost
    from sandcrawler_spark.operators.pq import collect_codebook, pq_train

    e = _t(spark, sf_dir, "embeddings")
    dim = _emb_dim(spark, sf_dir)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), "__pq_book__")
    if key not in _T_CACHE:
        cents = pq_train(e, dim=dim, m=_PQ_M, n_iters=_PQ_ITERS,
                         ksub=_PQ_KSUB, sample_cap=_PQ_CAP)
        _T_CACHE[key] = collect_codebook(cents, _PQ_M)
    return e, dim, _T_CACHE[key]


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PQ encode: per-subspace deterministic k-means codebook, then a
    # zero-shuffle literal-argmin encode pass; exploded to
    # (vec_id, sub, code) so the oracle hash is over plain ints
    from sandcrawler_spark.operators.pq import pq_encode

    e, dim, book = _pq_book(spark, sf_dir)
    codes = pq_encode(e, book, dim=dim)
    return codes.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.posexplode("codes").alias("sub", "code"),
    ).select(
        "vec_id", F.col("sub").cast("bigint").alias("sub"),
        F.col("code").cast("bigint").alias("code"),
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ADC search: 5 queries scan the compressed code table with a
    # per-query LUT; distances are integer micro-units end to end
    from sandcrawler_spark.operators.pq import pq_adc_topk, pq_encode

    e, dim, book = _pq_book(spark, sf_dir)
    codes = pq_encode(e, book, dim=dim).localCheckpoint(eager=True)
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return pq_adc_topk(sample, codes, book, dim=dim, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("adist_micro").cast("bigint").alias("adist_micro"),
    )


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the billion-scale composite: IVF coarse routing (id-mod cells,
    # nprobe=2) + ADC code scan INSIDE the probed cells only — per
    # query nprobe/ncells of the m-byte code table is touched
    from sandcrawler_spark.operators.pq import ivfpq_topk

    e, dim, book = _pq_book(spark, sf_dir)
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivfpq_topk(sample, e, book, dim=dim, k=5, centroid_mod=25, nprobe=2).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("adist_micro").cast("bigint").alias("adist_micro"),
    )


def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall@5 of the ADC scan vs the exact (micro-int) L2 top-5 —
    # the compression/accuracy trade measured as a driver query
    from sandcrawler_spark.operators.pq import (
        exact_l2_topk,
        pq_adc_topk,
        pq_encode,
    )

    e, dim, book = _pq_book(spark, sf_dir)
    codes = pq_encode(e, book, dim=dim).localCheckpoint(eager=True)
    sample = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = exact_l2_topk(sample, e, k=5).select("q_id", "vec_id")
    approx = pq_adc_topk(sample, codes, book, dim=dim, k=5).select("q_id", "vec_id")
    tn = truth.agg(F.count("*").alias("_nt"))
    hits = approx.join(truth, on=["q_id", "vec_id"], how="inner").agg(
        F.count("*").alias("_nh")
    )
    return hits.crossJoin(tn).select(
        F.lit("pq_adc").alias("method"),
        F.col("_nt").cast("bigint").alias("n_truth"),
        F.coalesce("_nh", F.lit(0)).cast("bigint").alias("n_hit"),
        F.round(F.coalesce("_nh", F.lit(0)) / F.col("_nt"), 4).alias("recall"),
    )


def q_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the r5 bounded-training receipt AS DATA: the trained codebook is
    # exactly m*ksub rows whatever the corpus size (fixed ksub, id-mod
    # sample, seeds = ksub smallest sampled ids); the oracle replays
    # training end-to-end, so a drifting seed/stride/fold would
    # hash-mismatch here directly, not just through the code table
    from sandcrawler_spark.operators.pq import pq_train

    e = _t(spark, sf_dir, "embeddings")
    dim = _emb_dim(spark, sf_dir)
    cents = pq_train(e, dim=dim, m=_PQ_M, n_iters=_PQ_ITERS,
                     ksub=_PQ_KSUB, sample_cap=_PQ_CAP)
    norm = F.round(
        F.aggregate(F.col("cv"), F.lit(0.0), lambda a, x: a + x * x) * 1_000_000
    ).cast("long")
    return cents.select(
        F.col("sub").cast("bigint").alias("sub"),
        F.col("code").cast("bigint").alias("code"),
        F.col("cent_id").cast("bigint").alias("cent_id"),
        norm.alias("cv_norm_micro"),
    )


def q_ivf_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the capped coarse quantizer AS DATA: per-cell member counts plus
    # the stride actually in effect (max(centroid_mod, ceil(n/max_cells))
    # — pq.py coarse_stride), so the cell-count cap that bounds the
    # centroid broadcast is oracle-checked, not just unit-tested
    from pyspark.sql import Window

    from sandcrawler_spark.operators.pq import coarse_stride
    from sandcrawler_spark.operators.similarity import cosine_sim_col

    e = _t(spark, sf_dir, "embeddings")
    stride = coarse_stride(e.count(), 25, 4096)
    cents = e.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    asg_w = Window.partitionBy("vec_id").orderBy(F.desc("_csim"), F.asc("cent_id"))
    assigned = (
        e.join(F.broadcast(cents))
        .withColumn("_csim", F.round(cosine_sim_col(F.col("embedding"), F.col("cent_vec")), 6))
        .withColumn("_rn", F.row_number().over(asg_w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "cent_id")
    )
    return assigned.groupBy(F.col("cent_id").cast("bigint").alias("cent_id")).agg(
        F.count("*").cast("long").alias("n_members")
    ).select("cent_id", "n_members", F.lit(stride).cast("long").alias("stride"))


_IVF_CELL_PROFILE_ORACLE = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
strd AS (SELECT GREATEST(25, CAST(ceil(COUNT(*) / 4096.0) AS BIGINT)) AS s FROM e),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM e, strd WHERE vec_id % strd.s = 0),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             round(list_reduce(list_transform(list_zip(e.v, c.cv), z -> z[1] * z[2]), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(e.v, t2 -> t2 * t2), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(c.cv, t2 -> t2 * t2), (x, y) -> x + y))), 6) DESC,
             c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
)
SELECT CAST(cent_id AS BIGINT) AS cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST((SELECT s FROM strd) AS BIGINT) AS stride
FROM assigned GROUP BY cent_id
""".strip()


def q_slug_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4 + C10/C11: self-join on title slug, Levenshtein-scored
    from sandcrawler_spark.operators.score import self_group_works

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    titled = p.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("title"))
    return self_group_works(titled, min_score=0)


def q_score_insertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5 + F11/F12: quality-gated grobid x crossref slug-score join,
    # then CDX metadata attach on the content hash
    from sandcrawler_spark.operators.score import score_insertable_join

    # partkey < 500: TPC-H part names draw 5 words from ~90 colors, so
    # slugs collide heavily — the full table would blow the blocked
    # join to ~1M pairs, noise for a correctness query
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    pk = F.col("p_partkey")
    sha1 = F.md5(F.concat(F.col("p_name"), F.lit("|g")))
    grobid = p.select(
        sha1.alias("sha1hex"),
        F.col("p_name").alias("title"),
        F.when(pk % 11 == 0, 500).otherwise(200).alias("status_code"),
    )
    crossref = p.select(
        pk.alias("id"),
        F.col("p_name").alias("title"),
        F.when(pk % 7 == 0, "component").otherwise("journal-article").alias("release_type"),
    )
    cdx = p.select(
        sha1.alias("sha1hex"),
        F.lit("application/pdf").alias("mimetype"),
        (pk % 1000).cast("long").alias("warc_csize"),
    ).distinct()
    return score_insertable_join(grobid, crossref, cdx)


def q_batch_dedupe_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J10: in-batch dedupe by PK, last-write-wins
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyyMMdd").alias("order_day"),
        )
    )


def q_recrawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J7: ingest_request ⟕ ingest_file_result staleness/retry selection
    from sandcrawler_spark.operators.frontier import build_frontier

    urls = _urls(spark, sf_dir)
    reqs = urls.select(
        F.lit("syn").alias("link_source"),
        F.col("o_orderkey").cast("string").alias("link_source_id"),
        F.lit("pdf").alias("ingest_type"),
        F.col("url").alias("base_url"),
        F.lit("bulk").alias("ingest_request_source"),
        F.col("o_orderdate").alias("created"),
        F.lit(None).cast("string").alias("release_stage"),
        F.lit(None).cast("string").alias("request"),
        F.col("priority"),
        F.lit(0).alias("link_depth"),
    )
    results = urls.filter(F.col("o_orderkey") % 2 == 0).select(
        F.lit("pdf").alias("ingest_type"),
        F.col("url").alias("base_url"),
        F.when(F.col("o_orderstatus") == "F", "success")
        .when(F.col("o_orderstatus") == "O", "no-capture")
        .otherwise("terminal-bad-status")
        .alias("status"),
        F.col("o_orderdate").alias("updated"),
    )
    out = build_frontier(
        reqs,
        results,
        now_expr="timestamp'1998-01-01 00:00:00'",
        fresh_for_hours=24,
        give_up_after_days=1000,
    )
    return out.select("base_url", "priority", F.col("retry").cast("int").alias("retry"), "surt", "host")


# ---------------------------------------------------------------------------
# Link-graph family: synthetic multi-tier page HTML -> outlink
# extraction (Catalyst regexp) -> BFS link-depth -> fixed-point host
# PageRank -> frontier priority blend. The Spark path goes through raw
# HTML; the oracle recomputes the edge set RELATIONALLY from the same
# tables (independent derivation, not a regex replay).
# ---------------------------------------------------------------------------

def _part_url(c):
    return F.concat(
        F.lit("https://site"), (c % 50).cast("int").cast("string"),
        F.lit(".example.com/part/"), c.cast("string"),
    )


def _supp_url(c):
    return F.concat(
        F.lit("https://site"), (c % 50).cast("int").cast("string"),
        F.lit(".example.com/supplier/"), c.cast("string"),
    )


def _link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, html:binary) four page tiers whose hrefs encode the
    order -> part -> supplier -> nation -> region relations, plus a
    root-relative '/about' link on every order page (exercises
    relative resolution). Deterministic: link lists sorted by key."""
    urls = _urls(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")

    def _agg_links(pairs: DataFrame, src: str, key: str, lnk, txt=None) -> DataFrame:
        txt = F.lit("x") if txt is None else txt
        return (
            pairs.withColumn(
                "_lnk",
                F.concat(F.lit('<a href="'), lnk, F.lit('">'), txt, F.lit("</a>")),
            )
            .groupBy(src)
            .agg(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col(key), F.col("_lnk")))),
                        lambda s: s["_lnk"],
                    ),
                ).alias("_links")
            )
        )

    # anchor texts are RELATION-DERIVED (not constants) so the
    # anchor-text aggregation oracle can rebuild them independently:
    # order pages call a part "part N" or (every 3rd order) "item N"
    op = _agg_links(
        li.select("l_orderkey", "l_partkey").distinct(),
        "l_orderkey", "l_partkey", _part_url(F.col("l_partkey")),
        txt=F.concat(
            F.when(F.col("l_orderkey") % 3 == 0, F.lit("item ")).otherwise(
                F.lit("part ")
            ),
            F.col("l_partkey").cast("string"),
        ),
    )
    order_pages = (
        urls.join(op, urls["o_orderkey"] == op["l_orderkey"], "left")
        .select(
            "url",
            F.concat(
                F.lit('<html><body><a href="/about">about</a>'),
                F.coalesce(F.col("_links"), F.lit("")),
                F.lit("</body></html>"),
            ).alias("page"),
        )
    )
    ps = _agg_links(
        li.select("l_partkey", "l_suppkey").distinct(),
        "l_partkey", "l_suppkey", _supp_url(F.col("l_suppkey")),
        txt=F.concat(F.lit("supplier "), F.col("l_suppkey").cast("string")),
    )
    part_pages = ps.select(
        _part_url(F.col("l_partkey")).alias("url"),
        F.concat(F.lit("<html><body>"), F.col("_links"), F.lit("</body></html>")).alias("page"),
    )
    supplier_pages = _t(spark, sf_dir, "supplier").select(
        _supp_url(F.col("s_suppkey")).alias("url"),
        F.concat(
            F.lit('<html><body><a href="https://nation'),
            F.col("s_nationkey").cast("string"), F.lit(".example.org/nation/"),
            F.col("s_nationkey").cast("string"), F.lit('">nation '),
            F.col("s_nationkey").cast("string"), F.lit("</a></body></html>"),
        ).alias("page"),
    )
    nation_pages = _t(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("https://nation"), F.col("n_nationkey").cast("string"),
            F.lit(".example.org/nation/"), F.col("n_nationkey").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<html><body><a href="https://region'),
            F.col("n_regionkey").cast("string"), F.lit(".example.org/region/"),
            F.col("n_regionkey").cast("string"), F.lit('">region '),
            F.col("n_regionkey").cast("string"), F.lit("</a></body></html>"),
        ).alias("page"),
    )
    pages = (
        order_pages.unionByName(part_pages)
        .unionByName(supplier_pages)
        .unionByName(nation_pages)
    )
    return pages.select("url", F.encode(F.col("page"), "utf-8").alias("html"))


def _outlink_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sandcrawler_spark.operators.linkgraph import extract_outlinks

    return extract_outlinks(_link_pages(spark, sf_dir))


def q_outlink_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # raw HTML -> href edges (codegen'd regexp + resolution); the
    # oracle derives the same edges relationally from lineitem/
    # supplier/nation — extraction must recover the relations exactly
    return _outlink_edges(spark, sf_dir)


def q_backlink_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reverse-graph frontier signals per target: in-degree, distinct
    # referring hosts (spam-resistant), stable exemplar referrer
    from sandcrawler_spark.operators.linkgraph import backlink_features

    return backlink_features(_outlink_edges(spark, sf_dir))


def q_link_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BFS min link-depth from the urgent-order seed set over the
    # extracted edge graph, bounded at 4 hops (crawl hop budget)
    from sandcrawler_spark.operators.linkgraph import link_depth_bfs

    seeds = _urls(spark, sf_dir).filter(F.col("priority") >= 5).select("url")
    return link_depth_bfs(seeds, _outlink_edges(spark, sf_dir), max_depth=4)


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-point weighted PageRank on the host contraction of the
    # link graph (deterministic integer arithmetic, 5 iterations)
    from sandcrawler_spark.operators.linkgraph import host_graph, host_pagerank

    return host_pagerank(host_graph(_outlink_edges(spark, sf_dir)))


def q_host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-core of the undirected host graph: synchronous peeling with a
    # driver-bounded round cap — the dense-subgraph (link-farm)
    # membership signal
    from sandcrawler_spark.operators.linkgraph import host_graph, host_kcore

    return host_kcore(host_graph(_outlink_edges(spark, sf_dir)), k=3, max_rounds=8)


def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS hubs & authorities on the host graph (fixed-point integer
    # half-steps with driver-collected scale factors, 3 iterations):
    # the hub/content split PageRank can't express
    from sandcrawler_spark.operators.linkgraph import host_graph, host_hits

    return host_hits(host_graph(_outlink_edges(spark, sf_dir)), n_iter=3)


def q_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TrustRank over the host graph: teleport restricted to the
    # curated .example.org directory hosts — spam-resistant crawl
    # priority (rank reachable only through link paths from the seeds)
    from sandcrawler_spark.operators.linkgraph import host_graph, trust_rank

    edges = host_graph(_outlink_edges(spark, sf_dir)).localCheckpoint(eager=True)
    trusted = edges.select(F.col("dst_host").alias("host")).unionByName(
        edges.select(F.col("src_host").alias("host"))
    ).distinct().filter(F.col("host").endswith(".example.org"))
    return trust_rank(edges, trusted)


def q_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weighted label propagation (3 sync rounds) on the host graph —
    # community structure for crawl sharding / spam-cluster triage
    from sandcrawler_spark.operators.linkgraph import host_graph, host_lpa

    return host_lpa(host_graph(_outlink_edges(spark, sf_dir)), n_rounds=3)


def q_page_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    # meta-robots gate: planted directive pages (both attribute
    # orders, bare/quoted names, the 'none' shorthand, a non-gating
    # noarchive) must parse to exact token-level flags
    from sandcrawler_spark.functions.pagerobots import page_robots

    u = _urls(spark, sf_dir).select("url", "o_orderkey")
    k = F.col("o_orderkey") % 5
    meta = (
        F.when(k == 0, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(k == 1, F.lit("<meta content='noarchive' name='robots'>"))
        .when(k == 2, F.lit('<meta name=robots content="none">'))
        .otherwise(F.lit(""))
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>t</title>"), meta,
            F.lit("</head><body></body></html>"),
        ),
        "utf-8",
    )
    return page_robots(u.select("url", html.alias("html")))


def q_nofollow_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rel=nofollow-aware edge extraction: per-anchor rel token match
    # (quoted multi-token and bare forms), RFC-3986 subset resolution
    from sandcrawler_spark.functions.pagerobots import outlinks_with_rel

    u = _urls(spark, sf_dir).select("url", "o_orderkey")
    k = F.col("o_orderkey").cast("string")
    html = F.encode(
        F.concat(
            F.lit('<a href="/article/'), k, F.lit('">read</a>'),
            F.lit('<a rel="nofollow noopener" href="/sponsored/'), k, F.lit('">ad</a>'),
            F.when(
                F.col("o_orderkey") % 3 == 0,
                F.concat(F.lit('<a rel=nofollow href="//ads.example.net/z/'), k, F.lit('">x</a>')),
            ).otherwise(F.lit("")),
        ),
        "utf-8",
    )
    return outlinks_with_rel(u.select("url", html.alias("html")))


def q_host_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bibliographic coupling: hosts sharing >= 2 out-link targets,
    # integer Jaccard ppm, celebrity targets capped out
    from sandcrawler_spark.operators.linkgraph import host_coupling, host_graph

    return host_coupling(
        host_graph(_outlink_edges(spark, sf_dir)), min_common=2, max_in_degree=1000
    )


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spam mass: the PR fraction not inherited from the trust seeds —
    # composes host_pagerank and trust_rank over the same host graph
    from sandcrawler_spark.operators.linkgraph import (
        host_graph,
        host_pagerank,
        spam_mass,
        trust_rank,
    )

    edges = host_graph(_outlink_edges(spark, sf_dir)).localCheckpoint(eager=True)
    trusted = (
        edges.select(F.col("dst_host").alias("host"))
        .unionByName(edges.select(F.col("src_host").alias("host")))
        .distinct()
        .filter(F.col("host").endswith(".example.org"))
    )
    return spam_mass(host_pagerank(edges), trust_rank(edges, trusted))


def q_opic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OPIC cash/history importance after 5 synchronous rounds — the
    # crawler-native adaptive priority signal; oracle unrolls the
    # identical integer cash ledger round by round
    from sandcrawler_spark.operators.linkgraph import host_graph, opic_scores

    return opic_scores(host_graph(_outlink_edges(spark, sf_dir)), n_iter=5)


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # link prediction: inverse-log-weighted common neighbors over the
    # undirected host graph, existing edges anti-joined away
    from sandcrawler_spark.operators.linkgraph import adamic_adar, host_graph

    return adamic_adar(host_graph(_outlink_edges(spark, sf_dir)))


def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dataset-card diversity: per-lang Shannon entropy of the source
    # mix in micro-nats, with the uniform ceiling alongside
    from sandcrawler_spark.operators.diagnostics import shannon_diversity

    return shannon_diversity(
        _t(spark, sf_dir, "documents"), key_col="source", group_col="lang"
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc char-level Shannon entropy (first 256 chars) — the
    # binary/compressed-content detector run before extraction
    from sandcrawler_spark.operators.diagnostics import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-lang generalized JS divergence between the even/odd crawl
    # halves' token distributions, integer micro-nats
    from sandcrawler_spark.operators.diagnostics import token_drift

    return token_drift(_t(spark, sf_dir, "documents"))


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zipf rank-frequency OLS fit (slope + r^2) over the top-1000
    # vocabulary, integer milli-nat moments
    from sandcrawler_spark.operators.diagnostics import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Common-Crawl-style snapshot delta: latest capture per URL before
    # vs after the split -> NEW/GONE/CHANGED/SAME
    from sandcrawler_spark.operators.recrawl import snapshot_diff

    return snapshot_diff(_captures(spark, sf_dir), "20240116000000")


def q_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup-rate-over-crawl diagnostic: per doc-id bucket, the ppm of
    # 8-gram instances whose gram first appears in that bucket
    from sandcrawler_spark.operators.novelty import novelty_curve

    return novelty_curve(_t(spark, sf_dir, "documents"), n=8, bucket_size=50)


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed integer covariance + driver power iteration: PC1 of
    # the embedding cloud at L-inf 1000, exact DuckDB twin
    from sandcrawler_spark.operators.pca import embedding_pca

    return embedding_pca(_t(spark, sf_dir, "embeddings"), n_iter=5)


def q_url_badwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RefinedWeb/UT1-style weighted URL soft blocklist over a planted
    # frontier slice: path suffixes keyed on o_orderkey % 6 exercise
    # every weight band (block / review / ok)
    from sandcrawler_spark.functions.urlfilter import (
        url_badword_score_col,
        url_badword_verdict_col,
    )

    u = _urls(spark, sf_dir).select("url", "o_orderkey")
    k = (F.col("o_orderkey") % 6).cast("int")
    planted = u.select(
        F.concat(
            F.col("url"),
            F.when(k == 0, F.lit("/casino-bonus-codes"))
            .when(k == 1, F.lit("/research/article"))
            .when(k == 2, F.lit("/free-download/win-prizes"))
            .when(k == 3, F.lit("/viagra-pills-online"))
            .when(k == 4, F.lit("/news/poker-tournament"))
            .otherwise(F.lit("")),
        ).alias("url")
    )
    score = url_badword_score_col(F.col("url"))
    return planted.select(
        "url",
        score.alias("badword_score"),
        url_badword_verdict_col(score).alias("verdict"),
    )


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chapman capture-recapture population estimate over the URL
    # universe from two salted-md5 samples (auditable: n_true ships)
    from sandcrawler_spark.operators.sketches import capture_recapture

    return capture_recapture(_urls(spark, sf_dir).select("url"), mod=10, keep=3)


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # power-law diagnostic: log2-binned in/out degree histogram of the
    # host graph, integer binning via binary-string length
    from sandcrawler_spark.operators.linkgraph import degree_distribution, host_graph

    return degree_distribution(host_graph(_outlink_edges(spark, sf_dir)))


def q_seed_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    # greedy max-coverage seed-host selection, 4 rounds, deterministic
    # argmax/tiebreak — oracle unrolls the same greedy rounds
    from sandcrawler_spark.operators.linkgraph import host_graph, seed_cover

    return seed_cover(host_graph(_outlink_edges(spark, sf_dir)), k=4)


def q_bowtie_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broder bow-tie macro-structure: CORE/IN/OUT/OTHER per host
    # relative to the max-degree pivot's bounded forward/backward reach
    from sandcrawler_spark.operators.linkgraph import bowtie_classes, host_graph

    return bowtie_classes(host_graph(_outlink_edges(spark, sf_dir)), max_rounds=8)


def q_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Newman modularity of the LPA communities, per community in
    # integer micro-units — the partition-quality receipt next to
    # host_communities
    from sandcrawler_spark.operators.linkgraph import (
        community_modularity,
        host_graph,
        host_lpa,
    )

    he = host_graph(_outlink_edges(spark, sf_dir)).localCheckpoint(eager=True)
    return community_modularity(he, host_lpa(he, n_rounds=3))


def q_reciprocal_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    # link-farm feature: per-host reciprocity of the distinct host
    # edge set, integer ppm (floor div)
    from sandcrawler_spark.operators.linkgraph import (
        host_graph,
        reciprocal_link_stats,
    )

    return reciprocal_link_stats(host_graph(_outlink_edges(spark, sf_dir)))


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # community-density spam signal: per-host triangle count +
    # clustering ppm via the degree-ordered edge iterator (bounded
    # wedge fan-out at celebrity hosts — operators/linkgraph.py)
    from sandcrawler_spark.operators.linkgraph import host_graph, host_triangles

    return host_triangles(host_graph(_outlink_edges(spark, sf_dir)))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis–Spirakis A-ES weighted sampling without replacement:
    # 200 docs drawn proportional to byte length, no rand(), global
    # top-k (TakeOrdered — no corpus shuffle)
    from sandcrawler_spark.operators.sampling import weighted_sample_topk

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("weight")
    )
    return weighted_sample_topk(d, "weight", k=200, id_col="doc_id").select(
        "doc_id", "weight", "key_micro"
    )


def _dust_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic capture log with planted URL-alias families
    # (tracking query, trailing slash, index file, www, port mirror),
    # each family sharing one content fingerprint
    u = _urls(spark, sf_dir).select("url", "o_orderkey", "site_id")
    fp = F.md5(F.concat(F.lit("dust:"), F.col("o_orderkey").cast("string")))
    caps = u.select("url", fp.alias("fingerprint"), "o_orderkey", "site_id")
    log = (
        caps.select("url", "fingerprint")
        .unionAll(
            caps.where(F.col("o_orderkey") % 3 == 0).select(
                F.concat("url", F.lit("?utm_source=feed")).alias("url"), "fingerprint"
            )
        )
        .unionAll(
            caps.where(F.col("o_orderkey") % 4 == 0).select(
                F.concat("url", F.lit("/")).alias("url"), "fingerprint"
            )
        )
        .unionAll(
            caps.where(F.col("o_orderkey") % 5 == 0).select(
                F.concat("url", F.lit("/index.html")).alias("url"), "fingerprint"
            )
        )
        .unionAll(
            caps.where(F.col("site_id") % 7 == 0).select(
                F.expr("replace(url, 'https://', 'https://www.')").alias("url"),
                "fingerprint",
            )
        )
        .unionAll(
            caps.where(F.col("o_orderkey") % 11 == 0).select(
                F.expr(
                    "replace(url, '.example.com/', '.example.com:8080/')"
                ).alias("url"),
                "fingerprint",
            )
        )
    )
    return log


def q_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DUST rule mining (Bar-Yossef WWW'07): recover the per-host
    # rewrite rules from the duplicate clusters alone (operators/dust.py)
    from sandcrawler_spark.operators.dust import dust_rules

    return dust_rules(
        _dust_log(spark, sf_dir), url_col="url", content_col="fingerprint",
        min_support=2,
    )


def q_dust_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mine -> apply roundtrip: actionable rules rewrite the alias
    # frontier to canonical spellings pre-fetch (case_fold and the
    # unmodeled port alias stay untouched by design)
    from sandcrawler_spark.operators.dust import apply_dust_rules, dust_rules

    log = _dust_log(spark, sf_dir)
    rules = dust_rules(log, url_col="url", content_col="fingerprint", min_support=2)
    return apply_dust_rules(log.select("url").distinct(), rules)


def q_canonical_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    # <link rel="canonical"> extraction: deterministic pages where
    # k%3==0 is a ?utm tracking alias declaring the bare URL (rel
    # before href), k%3==1 declares itself via a ROOT-RELATIVE href
    # (href before rel, single quotes), k%3==2 declares nothing —
    # extractor must hit both attribute orders + relative resolution
    from sandcrawler_spark.operators.linkgraph import extract_canonical

    u = _urls(spark, sf_dir).select("url", "o_orderkey")
    path = F.regexp_replace("url", r"^https?://[^/]+", "")
    page_url = F.when(
        F.col("o_orderkey") % 3 == 0, F.concat("url", F.lit("?utm_source=feed"))
    ).otherwise(F.col("url"))
    head = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit('<link rel="canonical" href="'), F.col("url"), F.lit('"/>')),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(F.lit("<link href='"), path, F.lit("' rel=canonical />")),
        )
        .otherwise(F.lit(""))
    )
    pages = u.select(
        page_url.alias("url"),
        F.encode(
            F.concat(F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")),
            "UTF-8",
        ).alias("html"),
    )
    return extract_canonical(pages)


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable decimal-HDR histogram percentiles (bounded-state
    # monitoring path next to the exact event_quantiles rollup);
    # pure string/integer bucketing, no libm (operators/histq.py)
    from sandcrawler_spark.operators.histq import (
        decimal_histogram,
        histogram_quantiles,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    h = decimal_histogram(e, "cents", ["event_type"])
    return histogram_quantiles(h, [0.5, 0.9, 0.99], ["event_type"])


def q_hyperball_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperBall neighborhood function + harmonic centrality over the
    # host graph (per-node HLL ball sketches iterated along edges —
    # |V| BFS runs collapsed into 3 joins; operators/hyperball.py)
    from sandcrawler_spark.operators.hyperball import hyperball
    from sandcrawler_spark.operators.linkgraph import host_graph

    return hyperball(
        host_graph(_outlink_edges(spark, sf_dir)), n_iter=3, p=8, direction="in"
    )


def q_adaptive_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AIMD per-host politeness adaptation: double on 429/503, additive
    # decrease on clean rounds, clamp to [250ms, 64s]; pure integer
    # CASE arithmetic (operators/politeness.py adapt_crawl_delays)
    from sandcrawler_spark.operators.politeness import adapt_crawl_delays

    e = _t(spark, sf_dir, "events")
    results = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias("host"),
        F.when(F.col("event_id") % 97 == 0, 429)
        .when(F.col("event_id") % 89 == 0, 503)
        .when(F.col("event_id") % 11 == 0, 404)
        .otherwise(200)
        .alias("status_code"),
    )
    current = (
        e.select((F.col("user_id") % 40).alias("hid"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host"),
            (F.lit(250) * (1 + F.col("hid") % 8)).cast("long").alias("crawl_delay_ms"),
        )
    )
    return adapt_crawl_delays(results, current)


def q_incremental_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # continuous-crawl rank maintenance: phase A ranks the graph as of
    # "yesterday" (a deterministic md5 slice of the edges, 3 cold
    # iterations), phase B folds in the new edges with 2 warm-started
    # iterations instead of a full recompute. The oracle replays both
    # phases CTE-for-CTE (tagged _pold / _pinc generators).
    from sandcrawler_spark.operators.linkgraph import (
        host_graph,
        host_pagerank,
        incremental_pagerank,
    )

    edges = _outlink_edges(spark, sf_dir)
    old = edges.filter(
        F.substring(F.md5(F.concat_ws("|", "src_url", "dst_url")), 1, 1) != "f"
    )
    prev = host_pagerank(host_graph(old), n_iter=3)
    return incremental_pagerank(host_graph(edges), prev, n_iter=2)


def q_frontier_rank_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the north-star priority triple blended into one integer crawl
    # score: request priority, BFS link depth, host-rank percentile
    from sandcrawler_spark.operators.linkgraph import (
        blend_priority,
        host_graph,
        host_pagerank,
        link_depth_bfs,
    )

    urls = _urls(spark, sf_dir)
    edges = _outlink_edges(spark, sf_dir).localCheckpoint(eager=True)
    seeds = urls.filter(F.col("priority") >= 5).select("url")
    depths = link_depth_bfs(seeds, edges, max_depth=4)
    ranks = host_pagerank(host_graph(edges))
    return blend_priority(
        urls.select("url", "host", "priority"), depths, ranks, max_depth=4
    )


def q_hll_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host distinct-URL estimate via the deterministic md5-HLL
    # sketch (p=6 here: the small-SF per-host cardinalities sit above
    # the raw estimator's ~2.5m bias floor at m=64; production default
    # is p=10)
    from sandcrawler_spark.operators.sketches import hll_cardinality

    urls = _urls(spark, sf_dir).select("host", "url")
    return hll_cardinality(urls, "url", ["host"], p=6)


def q_kmv_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host distinct-URL estimate via the KMV bottom-k sketch
    # (exact below k, (k-1)*2^60/h_k above; mergeable, set-operable —
    # the md5-deterministic complement to the HLL row above)
    from sandcrawler_spark.operators.sketches import kmv_cardinality

    urls = _urls(spark, sf_dir).select("host", "url")
    return kmv_cardinality(urls, "url", ["host"], k=64)


def q_sb_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stupid Backoff trigram LM (Brants et al. EMNLP'07): train count
    # tables on the corpus, score every doc in integer micro-nats —
    # the web-scale trigram upgrade of lm_doc_scores
    from sandcrawler_spark.operators.lm import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tri, bi, uni, totals = train_stupid_backoff(docs)
    return stupid_backoff_scores(docs, tri, bi, uni, totals)


def q_weighted_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language A-ES weighted draw (20 docs per lang, weight = byte
    # length) via the two-level skew-safe per-key top-k
    from sandcrawler_spark.operators.sampling import weighted_sample_per_key

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("long").alias("weight")
    )
    return weighted_sample_per_key(d, "lang", "weight", k=20, id_col="doc_id").select(
        "doc_id", "lang", "weight", "key_micro"
    )


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host URL overlap between two simulated crawl snapshots
    # (even orderkeys vs multiples of 3; truth = multiples of 6) via
    # KMV combined-bottom-k set intersection — the set op HLL can't do
    from sandcrawler_spark.operators.sketches import kmv_intersection

    urls = _urls(spark, sf_dir).select("host", "url", "o_orderkey")
    a = urls.where(F.col("o_orderkey") % 2 == 0).select("host", "url")
    b = urls.where(F.col("o_orderkey") % 3 == 0).select("host", "url")
    return kmv_intersection(a, b, "url", ["host"], k=64)


def q_cms_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count-min sketch frequency estimates for part-URL fetches (the
    # lineitem stream: one occurrence per order line), probed for the
    # first 100 parts alongside the exact counts — estimate >= truth
    # by construction, overshoot bounded by the sketch width
    from sandcrawler_spark.operators.sketches import cms_build, cms_estimate

    li = _t(spark, sf_dir, "lineitem").select(_part_url(F.col("l_partkey")).alias("url"))
    probes = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100).select(
        _part_url(F.col("p_partkey")).alias("url")
    )
    truth = li.groupBy("url").agg(F.count("*").cast("long").alias("true_count"))
    est = cms_estimate(probes, cms_build(li, "url"), "url")
    return (
        probes.join(truth, on="url", how="left")
        .join(est, on="url", how="inner")
        .select("url", F.coalesce("true_count", F.lit(0)).alias("true_count"), "cms_estimate")
    )


def q_url_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # crawl-trap template detection over the mixed frontier: the
    # /order/N template explodes per host (trap at cap 100), the
    # /part/N template stays under it (control)
    from sandcrawler_spark.operators.traps import detect_traps

    u = _urls(spark, sf_dir).select("host", "url")
    p = _t(spark, sf_dir, "part").select(
        _part_url(F.col("p_partkey")).alias("url"),
        F.concat(
            F.lit("site"), (F.col("p_partkey") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
    )
    return detect_traps(u.unionByName(p.select("host", "url")), max_urls_per_template=100)


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # temperature-weighted mixture (count^0.7) over host strata +
    # the deterministic md5-uniform keep pass; per-host audit row
    from sandcrawler_spark.operators.sampling import (
        deterministic_sample,
        temperature_sample_rates,
    )

    u = _urls(spark, sf_dir).select("url", "host")
    rates = temperature_sample_rates(u, "host", total_budget=5_000, alpha=0.7)
    tagged = deterministic_sample(u, rates, "host", id_col="url", seed="mix:42")
    kept = tagged.groupBy("host").agg(
        F.sum(F.col("kept").cast("long")).alias("n_kept")
    )
    return rates.join(kept, on="host", how="left").select(
        "host",
        "n_docs",
        "target",
        F.round("rate", 9).alias("rate"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def q_sitemap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host sitemap XML built from the frontier, then parsed back
    # through the codegen'd sitemap parser; the oracle derives the
    # expected rows relationally from the base tables (independent
    # path — it never touches XML)
    from sandcrawler_spark.functions.sitemaps import build_urlset_xml, parse_sitemap

    u = _urls(spark, sf_dir).filter(F.col("site_id") < 5)
    block = build_urlset_xml(
        F.col("url"),
        F.col("o_orderdate").cast("string"),
        F.concat(F.lit("0."), F.col("priority").cast("string")),
    )
    xml = u.select("host", F.col("o_orderkey"), block.alias("_b")).groupBy("host").agg(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("o_orderkey", "_b"))),
                    lambda s: s["_b"],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    return parse_sitemap(xml, "xml", keep_cols=["host"])


def q_feed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host RSS (even site_id) / Atom (odd site_id) feed XML built
    # from the frontier, parsed back through the codegen'd feed
    # parser; the oracle derives the expected rows relationally from
    # orders (independent path — it never touches XML)
    from sandcrawler_spark.functions.feeds import (
        build_atom_entry_xml,
        build_rss_item_xml,
        parse_feed,
    )

    u = _urls(spark, sf_dir).filter(F.col("site_id") < 6)
    okey = F.col("o_orderkey").cast("string")
    title = F.concat(F.lit("Order "), okey)
    date_s = F.col("o_orderdate").cast("string")
    eid = F.concat(F.lit("order-"), okey)
    block = F.when(
        F.col("site_id") % 2 == 0,
        build_rss_item_xml(F.col("url"), title, date_s, eid),
    ).otherwise(build_atom_entry_xml(F.col("url"), title, date_s, eid))
    xml = (
        u.select("host", "o_orderkey", block.alias("_b"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<feed>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("o_orderkey", "_b"))),
                        lambda s: s["_b"],
                    ),
                    "",
                ),
                F.lit("</feed>"),
            ).alias("xml")
        )
    )
    return parse_feed(xml, "xml", keep_cols=["host"])


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # phi-heavy-hitters over a skewed fetch stream (3 hot URLs + a
    # cold tail): every true heavy hitter is returned (CMS never
    # undercounts), candidates = distinct keys (partitioning-proof)
    from sandcrawler_spark.operators.sketches import cms_heavy_hitters

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_partkey") % 7 == 0,
            F.concat(F.lit("https://hot.example.com/"), (F.col("l_partkey") % 3).cast("string")),
        )
        .otherwise(_part_url(F.col("l_partkey")))
        .alias("url")
    )
    return cms_heavy_hitters(li, "url", phi=0.01)


def q_fetch_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hop-loop fetch simulation over the synthetic web corpus (no
    # oracle: bounded iterative joins are not one SQL statement)
    from sandcrawler_spark.operators.fetch import fetch_simulate

    c = _corpus(spark)
    reqs = c["ingest_request"].select("ingest_type", "base_url").limit(80)
    res = fetch_simulate(reqs, c["cdx"], c["pages"], max_hops=4)
    return res.groupBy("status").agg(F.count("*").alias("n")).orderBy("status")


def q_extraction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # byte-identical extraction invariant as an aggregate (no oracle:
    # html binary + our extractor are engine-side)
    from sandcrawler_spark.functions.extract_text import with_extracted_text

    c = _corpus(spark)
    ex = with_extracted_text(c["pages"], "html")
    return ex.agg(
        F.count("*").alias("n_pages"),
        F.sum((F.col("text") == F.col("extracted_text")).cast("int")).alias("n_byte_identical"),
        F.sum("word_count").cast("long").alias("total_words"),
    )


def q_html_biblio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C14: the meta-tag cascade over constructed HTML whose parse result
    # is SQL-predictable — variant 0 uses highwire tags, 1 Dublin Core
    # (incl. scheme=doi), 2 OpenGraph-only; pdf link via citation_pdf_url
    # absolutized against the page URL
    from sandcrawler_spark.functions.biblio import biblio_udf

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    pks = pk.cast("string")
    base = F.concat(F.lit("https://pub"), (pk % 10).cast("string"), F.lit(".example.org/article/"), pks)
    date_s = F.date_format(F.date_add(F.lit("2020-01-01").cast("date"), (pk % 28).cast("int")), "yyyy-MM-dd")
    doi = F.concat(F.lit("10.1234/p"), pks)
    head = (
        F.when(pk % 3 == 0, F.concat(
            F.lit('<meta name="citation_title" content="'), F.col("p_name"),
            F.lit('"><meta name="citation_doi" content="'), doi,
            F.lit('"><meta name="citation_author" content="Author A"><meta name="citation_author" content="Author B">'
                  '<meta name="citation_publication_date" content="'), date_s, F.lit('">'),
        ))
        .when(pk % 3 == 1, F.concat(
            F.lit('<meta name="DC.Title" content="'), F.col("p_name"),
            F.lit('"><meta name="DC.Identifier" scheme="DOI" content="'), doi,
            F.lit('"><meta name="DC.Creator" content="Author C"><meta name="DC.Date" content="'), date_s, F.lit('">'),
        ))
        .otherwise(F.concat(F.lit('<meta property="og:title" content="'), F.col("p_name"), F.lit('">')))
    )
    pdf_meta = F.when(
        pk % 2 == 0, F.concat(F.lit('<meta name="citation_pdf_url" content="/files/'), pks, F.lit('.pdf">'))
    ).otherwise(F.lit(""))
    html = F.concat(F.lit("<html><head>"), head, pdf_meta, F.lit("</head><body><p>x</p></body></html>"))
    df = p.select(pk.alias("partkey"), base.alias("url"), F.encode(html, "utf-8").alias("html"))
    b = df.withColumn("b", biblio_udf(F.col("html"), F.col("url")))
    return b.select(
        "partkey",
        F.col("b.title").alias("title"),
        F.col("b.doi").alias("doi"),
        F.coalesce(F.size("b.contrib_names"), F.lit(0)).alias("n_authors"),
        F.col("b.release_date").alias("release_date"),
        F.col("b.pdf_fulltext_url").alias("pdf_url"),
    )


def q_sub_resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C17: sub-resource extraction + adblock over constructed HTML —
    # fonts.googleapis script and platform.twitter iframe are adblocked,
    # so the oracle can enumerate the surviving resources directly
    from sandcrawler_spark.functions.biblio import resources_udf

    d = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://site"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.org/a/"), ds)
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" href="/css/'), ds,
        F.lit('.css"><script src="https://fonts.googleapis.com/x.js"></script><script src="/js/app.js"></script></head><body>'),
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.lit('<img src="/img/'), ds, F.lit('.png">'))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit('<iframe src="/inner.html"></iframe>')).otherwise(F.lit("")),
        F.lit('<iframe src="https://platform.twitter.com/w.js"></iframe></body></html>'),
    )
    df = d.select(base.alias("url"), F.encode(html, "utf-8").alias("html"))
    ex = df.select(F.explode(resources_udf(F.col("html"), F.col("url"))).alias("r"))
    return ex.groupBy(F.col("r.type").alias("rtype")).agg(
        F.count("*").alias("n"), F.countDistinct("r.url").alias("n_urls")
    )


def q_sha1_digest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1: the join-cdx-sha1.pig shape — capture index × DISTINCT digest
    # list, inner join on the content hash
    caps = _captures(spark, sf_dir)
    digests = (
        caps.filter(F.col("event_id") % 5 == 0).select("sha1hex").distinct()
    )
    return caps.join(digests, on="sha1hex", how="inner").select(
        "sha1hex", "url", "datetime"
    )


def q_surt_seed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: CDX × seed-URL join on the SURT key (seeds arrive in messy
    # form; SURT canonicalization makes the equi-join land)
    from sandcrawler_spark.functions.urls import surt_udf

    urls = _urls(spark, sf_dir)
    pk = F.col("o_orderkey")
    sid = F.col("site_id").cast("string")
    # seeds: uppercased/www'd variants of every 7th url
    seeds = urls.filter(pk % 7 == 0).select(
        F.concat(
            F.lit("HTTP://WWW.site"), sid, F.lit(".Example.com/order/"), pk.cast("string")
        ).alias("seed_url")
    )
    cdx_side = urls.select("url", surt_udf(F.col("url")).alias("surt"))
    seed_side = seeds.select("seed_url", surt_udf(F.col("seed_url")).alias("surt")).distinct()
    return cdx_side.join(seed_side, on="surt", how="inner").select("surt", "url", "seed_url")


def q_union_lanes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1/U2: union of two result lanes + grouped count
    o = _t(spark, sf_dir, "orders")
    lane_a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", F.lit("bulk").alias("lane")
    )
    lane_b = o.filter(F.col("o_totalprice") > 150000.0).select(
        "o_orderstatus", F.lit("priority").alias("lane")
    )
    return lane_a.unionByName(lane_b).groupBy("o_orderstatus", "lane").agg(
        F.count("*").alias("n")
    )


def q_grobid_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C12/C19: mocked GROBID + TEI distill over corpus PDF bodies
    # (rows-only: service stub + XML parse are engine-side)
    from sandcrawler_spark.functions.hooks import with_grobid, with_pdftrio

    c = _corpus(spark)
    pdfs = c["pages"].filter(F.col("url").endswith(".pdf")).select("url", "html")
    out = with_pdftrio(with_grobid(pdfs))
    return out.select(
        "url",
        F.col("grobid.status").alias("grobid_status"),
        F.col("grobid.doi").alias("doi"),
        F.col("grobid.title").alias("title"),
        F.round(F.col("pdftrio.ensemble_score"), 6).alias("ensemble_score"),
    ).orderBy("url")


def q_revisit_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J9 (rows-only): revisit captures resolved to original WARC records
    from sandcrawler_spark.operators.sinks import resolve_revisits

    c = _corpus(spark)
    out = resolve_revisits(c["cdx"])
    return out.groupBy((F.col("mimetype") == "warc/revisit").alias("is_revisit")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("orig_warc_path").isNotNull().cast("int")).alias("n_resolved"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal plumbing over binary columns (rows-only: stub decode)
    from sandcrawler_spark.multimodal import extract_media_meta

    d = _t(spark, sf_dir, "documents").select(
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
    )
    meta = extract_media_meta(d, "content", "media_type")
    return meta.groupBy("status", "media_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("sha1hex").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# Driver surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: politeness-scheduled URL frontier at sf0.001."""
    return q_politeness_schedule(spark, SF_DEFAULT)


def q_recrawl_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # adaptive recrawl scheduling (Cho & Garcia-Molina): per-URL change
    # rate from consecutive-capture digest flips over the event-derived
    # capture stream; integer micro-rates + clamped interval days keep
    # both engines exact (operators/recrawl.py)
    from sandcrawler_spark.operators.recrawl import change_rate_schedule

    e = _t(spark, sf_dir, "events")
    caps = e.select(
        F.concat(
            F.lit("https://stream.example.org/u/"), F.col("user_id").cast("string")
        ).alias("url"),
        F.unix_timestamp("ts").cast("long").alias("epoch_s"),
        F.md5(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                (F.col("event_id") % 3).cast("string"),
            )
        ).alias("sha1hex"),
    )
    return change_rate_schedule(caps, max_interval_days=64)


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rendezvous-hash crawler-fleet sharding: every distinct host maps
    # to argmax_i md5(host:i) with zero coordination; pure codegen map
    # (operators/sharding.py)
    from sandcrawler_spark.operators.sharding import assign_shards

    hosts = _urls(spark, sf_dir).select("host").distinct()
    return assign_shards(hosts, "host", n_shards=8).select(
        "host", F.col("shard").cast("int").alias("shard")
    )


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C6/F7 companion: magic-byte content sniffing vs the declared CDX
    # mimetype — the declared-vs-actual mismatch report a crawl QA run
    # starts with. Pure Catalyst (hex + regexp + when-chain), zero
    # Python; reference ground truth: gen_file_metadata's libmagic
    # sniff (/root/reference/python/sandcrawler/misc.py:50-81).
    from sandcrawler_spark.functions.mime import normalize_mime_col, sniff_mime_col

    c = _corpus(spark)
    declared = (
        c["cdx"]
        .filter((F.col("status_code") == 200) & (F.col("mimetype") != "warc/revisit"))
        .select("url", "mimetype")
        .distinct()
    )
    j = declared.join(c["pages"].select("url", "html"), "url")
    return (
        j.select(
            normalize_mime_col(F.col("mimetype")).alias("declared"),
            sniff_mime_col(F.col("html")).alias("sniffed"),
        )
        .groupBy("declared", "sniffed")
        .agg(
            F.count("*").alias("n_caps"),
            F.sum(
                (F.coalesce(F.col("declared"), F.lit("?")) != F.col("sniffed")).cast("long")
            ).alias("n_mismatch"),
        )
    )


# Queries whose driver correctness row is oldest (or missing): listed
# FIRST so a driver that samples a prefix of queries() re-checks the
# entries with the stalest receipts. Never-driver-checked first, then
# the 20 last sampled in round 2; everything below them was green in
# round 3. (tools/check_oracle.py always sweeps all 75 regardless.)
def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SALSA hub/authority via the closed form: bipartite connected
    # components (large-star/small-star) + in/out-degree shares —
    # degree-normalized counterpart to host_hits' power iteration
    from sandcrawler_spark.operators.linkgraph import host_graph, salsa_scores

    return salsa_scores(host_graph(_outlink_edges(spark, sf_dir)))


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-row Newman degree-assortativity receipt for the host graph
    # (exact integer moments; denominator is sqrt-free on the
    # symmetrized end list)
    from sandcrawler_spark.operators.linkgraph import degree_assortativity, host_graph

    return degree_assortativity(host_graph(_outlink_edges(spark, sf_dir)))


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucketed range join: events into overlapping per-host windows
    # (deterministic pseudo-jittered offsets, NOT bucket-aligned) via
    # day-bucket expansion + residual predicate — no BNLJ/cartesian
    from sandcrawler_spark.operators.intervals import interval_join

    e = _t(spark, sf_dir, "events")
    anchor = e.agg(F.min("ts").alias("m")).select(
        F.unix_timestamp(F.date_trunc("day", F.col("m"))).alias("a0")
    )
    points = e.select(
        F.concat(
            F.lit("site"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.unix_timestamp("ts").alias("ts_sec"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_cents"),
    )
    w = (
        spark.range(0, 200)
        .select(F.expr("id div 4").alias("s"), F.expr("id % 4").alias("k"))
        .crossJoin(F.broadcast(anchor))
        .select(
            F.concat(
                F.lit("site"), F.col("s").cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.expr("CAST(s * 4 + k AS BIGINT)").alias("w_id"),
            F.expr("a0 + ((s * 7919 + k * 104729) % 672) * 3600").alias("start_sec"),
            F.expr(
                "a0 + ((s * 7919 + k * 104729) % 672) * 3600"
                " + (6 + ((s * 31 + k * 17) % 42)) * 3600"
            ).alias("end_sec"),
        )
    )
    j = interval_join(points, w, key="host", bucket_seconds=86400)
    return j.groupBy("host", "w_id", "start_sec", "end_sec").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("value_cents"),
        F.min("event_id").cast("long").alias("first_event"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first-order Markov transition matrix of per-user event streams
    # (lag window + pair counts, ppm row-normalized)
    from sandcrawler_spark.operators.eventseq import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


def q_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host hourly traffic anomalies: median + 3*MAD robust flag,
    # integer-exact via 2x/8x scaling (exact percentile, never approx)
    from sandcrawler_spark.operators.eventseq import hourly_rate_anomalies

    e = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("site"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
    )
    return hourly_rate_anomalies(e, host, k_mad=3)


def q_soft_dedupe_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SoftDeDup: keep near-duplicates but down-weight by cluster size
    # (1e6 div |cluster| ppm) — same LSH->verify->CC chain as
    # neardup_dedupe plus one cluster-size agg
    from sandcrawler_spark.operators.dedupe import soft_dedupe_weights

    docs = _aug_docs(spark, sf_dir)
    return soft_dedupe_weights(docs, n_shingle=3, k=8, bands=4, threshold=0.5)


def q_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trailing-7-day distinct-visitor estimate per (host, day): the
    # mergeable-sketch payoff — raw keys shuffled ONCE into daily
    # register partials, every window position is a bounded max-merge
    from sandcrawler_spark.operators.sketches import hll_sliding_estimate

    e = _t(spark, sf_dir, "events").select(
        F.concat(
            F.lit("site"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.expr("unix_timestamp(date_trunc('day', ts)) div 86400").alias("day"),
        F.col("user_id").cast("string").alias("visitor"),
    )
    return hll_sliding_estimate(e, "visitor", "host", "day", window_buckets=7, p=6)


def q_host_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mirror/CDN detection: host pairs by shared content fingerprints
    # (fp equi-join with hot-fp cap — never host x host), exact
    # jaccard + directional containment in ppm
    from sandcrawler_spark.operators.mirrors import host_mirror_pairs

    li = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("host"),
        F.concat(
            F.col("l_partkey").cast("string"),
            F.lit(":"),
            F.col("l_quantity").cast("bigint").cast("string"),
        ).alias("fp"),
    )
    return host_mirror_pairs(li, min_shared=2, max_fp_hosts=256)


def q_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sustained per-host traffic drift via integer EWMA (alpha=1/8)
    # over the hourly count series — complements rate_anomalies' MAD
    # single-hour spikes; fold is narrow Catalyst, div-exact twins
    from sandcrawler_spark.operators.eventseq import ewma_host_trend

    e = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("site"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
    )
    return ewma_host_trend(e, host, alpha_denom=8, band_pct=15)


def q_pct_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 3986 percent-encoding normalization: decode unreserved
    # escapes, uppercase the rest — planted escape variants derived
    # deterministically from the order key so the oracle replays both
    # the construction AND the split/transform normalization
    from sandcrawler_spark.functions.urls import pct_normalize_col

    u = _urls(spark, sf_dir)
    planted = F.concat(
        F.col("url"),
        F.expr(
            "CASE CAST(o_orderkey % 5 AS INT) "
            "WHEN 0 THEN '/%7euser' "          # decode -> ~user
            "WHEN 1 THEN '/a%2fb?x=%41%4a' "   # upper %2F, decode AJ
            "WHEN 2 THEN '/p%' "               # trailing malformed
            "WHEN 3 THEN '/100%25%2e' "        # keep %25, decode .
            "ELSE '/%zz%5F' END"               # invalid hex + decode _
        ),
    )
    return u.select(
        "o_orderkey",
        planted.alias("url_raw"),
        pct_normalize_col(planted).alias("url_norm"),
    )


def q_stratum_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # all-pairs stratum overlap from per-stratum KMV synopses (one
    # corpus pass; pair merge on k-row sketches): audience overlap
    # between event types as the stand-in for snapshot/shard overlap
    from sandcrawler_spark.operators.sketches import kmv_pairwise_overlap

    e = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("stratum"),
        F.col("user_id").cast("string").alias("visitor"),
    )
    return kmv_pairwise_overlap(e, "visitor", "stratum", k=64)


def q_distance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # web-graph distance distribution + effective diameter (Broder'00
    # 90% readout) from the HyperBall neighborhood function — integer
    # cents/ppm end to end
    from sandcrawler_spark.operators.hyperball import distance_profile
    from sandcrawler_spark.operators.linkgraph import host_graph

    return distance_profile(
        host_graph(_outlink_edges(spark, sf_dir)), n_iter=3, p=8, direction="in"
    )


def q_hreflang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hreflang document alignment: pages declare language alternates
    # in three shapes (absolute rel-first, root-relative href-first
    # single-quoted, none) + an x-default that must be excluded from
    # pairs; output = aligned translation-pair candidates
    from sandcrawler_spark.operators.linkgraph import (
        extract_hreflang,
        hreflang_pairs,
    )

    u = _urls(spark, sf_dir).select("url", "host", "o_orderkey")
    okey = F.col("o_orderkey").cast("string")
    head = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="en" href="'), F.col("url"), F.lit('"/>'),
                F.lit("<link href='/de/order/"), okey, F.lit("' hreflang='de' rel=alternate>"),
                F.lit('<link rel="alternate" hreflang="x-default" href="//'),
                F.col("host"), F.lit("/order/"), okey, F.lit('">'),
            ),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit("<link rel='alternate' hreflang='en' href='/en/order/"), okey, F.lit("'>"),
                F.lit("<link href='/fr/order/"), okey, F.lit("' rel=alternate hreflang='fr'>"),
            ),
        )
        .otherwise(F.lit(""))
    )
    pages = u.select(
        "url",
        F.encode(
            F.concat(F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")),
            "UTF-8",
        ).alias("html"),
    )
    return hreflang_pairs(extract_hreflang(pages))


def q_meta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # client-side redirect channel: meta refresh in three planted
    # shapes (instant absolute, delayed root-relative single-quoted
    # with attribute order flipped, none) — the 200-then-redirect
    # shells the hop loop can't see
    from sandcrawler_spark.operators.linkgraph import extract_meta_refresh

    u = _urls(spark, sf_dir).select("url", "host", "o_orderkey")
    okey = F.col("o_orderkey").cast("string")
    head = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="0;url=https://'),
                F.col("host"), F.lit("/moved/"), okey, F.lit('">'),
            ),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit("<meta content='5; URL=/slow/"), okey,
                F.lit("' http-equiv=refresh>"),
            ),
        )
        .otherwise(F.lit("<meta charset='utf-8'>"))
    )
    pages = u.select(
        "url",
        F.encode(
            F.concat(F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")),
            "UTF-8",
        ).alias("html"),
    )
    return extract_meta_refresh(pages)


def q_host_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    # site-migration detection: site k%10==7 hosts redirect ~all their
    # URLs to site (k+1), everything else only sporadically redirects
    # (okey%17) to a mixed set — only the migrated hosts may flag
    from sandcrawler_spark.operators.linkgraph import host_moves

    u = _urls(spark, sf_dir).select("url", "host", "site_id", "o_orderkey")
    redir = u.filter(
        ((F.col("site_id") % 10 == 7) & (F.col("o_orderkey") % 5 != 0))
        | (F.col("o_orderkey") % 17 == 0)
    ).select(
        F.col("url").alias("src_url"),
        F.concat(
            F.lit("https://site"),
            F.when(F.col("site_id") % 10 == 7, (F.col("site_id") + 1) % 50)
            .otherwise((F.col("o_orderkey") % 50)).cast("int").cast("string"),
            F.lit(".example.com/order/"),
            F.col("o_orderkey").cast("string"),
        ).alias("dst_url"),
    )
    return host_moves(redir, min_count=5, share_ppm=800_000)


def q_crawl_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # politeness-feasibility plan: per-host demand vs the fetches a
    # 1h round can legally serve at that host's crawl delay
    from sandcrawler_spark.operators.politeness import host_capacity_plan

    u = _urls(spark, sf_dir)
    delays = (
        u.select("host", "site_id")
        .distinct()
        .filter(F.col("site_id") % 4 != 3)  # some hosts have no delay row
        .select(
            "host",
            (F.lit(250) * (F.lit(1) + F.col("site_id") % 7)).cast("long").alias("delay_ms"),
        )
    )
    return host_capacity_plan(u, delays, round_seconds=600)


def q_topic_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # focused-crawl host relevance: cosine between each host's mean
    # content embedding and a 3-doc topic seed — exact integer sums
    # per (host, dim), one double sequence per host, rounded 6dp
    from sandcrawler_spark.operators.similarity import host_topic_affinity

    e = _t(spark, sf_dir, "embeddings")
    docs = e.select(
        F.concat(F.lit("site"), (F.col("vec_id") % 40).cast("string"), F.lit(".example.com")).alias("host"),
        "embedding",
    )
    seed = e.filter(F.col("vec_id") < 3).select("embedding")
    return host_topic_affinity(docs, seed=seed)


def q_shard_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fleet coordination traffic under rendezvous sharding: per shard,
    # internal vs cross-shard host-graph edges (codegen argmax shard
    # on both endpoints, no shard table join)
    from sandcrawler_spark.operators.linkgraph import host_graph
    from sandcrawler_spark.operators.sharding import shard_cut

    return shard_cut(host_graph(_outlink_edges(spark, sf_dir)), n_shards=8)


def q_community_shard_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the yardstick comparison: shard by LPA community (md5 of label
    # mod n) instead of per-host rendezvous — inter-community edges
    # are the only cross-shard traffic left
    from sandcrawler_spark.operators.linkgraph import host_graph
    from sandcrawler_spark.operators.sharding import community_shard_cut

    return community_shard_cut(
        host_graph(_outlink_edges(spark, sf_dir)), n_shards=8, n_rounds=3
    )


def q_host_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-truss of the undirected host graph: per-EDGE triangle-support
    # peeling (stronger than the 3-core — stars fall out, only
    # mutually-triangulated neighborhoods survive); degree-oriented
    # wedge enumeration keeps hub fan-out sqrt-bounded
    from sandcrawler_spark.operators.linkgraph import host_graph, host_ktruss

    return host_ktruss(host_graph(_outlink_edges(spark, sf_dir)), k=3, max_rounds=6)


def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Common-Crawl WET export roundtrip: per-lang WET files built from
    # extracted page text as pure-Catalyst conversion records, then
    # re-parsed through the mapInPandas WARC scanner; the oracle
    # derives (lang, url, byte-length, md5) relationally from the same
    # persisted corpus parquet — it never touches WET bytes
    from sandcrawler_spark.sources.warcfmt import scan_warc_blobs, wet_record_col

    pages = _corpus(spark)["pages"].filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    rec = wet_record_col(
        F.col("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.col("text"),
    )
    blobs = (
        pages.select("lang", "url", rec.alias("_rec"))
        .groupBy("lang")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("url", "_rec"))),
                        lambda s: s["_rec"],
                    ),
                    "",
                ),
                "utf-8",
            ).alias("content")
        )
    )
    recs = scan_warc_blobs(blobs, path_col="lang", content_col="content")
    return recs.select(
        F.col("path").alias("lang"),
        F.col("target_uri").alias("url"),
        "rec_content_length",
        "payload_md5",
    )


def q_host_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weakly-connected components of the host graph (frontier islands:
    # a component unreachable from the seed set never gets crawled by
    # link discovery alone — the map of where seeds are needed).
    # Large-star/small-star CC (O(log d) rounds) + one size rollup.
    from sandcrawler_spark.operators.dedupe import connected_components
    from sandcrawler_spark.operators.linkgraph import host_graph

    edges = host_graph(_outlink_edges(spark, sf_dir))
    # CC machinery labels by MIN over an integral id: hash hosts to a
    # stable 60-bit key, keep the (key -> host) map for readback
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .withColumn("hid", F.conv(F.substring(F.md5("host"), 1, 15), 16, 10).cast("long"))
    )
    pairs = (
        edges.select(
            F.conv(F.substring(F.md5("src_host"), 1, 15), 16, 10).cast("long").alias("id_a"),
            F.conv(F.substring(F.md5("dst_host"), 1, 15), 16, 10).cast("long").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    cc = connected_components(pairs)
    labeled = hosts.join(cc, hosts["hid"] == cc["id"], "left").select(
        "host", F.coalesce(cc["label"], hosts["hid"]).alias("component")
    )
    sizes = labeled.groupBy("component").agg(F.count("*").cast("long").alias("comp_size"))
    return labeled.join(sizes, on="component").select("host", "component", "comp_size")


def q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # declared-vs-predicted language QA over the crawl corpus (the
    # lang-column analog of mime_sniff's declared-vs-sniffed report):
    # closed-class-word prediction per page vs the stored lang column.
    # The synthetic corpus text is function-word-free, so a md5-keyed
    # slice of pages gets a language phrase APPENDED (same derivation
    # in both engines) — the report exercises real predictions, not
    # just the 'und' floor. lang_profile is a row-wise projection:
    # declared rides through a struct id, no join, no url-dup fan-out.
    from sandcrawler_spark.functions.script import lang_profile

    pages = _corpus(spark)["pages"].filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    slot = F.conv(F.substring(F.md5("url"), 1, 4), 16, 10).cast("long") % 6
    t = F.col("text")
    for m, phrase in _LANG_PLANTS.items():
        t = F.when(slot == m, F.concat(t, F.lit(" "), F.repeat(F.lit(phrase + " "), 8))).otherwise(t)
    prof = lang_profile(
        pages.select(F.struct("url", "lang").alias("doc_id"), t.alias("text")),
        id_col="doc_id",
    )
    return prof.select(
        F.col("doc_id.lang").alias("declared"), F.col("lang_pred").alias("predicted")
    ).groupBy("declared", "predicted").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(
            (F.col("declared") != F.col("predicted")).cast("long")
        ).cast("long").alias("n_mismatch"),
    )


def q_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scalar-quantization ANN tier (SQ8): per-dim 8-bit codes from a
    # min/max training pass, symmetric code-space L2 (all-integer),
    # two-level top-k — the 4x-compression tier between flat scan and
    # PQ (operators/pq.py)
    from sandcrawler_spark.operators.pq import sq_bounds, sq_encode_col, sq_topk

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bounds = sq_bounds(e)
    codes = e.select(
        "vec_id", sq_encode_col("embedding", bounds).alias("sq_codes")
    ).localCheckpoint(eager=True)
    sample = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return sq_topk(sample, codes, bounds, k=5).select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("sqdist_code").cast("bigint").alias("sqdist_code"),
    )


def q_reshard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fleet-growth churn: share of frontier URLs changing owner when
    # the crawler fleet grows 8 -> 9 shards, mod-hash vs rendezvous vs
    # consistent-hash ring (operators/sharding.py) — pure codegen maps,
    # one count agg, three report rows
    from sandcrawler_spark.operators.sharding import reshard_churn

    return reshard_churn(
        _urls(spark, sf_dir).select("url"), key_col="url", n_from=8, n_to=9, vnodes=16
    )


def q_bpe_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizer-quality eval per corpus stratum: fertility (units per
    # word) + full-word-merge share under the fixed encode merge list —
    # the practical OOV signal for an open-vocab BPE
    from sandcrawler_spark.operators.bpe import segment_coverage

    return segment_coverage(
        _t(spark, sf_dir, "documents"), _BPE_ENCODE_MERGES, stratum_col="source"
    )


def q_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sitemap-lastmod-driven recrawl: per-host sitemaps built from the
    # page store (lastmod = capture day shifted by a deterministic
    # per-url delta), parsed back through the codegen sitemap parser,
    # and joined against the CDX capture log — an entry whose lastmod
    # postdates the newest capture needs a refetch. The oracle derives
    # the same report relationally and never touches XML.
    from sandcrawler_spark.functions.sitemaps import build_urlset_xml, parse_sitemap

    c = _corpus(spark)
    pages = c["pages"]
    shift = (
        F.conv(F.substring(F.md5("url"), 1, 4), 16, 10).cast("long") % 5 - 2
    ).cast("int")
    lastmod = F.date_format(F.date_add(F.to_date("warc_ts"), shift), "yyyy-MM-dd")
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    block = build_urlset_xml(F.col("url"), lastmod, F.lit("0.5"))
    xml = (
        pages.select(host.alias("host"), F.col("url"), block.alias("_b"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("url", "_b"))),
                        lambda s: s["_b"],
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    parsed = parse_sitemap(xml, "xml", keep_cols=["host"]).filter(
        F.col("kind") == "url"
    )
    latest = c["cdx"].groupBy("url").agg(F.max("datetime").alias("_dt"))
    return (
        parsed.join(latest, parsed["loc"] == latest["url"], "inner")
        .select(
            "host",
            F.col("loc"),
            F.col("lastmod"),
            F.substring("_dt", 1, 8).alias("last_capture_day"),
            (
                F.regexp_replace("lastmod", "-", "") > F.substring("_dt", 1, 8)
            ).alias("needs_refetch"),
        )
    )


def q_ucb_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UCB1 host scheduling: each frontier URL is one trial on its host
    # arm (success = order status 'F'); integer micro-unit means +
    # exact-isqrt exploration bonuses pick the next 10 hosts
    # (operators/bandit.py)
    from sandcrawler_spark.operators.bandit import ucb_host_scores

    trials = _urls(spark, sf_dir).select(
        "host", (F.col("o_orderstatus") == "F").cast("int").alias("success")
    )
    return ucb_host_scores(trials, top_k=10)


def q_pagination_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pagination completeness mining: single-number URL templates form
    # numeric sequences; holes are pages link discovery missed (the
    # inverse of trap detection). /order/N and /part/N are sparse per
    # host (gaps expected); the /page/N run from nation is contiguous
    # (complete control) (operators/traps.py)
    from sandcrawler_spark.operators.traps import pagination_gaps

    u = _urls(spark, sf_dir).select("host", "url")
    p = _t(spark, sf_dir, "part").select(
        F.concat(
            F.lit("site"), (F.col("p_partkey") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.concat(
            F.lit("https://site"),
            (F.col("p_partkey") % 50).cast("string"),
            F.lit(".example.com/part/"),
            F.col("p_partkey").cast("string"),
        ).alias("url"),
    )
    n = _t(spark, sf_dir, "nation").select(
        F.lit("news.example.com").alias("host"),
        F.concat(
            F.lit("https://news.example.com/page/"), F.col("n_nationkey").cast("string")
        ).alias("url"),
    )
    return pagination_gaps(u.unionByName(p).unionByName(n), min_pages=3)


def q_seen_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 10^10-seen-set capacity plan: bits/key -> optimal k + FPR
    # over this frontier's measured distinct count, extrapolated to
    # the north-star scale (operators/seen.py bloom_sizing_plan)
    from sandcrawler_spark.operators.seen import bloom_sizing_plan

    return bloom_sizing_plan(_urls(spark, sf_dir).select("url"), url_col="url")


def q_ring_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the ring's one knob, measured: per-shard URL load at 4 vs 32
    # vnodes with rendezvous as the optimal-balance reference
    # (operators/sharding.py). Keys are per-capture URLs built on the
    # seed-42 corpus CDX (real host/path text, Zipf-skewed hosts)
    # fanned to documents-table volume — so the hash ring is balancing
    # realistic key strings, not uniform doc_id templates.
    from sandcrawler_spark.operators.sharding import ring_balance

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        (F.col("doc_id") % 256).alias("rid"), "doc_id"
    ).join(F.broadcast(_corpus_cdx_ranked(spark)), on="rid").select(
        F.concat(F.col("url"), F.lit("?cap="), F.col("doc_id").cast("string")).alias("url")
    )
    return ring_balance(urls, key_col="url", n_shards=8, vnode_counts=(4, 32))


def q_retry_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 9110 Retry-After parsing over a synthesized header stream:
    # delta-seconds form, HTTP-date form, and an unparseable arm
    # (NULL -> AIMD fallback); delay computed against the event's own
    # epoch so timezone handling cancels (operators/politeness.py)
    from sandcrawler_spark.operators.politeness import parse_retry_after_col

    e = _t(spark, sf_dir, "events")
    form = (F.col("event_id") % 3).cast("int")
    http_date = F.concat(
        F.date_format(
            F.expr("ts + make_dt_interval(0, 0, 0, CAST(event_id % 90 + 10 AS DOUBLE))"),
            "EEE, dd MMM yyyy HH:mm:ss",
        ),
        F.lit(" GMT"),
    )
    hdr = (
        F.when(form == 0, (F.col("event_id") % 120 + 1).cast("string"))
        .when(form == 1, http_date)
        .otherwise(F.lit("soon"))
    )
    base = e.select(
        F.col("event_id").cast("long").alias("event_id"),
        form.alias("form"),
        hdr.alias("retry_after"),
        F.unix_timestamp("ts").cast("long").alias("now_epoch"),
    )
    return base.select(
        "event_id",
        "form",
        "retry_after",
        parse_retry_after_col(F.col("retry_after"), F.col("now_epoch")).alias("delay_s"),
    )


def q_host_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    # URL-tree shape per host: distinct path nodes per depth +
    # branching factor between depths — the frontier-size forecast
    # input (a branching factor that never decays = infinite URL
    # space). Mixed depth-2 order paths and depth-3 category trees.
    from sandcrawler_spark.operators.traps import host_branching

    u = _urls(spark, sf_dir).select("host", "url")
    li = _t(spark, sf_dir, "lineitem").select(
        F.concat(
            F.lit("site"), (F.col("l_suppkey") % 20).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.concat(
            F.lit("https://site"),
            (F.col("l_suppkey") % 20).cast("string"),
            F.lit(".example.com/c"),
            (F.col("l_partkey") % 7).cast("string"),
            F.lit("/s"),
            (F.col("l_suppkey") % 5).cast("string"),
            F.lit("/item"),
            F.col("l_orderkey").cast("string"),
        ).alias("url"),
    )
    return host_branching(u.unionByName(li), max_depth=8)


def q_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the sketch-error receipt: per host, exact distinct URLs vs the
    # HLL (p=6) and KMV (k=64) estimates with integer-ppm relative
    # errors — the dashboard row that says which synopsis to trust at
    # which cardinality (KMV is exact below k; raw HLL carries the
    # small-range bias at m=64). Errors are computed in integer space
    # (estimate scaled x100 first) so both engines agree bit-for-bit.
    from sandcrawler_spark.operators.sketches import hll_cardinality, kmv_cardinality

    urls = _urls(spark, sf_dir).select("host", "url")
    true = urls.groupBy("host").agg(
        F.countDistinct("url").cast("long").alias("true_distinct")
    )
    hll = hll_cardinality(urls, "url", ["host"], p=6).select(
        "host", F.col("hll_estimate")
    )
    kmv = kmv_cardinality(urls, "url", ["host"], k=64).select("host", "est_distinct")
    j = (
        true.join(hll, on="host")
        .join(kmv, on="host")
        .withColumn("_hx", F.expr("CAST(round(hll_estimate * 100) AS BIGINT)"))
    )
    return j.select(
        "host",
        "true_distinct",
        "hll_estimate",
        F.col("est_distinct").alias("kmv_estimate"),
        F.expr(
            "CAST(1000000 AS BIGINT) * abs(_hx - true_distinct * 100)"
            " div (true_distinct * 100)"
        ).alias("hll_err_ppm"),
        F.expr(
            "CAST(1000000 AS BIGINT) * abs(est_distinct - true_distinct)"
            " div true_distinct"
        ).alias("kmv_err_ppm"),
    )


def q_frontier_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    # starvation-free frontier scheduling: a low-priority URL's rank
    # grows with wait time (aged = priority*100 + min(age_days div 4,
    # 300) — the aging term can cross up to 3 priority levels, so
    # nothing waits forever behind a firehose of urgent requests);
    # report per URL the pure-priority vs aged crawl round and whether
    # aging promoted it. Per-host window = per-host frontier slice
    # (bounded, the politeness_schedule shape).
    u = _urls(spark, sf_dir).withColumn(
        "age_days",
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long"),
    ).withColumn(
        "aged_priority",
        (F.col("priority").cast("long") * 100
         + F.least(F.expr("age_days div 4"), F.lit(300).cast("long"))).cast("long"),
    )
    w_pure = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("url"))
    w_aged = Window.partitionBy("host").orderBy(F.col("aged_priority").desc(), F.col("url"))
    ranked = (
        u.withColumn("_q", (F.lit(1) + (F.col("site_id") % 4)).cast("long"))
        .withColumn("_rp", F.row_number().over(w_pure).cast("long") - 1)
        .withColumn("_ra", F.row_number().over(w_aged).cast("long") - 1)
    )
    return ranked.select(
        "url",
        "host",
        "priority",
        "age_days",
        "aged_priority",
        F.expr("_rp div _q").alias("round_pure"),
        F.expr("_ra div _q").alias("round_aged"),
        (F.col("_ra") < F.col("_rp")).alias("promoted"),
    )


def q_pagination_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frontier synthesis from pagination holes: /page/N (nation keys
    # with every 7th dropped) and /cat/N (region keys * 3) sequences
    # back-fill their missing page URLs; unbounded/hex templates are
    # excluded by construction (operators/traps.py)
    from sandcrawler_spark.operators.traps import pagination_fill

    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 7 != 3).select(
        F.lit("news.example.com").alias("host"),
        F.concat(
            F.lit("https://news.example.com/page/"), F.col("n_nationkey").cast("string")
        ).alias("url"),
    )
    r = _t(spark, sf_dir, "region").select(
        F.lit("news.example.com").alias("host"),
        F.concat(
            F.lit("https://news.example.com/cat/"), (F.col("r_regionkey") * 3).cast("string")
        ).alias("url"),
    )
    return pagination_fill(n.unionByName(r), min_pages=3, max_fill=200)


def q_alloc_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fairness receipt for the round-budget arbitration: Gini (ppm) of
    # the raw per-host demand vs the water-filled allocation — the
    # allocator should compress inequality, and this one-pair report
    # proves by how much (operators/budget.py)
    from sandcrawler_spark.operators.budget import allocate_budget, allocation_gini

    demands = _urls(spark, sf_dir).groupBy("host").agg(
        F.count("*").cast("long").alias("demand")
    )
    alloc = allocate_budget(demands, 10_000)
    g_dem = allocation_gini(demands, key_col="host", value_col="demand").withColumn(
        "series", F.lit("demand")
    )
    g_alloc = allocation_gini(alloc, key_col="host", value_col="alloc").withColumn(
        "series", F.lit("alloc")
    )
    return g_dem.unionByName(g_alloc).select("series", "n_keys", "total", "gini_ppm")


def q_revalidation_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional-GET economics: bytes a 304-aware recrawl would have
    # saved, per capture mimetype — consecutive same-digest recaptures
    # priced by their compressed size (operators/recrawl.py). URLs,
    # mimetypes, digests and sizes come from the seed-42 corpus CDX
    # dimension (Zipf-skewed hosts, real size distribution) fanned to
    # events-table volume; a third of recaptures mutate the digest so
    # both 304 and changed arms fire per URL stream.
    from sandcrawler_spark.operators.recrawl import revalidation_savings

    e = _t(spark, sf_dir, "events")
    caps = e.select(
        F.col("event_id"),
        (F.col("event_id") % 256).alias("rid"),
        F.unix_timestamp("ts").cast("long").alias("epoch_s"),
    ).join(F.broadcast(_corpus_cdx_ranked(spark)), on="rid").select(
        "url",
        "mimetype",
        "epoch_s",
        F.when(
            F.col("event_id") % 3 == 0, F.md5(F.concat(F.col("sha1hex"), F.lit(":v2")))
        ).otherwise(F.col("sha1hex")).alias("sha1hex"),
        F.col("warc_csize").cast("long").alias("warc_csize"),
    )
    return revalidation_savings(caps)


def q_tag_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host markup-vs-text density over the raw page store (the
    # corpus-wide form of the per-doc boilerplate/quality gates);
    # codegen string scan + ONE host agg, html bytes never shuffle
    from sandcrawler_spark.functions.htmlstats import tag_density

    return tag_density(_corpus(spark)["pages"])


def q_title_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # identical-<title> clusters across captures/URLs/hosts — the
    # soft-404/cookie-wall/mirror triage table
    from sandcrawler_spark.functions.htmlstats import title_clusters

    return title_clusters(_corpus(spark)["pages"], min_pages=2)


def q_meta_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-wide <meta name=...> vocabulary: which metadata standards
    # the crawl actually carries (decides if the biblio cascade fires)
    from sandcrawler_spark.functions.htmlstats import meta_tag_profile

    return meta_tag_profile(_corpus(spark)["pages"])


def q_postings_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    # varint index-size estimate from delta-gap stats: term-keyed
    # aggregate only (min/max/count), no per-term window, no sorted
    # posting-list materialization — skew-safe at stopword scale
    from sandcrawler_spark.operators.search import postings_compression

    return postings_compression(_t(spark, sf_dir, "documents"))


def q_frontier_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-source frontier fold (fatcat-ingest ∪ SPN ∪ bulk backfill
    # keep-best semantics) as one URL-keyed aggregate — union is free,
    # no window, no join
    from sandcrawler_spark.operators.frontier import merge_frontiers

    u = _urls(spark, sf_dir)
    snap_a = u.filter(F.col("o_orderkey") % 3 != 0).select(
        "url", "host", "priority",
        F.col("o_orderdate").alias("discovered_ts"),
        F.lit("fatcat-ingest").alias("source"),
    )
    snap_b = u.filter(F.col("o_orderkey") % 2 == 0).select(
        "url", "host",
        F.least(F.lit(5), F.col("priority") + 1).alias("priority"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("discovered_ts"),
        F.lit("savepapernow").alias("source"),
    )
    snap_c = u.filter(F.col("o_orderkey") % 5 == 0).select(
        "url", "host",
        F.lit(1).alias("priority"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("discovered_ts"),
        F.lit("bulk-backfill").alias("source"),
    )
    return merge_frontiers(snap_a, snap_b, snap_c)


def q_circuit_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host closed/open/half-open breaker states from the fetch
    # log: two host-keyed aggregates (no per-host sequence window),
    # explicit event-time `now` — deterministic and replayable
    from sandcrawler_spark.operators.breaker import circuit_breaker

    e = _t(spark, sf_dir, "events")
    log = e.select(
        F.concat(F.lit("site"), (F.col("user_id") % 499).cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.col("ts"),
        (F.col("event_type") != "error").alias("success"),
    )
    return circuit_breaker(
        log,
        now_expr="timestamp'2024-02-01 00:00:00'",
        fail_threshold=2,
        cooloff_s=172800,
    )


def q_wat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Common-Crawl WAT sidecar roundtrip: per-page metadata (title +
    # outlink hrefs) serialized as JSON into WARC `metadata` records
    # (pure Catalyst), re-parsed through the mapInPandas WARC scanner,
    # and the JSON payload decoded back with from_json; the oracle
    # derives (url, title, n_links) relationally from the same corpus
    # parquet — it never touches WAT bytes
    from pyspark.sql import types as T

    from sandcrawler_spark.sources.warcfmt import scan_warc_blobs, wat_record_col

    pages = _corpus(spark)["pages"].where(
        F.hex(F.expr("substring(html, 1, 1)")) == "3C"
    )
    s = F.decode(F.col("html"), "UTF-8")
    payload = F.to_json(
        F.struct(
            F.col("url").alias("u"),
            F.regexp_extract(s, r"<title>([^<]*)</title>", 1).alias("t"),
            F.regexp_extract_all(s, F.lit(r'href="([^"]*)"'), 1).alias("l"),
        )
    )
    rec = wat_record_col(
        F.col("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        payload,
    )
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    blobs = (
        pages.select(host.alias("host"), F.col("url"), rec.alias("_rec"))
        .groupBy("host")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("url", "_rec"))),
                        lambda x: x["_rec"],
                    ),
                    "",
                ),
                "utf-8",
            ).alias("content")
        )
    )
    recs = scan_warc_blobs(blobs, path_col="host", content_col="content")
    meta_schema = T.StructType(
        [
            T.StructField("u", T.StringType()),
            T.StructField("t", T.StringType()),
            T.StructField("l", T.ArrayType(T.StringType())),
        ]
    )
    parsed = recs.select(
        F.col("target_uri").alias("url"),
        F.col("warc_type"),
        F.from_json(F.decode("payload_bytes", "UTF-8"), meta_schema).alias("m"),
    )
    return parsed.select(
        "url",
        "warc_type",
        F.col("m.t").alias("title"),
        F.size("m.l").cast("int").alias("n_links"),
    )


def q_keep_longest_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-aware representative selection: per near-dup cluster
    # keep the LONGEST member (the standard "keep the most complete
    # variant" policy — a truncated mirror loses to its full original,
    # where min-doc-id rep selection would keep whichever came first).
    # One join + one rep-keyed aggregate with min_by on (-len, id) —
    # no per-cluster window.
    nd = q_neardup_dedupe(spark, sf_dir)
    lens = _aug_docs(spark, sf_dir).select(
        "doc_id", F.length("text").cast("long").alias("len")
    )
    return (
        nd.join(lens, "doc_id")
        .groupBy("rep_id")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.expr("min_by(doc_id, struct(-len, doc_id))").cast("long").alias("kept_doc_id"),
            F.max("len").cast("long").alias("kept_len"),
        )
    )


def q_robots_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robots.txt change detection between two crawl snapshots: per
    # host, rules added/removed by kind and the tightened / loosened /
    # mixed / unchanged classification that decides whether the host's
    # schedule needs rebuilding (a new Disallow invalidates queued
    # frontier rows; a removed one unlocks crawl space). Explode both
    # rule snapshots -> full outer join on (host, kind, rule) -> one
    # host rollup.
    u = _urls(spark, sf_dir).select("host", "site_id").distinct()
    empty = F.array().cast("array<string>")

    def rules(m):
        dis = (
            F.when(m == 0, F.array(F.lit("/admin"), F.lit("/*.php$")))
            .when(m == 1, F.array(F.lit("/fish*"), F.lit("/*.htm")))
            .when(m == 2, F.array(F.lit("/")))
            .otherwise(empty)
        )
        alw = (
            F.when(m == 0, F.array(F.lit("/admin/public")))
            .when(m == 1, F.array(F.lit("/docs/")))
            .when(m == 2, F.array(F.lit("/order")))
            .otherwise(empty)
        )
        return dis, alw

    def snapshot(m, tag):
        dis, alw = rules(m)
        d = u.select("host", F.explode(dis).alias("rule")).withColumn(
            "kind", F.lit("disallow")
        )
        a = u.select("host", F.explode(alw).alias("rule")).withColumn(
            "kind", F.lit("allow")
        )
        return d.unionByName(a).withColumn(tag, F.lit(1))

    v1 = snapshot(F.col("site_id") % 4, "_v1")
    # v2 = v1 plus targeted edits keyed by site_id % 5 (independent of
    # the %4 rule-set key): +disallow (tightened), +allow (loosened),
    # both (mixed), untouched (unchanged)
    k = F.col("site_id") % 5
    extra_dis = u.where((k == 0) | (k == 2)).select(
        "host", F.lit("/tmp").alias("rule"), F.lit("disallow").alias("kind")
    )
    extra_alw = u.where((k == 1) | (k == 2)).select(
        "host", F.lit("/new").alias("rule"), F.lit("allow").alias("kind")
    )
    v2 = (
        v1.drop("_v1")
        .unionByName(extra_dis)
        .unionByName(extra_alw)
        .withColumn("_v2", F.lit(1))
    )
    j = v1.join(v2, ["host", "kind", "rule"], "full_outer")
    per = j.groupBy("host").agg(
        F.sum(F.when(F.col("_v2").isNotNull() & F.col("_v1").isNull() & (F.col("kind") == "disallow"), 1).otherwise(0)).cast("long").alias("dis_added"),
        F.sum(F.when(F.col("_v1").isNotNull() & F.col("_v2").isNull() & (F.col("kind") == "disallow"), 1).otherwise(0)).cast("long").alias("dis_removed"),
        F.sum(F.when(F.col("_v2").isNotNull() & F.col("_v1").isNull() & (F.col("kind") == "allow"), 1).otherwise(0)).cast("long").alias("alw_added"),
        F.sum(F.when(F.col("_v1").isNotNull() & F.col("_v2").isNull() & (F.col("kind") == "allow"), 1).otherwise(0)).cast("long").alias("alw_removed"),
    )
    tighter = (F.col("dis_added") > 0) | (F.col("alw_removed") > 0)
    looser = (F.col("dis_removed") > 0) | (F.col("alw_added") > 0)
    return per.withColumn(
        "change",
        F.when(tighter & looser, F.lit("mixed"))
        .when(tighter, F.lit("tightened"))
        .when(looser, F.lit("loosened"))
        .otherwise(F.lit("unchanged")),
    )


def q_anchor_stuffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source-host anchor-text concentration (keyword-stuffing /
    # template-spam signal): (host, text) count shuffle + host agg
    # with min_by top text — no per-host window
    from sandcrawler_spark.operators.linkgraph import (
        anchor_stuffing,
        extract_anchor_texts,
    )

    return anchor_stuffing(extract_anchor_texts(_link_pages(spark, sf_dir)))


def q_capture_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host capture completeness: how much of the requested seed
    # list has at least one good (200, non-revisit) capture — the
    # "how much of the site do we HAVE" table that drives re-seeding;
    # distinct-project both sides, one left join, one host rollup
    c = _corpus(spark)
    req = c["ingest_request"].select(F.col("base_url").alias("url")).distinct()
    caps = (
        c["cdx"]
        .where((F.col("status_code") == 200) & (F.col("mimetype") != "warc/revisit"))
        .select("url")
        .distinct()
        .withColumn("_cap", F.lit(1))
    )
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    return (
        req.join(caps, "url", "left")
        .select(host.alias("host"), F.coalesce("_cap", F.lit(0)).alias("_cap"))
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_requested"),
            F.sum("_cap").cast("long").alias("n_captured"),
        )
        .withColumn(
            "coverage_ppm",
            F.expr("CAST((1000000 * n_captured) div n_requested AS BIGINT)"),
        )
    )


def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sqrt-temperature training-mixture plan: epochs-per-source a
    # token budget implies; one source agg + 1-row total broadcast,
    # all-integer (isqrt) arithmetic
    from sandcrawler_spark.operators.sampling import mixture_epochs

    return mixture_epochs(_t(spark, sf_dir, "documents"), group_col="source")


def q_cdx_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDX-11 WRITE side: format the capture index as classic CDX lines
    # (pure Catalyst string assembly), then re-parse through the S1
    # line parser — the codec roundtrip the reference's pig-era CDX
    # dumps depend on. The digest column carries a valid base32 token
    # derived from the md5 (hex->A..P alphabet map) so the parser's
    # alnum-32 gate and field slicing are exercised end-to-end.
    from sandcrawler_spark.functions.cdxfmt import parse_cdx_lines

    caps = _captures(spark, sf_dir)
    surt = F.concat(
        F.lit("org,example,stream)/u/"),
        F.regexp_extract("url", r"/u/(\d+)$", 1),
    )
    b32 = F.translate(F.col("sha1hex"), "0123456789abcdef", "ABCDEFGHIJKLMNOP")
    line = F.concat_ws(
        " ",
        surt,
        F.col("datetime"),
        F.col("url"),
        F.col("mimetype"),
        F.col("status_code").cast("string"),
        b32,
        F.lit("-"),
        F.lit("-"),
        F.col("warc_csize").cast("string"),
        (F.col("event_id") % 100000).cast("string"),
        F.col("warc_path"),
    )
    parsed = parse_cdx_lines(caps.select(line.alias("value")), value_col="value")
    return parsed.drop("sha1hex")


def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup cluster-size distribution (how much of the corpus is
    # singleton vs small-cluster vs boilerplate-blob): one rollup on
    # top of the LSH->verify->CC pipeline; its oracle mechanically
    # wraps the neardup_dedupe twin
    nd = q_neardup_dedupe(spark, sf_dir)
    sizes = nd.groupBy("rep_id").agg(F.count("*").cast("long").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    )


def q_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (bands, rows) sweep over ONE k=8 MinHash signature: empirical
    # candidate volume / recall / precision vs the exact Jaccard>=1/2
    # truth (integer cross-multiplied — no float crosses engines).
    # Eval-only all-pairs truth on the tiny planted-dup fixture, the
    # dedupe_recall discipline
    from sandcrawler_spark.operators.dedupe import lsh_tuning

    return lsh_tuning(_aug_docs(spark, sf_dir), n_shingle=3)


def q_robots_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host share of the frontier blocked by robots rules — the
    # crawl-planning rollup of robots_match (how much of a host's
    # queue is even fetchable decides its budget allocation); one
    # host-keyed aggregate on top of the RFC 9309 matcher
    rm = q_robots_match(spark, sf_dir)
    return rm.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.when(F.col("disallowed"), 1).otherwise(0)).cast("long").alias("n_blocked"),
    ).withColumn(
        "blocked_ppm",
        F.expr("CAST((1000000 * n_blocked) div n_urls AS BIGINT)"),
    )


def q_outlink_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-host outlink-target Shannon entropy (link-farm funnel
    # signal) in exact integer micro-nats over the contracted host
    # graph — one host-keyed aggregate after the host_graph groupBy
    from sandcrawler_spark.operators.linkgraph import host_graph, host_outlink_entropy

    return host_outlink_entropy(host_graph(_outlink_edges(spark, sf_dir)))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal 1->k plumbing: stride-10 video frame sampling as a
    # mapInPandas fan-out stage over binary content (reference analog:
    # pdfextract.py:264-407 page-0 render generalized to frame grabs);
    # the stub decode is md5-hexchar arithmetic so DuckDB recomputes
    # every frame row exactly (multimodal.py sample_frames)
    from sandcrawler_spark.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return sample_frames(d, "doc_id", "content", every_n=10).select(
        "doc_id", "frame_idx", "frame_sig"
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal resize plumbing: fit stub-decoded dims into the
    # reference's 180x300 thumbnail box with all-integer aspect-ratio
    # math, 1:1 Arrow batch contract (multimodal.py resize_plan)
    from sandcrawler_spark.multimodal import resize_plan

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return resize_plan(d, "doc_id", "content", box_w=180, box_h=300).select(
        "doc_id", "width", "height", "out_w", "out_h", "resized"
    )


def q_ip_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # virtual-host collapse: politeness keyed by resolved server IP so
    # co-hosted hostnames share one quota/round budget (shared hosting
    # breaks per-host throttling; operators/ipschedule.py). Stub DNS is
    # md5-hexchar arithmetic -> the full schedule has a SQL twin.
    from sandcrawler_spark.operators.ipschedule import schedule_by_ip

    urls = _urls(spark, sf_dir).select("url", "host", "priority")
    s = schedule_by_ip(urls, n_ips=16)
    return s.select(
        "url",
        "host",
        "ip",
        "priority",
        F.col("quota").cast("int").alias("quota"),
        F.col("crawl_round").cast("int").alias("crawl_round"),
        F.col("seq_in_round").cast("int").alias("seq_in_round"),
    )


def q_crawl_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # north-star lineage receipt as one query: seed -> frontier ->
    # unseen (real left-anti) -> robots-allowed (real RFC 9309 gate
    # inside schedule_politeness) -> scheduled first-10-rounds ->
    # fetch-sim, each stage's row count in pipeline order, so a corpus
    # build's funnel is a driver-checkable artifact
    from sandcrawler_spark.operators.politeness import schedule_politeness

    urls = _urls(spark, sf_dir)
    frontier = urls.select("url", "host", "priority", "o_orderkey")
    seeds = frontier.select("host").distinct()
    seen = frontier.filter(F.col("o_orderkey") % 3 == 0).select("url")
    unseen = frontier.join(seen, "url", "left_anti")
    robots = seeds.select(
        "host",
        F.lit(4).cast("int").alias("max_parallel"),
        F.lit(0.5).alias("crawl_delay_s"),
        F.array(F.lit("/order/9")).alias("disallow_prefixes"),
    )
    sched = schedule_politeness(unseen.select("url", "host", "priority"), robots)
    allowed = sched.filter(~F.col("robots_excluded"))
    sched10 = allowed.filter(F.col("crawl_round") < 10)
    fetched = sched10.filter(F.substring(F.md5("url"), 1, 1) <= "b")
    stages = [
        (1, "seed_hosts", seeds),
        (2, "frontier", frontier),
        (3, "unseen", unseen),
        (4, "robots_allowed", allowed),
        (5, "scheduled_r10", sched10),
        (6, "fetched_sim", fetched),
    ]
    out = None
    for i, name, d in stages:
        c = d.agg(F.count("*").alias("n_rows")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_rows",
        )
        out = c if out is None else out.unionByName(c)
    return out


def _dhash_images_oracle() -> str:
    # the 60-term hash expression is generated from the SAME constant
    # plan dhash_col uses — the two engines share one source of truth
    from sandcrawler_spark.operators.dhash import BAND_BITS, BAND_MASK, N_BANDS, dhash_sql

    return f"""
WITH m AS (
  SELECT doc_id, md5(text) AS h
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
d AS (SELECT doc_id, {dhash_sql('h')} AS dhash FROM m),
b AS (
  SELECT doc_id, dhash, band_no, (dhash >> (band_no * {BAND_BITS})) & {BAND_MASK} AS band_val
  FROM d, (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band_no)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.dhash AS h_a, c.dhash AS h_b
  FROM b a JOIN b c ON a.band_no = c.band_no AND a.band_val = c.band_val AND a.doc_id < c.doc_id
),
ham AS (
  SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming FROM pairs
  WHERE bit_count(xor(h_a, h_b)) <= 10
),
sides AS (
  SELECT id_a AS doc_id, hamming FROM ham
  UNION ALL SELECT id_b, hamming FROM ham
),
stats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners, CAST(MIN(hamming) AS INT) AS min_hamming
  FROM sides GROUP BY doc_id
)
SELECT d.doc_id, d.dhash,
       CAST(COALESCE(s.n_partners, 0) AS BIGINT) AS n_partners,
       s.min_hamming
FROM d LEFT JOIN stats s ON d.doc_id = s.doc_id
"""


def q_dhash_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    # perceptual image near-dup: 60-bit dHash (whole-stage codegen, no
    # Python) + banded Hamming candidates — the SimHash pigeonhole
    # discipline applied to the image modality; decode stubbed
    # (operators/dhash.py, md5-hexchar brightness grid so DuckDB
    # recomputes every bit)
    from sandcrawler_spark.operators.dhash import dhash_profile

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return dhash_profile(d, "doc_id", "content", max_hamming=10).select(
        "doc_id", "dhash", "n_partners", "min_hamming"
    )


def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # audio silence-split chunking (VAD analog): stub per-window energy
    # -> gaps-and-islands in pure Catalyst; integer-exact mean energy
    # (permille) so no float rounding boundary exists between engines
    from sandcrawler_spark.operators.audiochunks import silence_chunks

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return silence_chunks(d, "doc_id", "content").select(
        "doc_id", "chunk_idx", "start_w", "end_w", "n_win", "mean_energy_permille"
    )


def q_cdn_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDN-aware politeness key selection: CDN-served hosts keep
    # per-HOST quotas (a CDN edge is engineered for fan-out), origin
    # hosts collapse to per-IP quotas (operators/ipschedule.py)
    from sandcrawler_spark.operators.ipschedule import schedule_cdn_aware

    urls = _urls(spark, sf_dir).select("url", "host", "priority")
    s = schedule_cdn_aware(urls, n_ips=16)
    return s.select(
        "url",
        "host",
        "ip",
        "is_cdn",
        "sched_key",
        "priority",
        F.col("quota").cast("int").alias("quota"),
        F.col("crawl_round").cast("int").alias("crawl_round"),
        F.col("seq_in_round").cast("int").alias("seq_in_round"),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SCD type-2 interval build from an observation log: collapse
    # consecutive duplicate states, [valid_from, valid_to) intervals,
    # version + is_current — warehouse-grade history for recrawl state
    # (operators/scd.py; one shuffle, two same-key windows)
    from sandcrawler_spark.operators.scd import scd2_build

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"), "ts", F.col("event_type").alias("value"), "event_id"
    )
    return scd2_build(e, "entity", "ts", "value", tiebreak_col="event_id").select(
        "entity", "value", "valid_from", "valid_to", "version", "is_current"
    )


def q_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DOM-skeleton template clustering over the raw page store: tag
    # sequence md5 per page (codegen; html never shuffles), one
    # (host, sig) groupBy whose key space is #templates not #pages
    from sandcrawler_spark.functions.templates import template_clusters

    return template_clusters(_corpus(spark)["pages"]).select(
        "host", "skeleton_sig", "n_pages", "rep_url", "n_tags", "n_uniq_tags"
    )


def q_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared skew diagnostician (operators/skew.py): measure the
    # shuffle-key distribution, prescribe per-key salt counts. Input
    # reproduces CDN/shared-hosting collapse: two virtual hubs absorb
    # 8 hosts each -> ~8x the p95 key load
    from sandcrawler_spark.operators.skew import skew_advisor

    u = _urls(spark, sf_dir)
    key = (
        F.when(F.col("site_id") % 7 == 0, F.lit("hub.example.com"))
        .when(F.col("site_id") % 7 == 1, F.lit("mirror.example.com"))
        .otherwise(F.col("host"))
    )
    # q=900 not the 950 default: at sf-test scale there are only ~38
    # distinct keys, so the p95 position lands ON the two hot keys and
    # the advisor would (correctly, but uselessly) see no skew. p90
    # still sits inside the cold mass at any corpus size.
    return skew_advisor(
        u.select(key.alias("skew_host")), "skew_host", q_permille=900, skew_factor=4
    )


def q_warc_cdx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # archive integrity audit: FULL-OUTER reconcile the CDX index
    # against the parsed WARC store at (path, offset) — phantom index
    # rows, unindexed records, and digest corruption are injected
    # deterministically and must be counted exactly per file. The
    # operational check behind the reference's petabox addressing
    # (ia.py fetch_petabox asserts digest/offset agreement per lookup;
    # this is the corpus-wide batch form)
    from sandcrawler_spark.sources.warcfmt import scan_warc_blobs

    blobs, cdx = _warc_build(spark, sf_dir)
    # index drift, all md5-deterministic: drop ~1/16 of entries
    # (unindexed records), corrupt ~1/16 digests, add 10 phantoms
    idx = cdx.filter(F.substring("digest", 1, 1) != "a").withColumn(
        "digest",
        F.when(F.substring("digest", 2, 1) == "b", F.md5("digest")).otherwise(
            F.col("digest")
        ),
    )
    d = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 210)
    )
    phantom = d.select(
        F.concat(
            F.lit("warc/part-"), (F.col("doc_id") % 8).cast("string"), F.lit(".warc")
        ).alias("path"),
        (F.lit(10_000_000) + F.col("doc_id")).cast("long").alias("offset"),
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.md5("text").alias("digest"),
    )
    idx = idx.unionByName(phantom)
    parsed = scan_warc_blobs(blobs).select(
        F.col("path").alias("s_path"), "rec_offset", "payload_md5"
    )
    j = idx.join(
        parsed,
        (idx["path"] == parsed["s_path"]) & (idx["offset"] == parsed["rec_offset"]),
        "full_outer",
    )
    status = (
        F.when(F.col("url").isNull(), F.lit("unindexed_record"))
        .when(F.col("s_path").isNull(), F.lit("phantom_index"))
        .when(F.col("digest") == F.col("payload_md5"), F.lit("ok"))
        .otherwise(F.lit("digest_mismatch"))
    )
    return (
        j.select(F.coalesce("path", "s_path").alias("warc_file"), status.alias("st"))
        .groupBy("warc_file")
        .agg(
            F.sum(F.when(F.col("st") == "ok", 1).otherwise(0)).cast("long").alias("n_ok"),
            F.sum(F.when(F.col("st") == "digest_mismatch", 1).otherwise(0)).cast("long").alias("n_digest_mismatch"),
            F.sum(F.when(F.col("st") == "phantom_index", 1).otherwise(0)).cast("long").alias("n_phantom_index"),
            F.sum(F.when(F.col("st") == "unindexed_record", 1).otherwise(0)).cast("long").alias("n_unindexed_record"),
        )
    )


def _redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic functional redirect graph over dense customer
    keys: node(k) -> node(k-1) when k%10 != 0 (chains of 1..9 hops
    terminating at decade nodes), and decade nodes at k%50 == 0
    redirect to node(k+3), closing a 4-cycle k -> k+3 -> k+2 -> k+1
    -> k (every chain feeding those decades becomes a redirect loop)."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")

    def node(expr):
        return F.concat(F.lit("https://r.example.org/u/"), expr.cast("string"))

    chain = c.filter(k % 10 != 0).select(
        node(k).alias("src"), node(k - 1).alias("dst")
    )
    cyc = c.filter(k % 50 == 0).select(
        node(k).alias("src"), node(k + 3).alias("dst")
    )
    return chain.unionByName(cyc)


def q_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # batch redirect-chain closure: every observed redirect src
    # resolved to its terminal landing URL via pointer jumping
    # (O(log H) shuffles, not H sequential joins); loops and over-cap
    # chains surface as final_url NULL / n_hops -1 — the index-side
    # form of the reference's per-fetch hop loop + 'redirect-loop'
    # verdict (ia.py redirect following, ingest.py hop caps)
    from sandcrawler_spark.operators.redirects import resolve_redirects

    return resolve_redirects(_redirect_edges(spark, sf_dir), max_hops=32)


def q_fuzzy_url_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # edit-distance<=2 join between a deterministically-corrupted seed
    # list (one char overwritten) and the full frontier — the batch
    # form of the reference's pairwise url_fuzzy_equal (misc.py).
    # Blocking (prefix-filtered q-grams) is provably exact, so the
    # oracle is the brute cross join + levenshtein filter
    from sandcrawler_spark.operators.fuzzyjoin import fuzzy_join

    u = _urls(spark, sf_dir)
    seeds = u.filter(F.col("o_orderkey") % 100 == 0).select(
        F.concat(
            F.substring("url", 1, 14), F.lit("x"), F.expr("substring(url, 16)")
        ).alias("seed_url")
    )
    return fuzzy_join(seeds, u.select("url"), "seed_url", "url", k=2, q=3)


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc-level PMI collocations over the top-V vocabulary — phrase
    # mining / tokenizer-merge-candidate statistic; vocab-bounded pair
    # expansion, integer micro-nat scores
    from sandcrawler_spark.operators.collocations import pmi_pairs

    return pmi_pairs(_t(spark, sf_dir, "documents"), top_v=1000, min_pair=5)


def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # greedy k-center (farthest-point traversal) diversity coreset
    # over embeddings — k narrow passes + TakeOrdered argmin; the
    # k-row result is driver-assembled (like seed_cover), so it is
    # excluded from the plan audit
    from sandcrawler_spark.operators.kcenter import kcenter_select

    return kcenter_select(_t(spark, sf_dir, "embeddings"), k=8)


def q_cache_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 9111 revalidation plan from synthesized caching headers: the
    # Spark path PARSES real Cache-Control strings (delimiter-guarded
    # directive regexps); the oracle derives the expected plan from
    # the generator arms — parser parity, not parse-replay
    from sandcrawler_spark.functions.cachectl import cache_plan_cols

    u = _urls(spark, sf_dir)
    k = F.col("o_orderkey")
    fetched = (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long") * 86400)
    cc = (
        F.when(k % 6 == 0, F.lit("public, max-age=3600"))
        .when(k % 6 == 1, F.lit("no-store"))
        .when(k % 6 == 2, F.lit("no-cache, private"))
        .when(k % 6 == 3, F.lit(""))
        .when(k % 6 == 4, F.lit("max-age=0, must-revalidate"))
        .otherwise(F.lit("public"))
    )
    expires = F.when(k % 4 == 0, fetched + F.lit(172800).cast("long"))
    etag = F.when(k % 3 == 0, F.md5("url"))
    lm = F.when(k % 5 == 0, fetched - F.lit(2592000).cast("long"))
    return u.select(
        "url",
        *cache_plan_cols(cc, fetched, expires, etag, lm),
    )


def q_subdomain_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wildcard-DNS trap detection: example.com carries 50 minted
    # 'siteN' hostnames (one digit-template -> trap); example.org
    # carries ~62 organic part-name hostnames (full template
    # diversity -> clean). PSL domain lift is broadcast-only
    from sandcrawler_spark.operators.traps import subdomain_traps

    minted = _urls(spark, sf_dir).select("host")
    organic = _t(spark, sf_dir, "part").select(
        F.concat(
            F.regexp_replace(F.lower(F.col("p_name")), r"\s+", "-"),
            F.lit(".example.org"),
        ).alias("host")
    )
    return subdomain_traps(minted.unionByName(organic), min_hosts=20)


def q_nepotistic_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Davison-style same-IP link discounting over the host graph:
    # ownership links (both endpoints on one stub-resolved address)
    # split out of the endorsement out-weight per source host
    from sandcrawler_spark.operators.linkgraph import host_graph, nepotistic_links

    return nepotistic_links(host_graph(_outlink_edges(spark, sf_dir)), n_ips=16)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive-pair mining: per anchor the top-5 corpus rows inside
    # the cosine band [0.30, 0.95) — hard-but-not-positive negatives
    # for retrieval training; two-level exact top-k, band pre-filter
    from sandcrawler_spark.operators.similarity import hard_negatives

    e = _t(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return hard_negatives(anchors, e, k=5, lo=0.30, hi=0.95)


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # encoding-declaration QA: the Spark path PARSES real bytes (BOM
    # hex, meta regexp over a try_validate_utf8 head, Content-Type
    # param) while the oracle derives the expectation from the
    # generator arms — WHATWG precedence BOM > header > meta
    from sandcrawler_spark.functions.charset import charset_cols

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    meta = (
        F.when(k % 4 == 0, F.lit('<meta charset="utf-8">'))
        .when(
            k % 4 == 1,
            F.lit('<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'),
        )
        .when(k % 4 == 2, F.lit(""))
        .otherwise(F.lit("<meta charset=cp1252>"))
    )
    ctype = (
        F.when(k % 3 == 0, F.lit("text/html; charset=UTF-8"))
        .when(k % 3 == 1, F.lit("text/html"))
        .otherwise(F.lit("text/html; charset=latin1"))
    )
    bom = F.when(k % 5 == 0, F.lit("\ufeff")).otherwise(F.lit(""))
    body = F.encode(
        F.concat(bom, F.lit("<html><head>"), meta, F.lit("</head><body>x</body></html>")),
        "utf-8",
    )
    return d.select("doc_id", *charset_cols(body, ctype))


def _identifier_plant_col() -> F.Column:
    """Deterministic scholarly-identifier planting: every doc gets a
    DOI; subsets get valid AND checksum-broken arXiv/ISSN/ISBN-13/ORCID
    ids, so the validation arithmetic is exercised both ways. The
    check digits of the VALID plants are computed with the same
    Catalyst arithmetic the extractor validates with — but the
    extractor only ever sees the final string, so generation and
    validation stay independent code paths over the same algorithm."""
    from sandcrawler_spark.functions.identifiers import (
        isbn13_check_col,
        issn_check_col,
        orcid_check_col,
    )

    did = F.col("doc_id")
    s = did.cast("string")

    def rot11(c):  # wrong-but-well-formed mod-11 check char
        return (
            F.when(c == "X", F.lit("0"))
            .when(c == "9", F.lit("X"))
            .otherwise((c.cast("int") + 1).cast("string"))
        )

    def rot10(c):
        return F.when(c == "9", F.lit("0")).otherwise(
            (c.cast("int") + 1).cast("string")
        )

    doi = F.concat(
        F.lit(" doi:10."), (F.lit(1000) + did % 9000).cast("string"),
        F.lit("/sc."), s,
    )
    arx_v = F.concat(
        F.lit(" arXiv:24"), F.lpad((did % 12 + 1).cast("string"), 2, "0"),
        F.lit("."), F.lpad((did % 100000).cast("string"), 5, "0"),
    )
    arx_bad = F.concat(F.lit(" arXiv:2413."), F.lpad((did % 100000).cast("string"), 5, "0"))
    base7 = F.lpad((did % 10000000).cast("string"), 7, "0")
    issn_body = F.concat(F.substring(base7, 1, 4), F.lit("-"), F.substring(base7, 5, 3))
    issn_c = issn_check_col(issn_body)
    isbn12 = F.concat(F.lit("978"), F.lpad((did % 1000000000).cast("string"), 9, "0"))
    isbn_c = isbn13_check_col(isbn12)
    orc15 = F.concat(F.lit("000"), F.lpad((did % 1000000000000).cast("string"), 12, "0"))
    orc_body = F.concat(
        F.substring(orc15, 1, 4), F.lit("-"), F.substring(orc15, 5, 4),
        F.lit("-"), F.substring(orc15, 9, 4), F.lit("-"), F.substring(orc15, 13, 3),
    )
    orc_c = orcid_check_col(orc_body)

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    return F.concat(
        F.col("text"),
        doi,
        opt(did % 2 == 0, arx_v),
        opt(did % 13 == 0, arx_bad),
        opt(did % 3 == 0, F.concat(F.lit(" ISSN "), issn_body, issn_c)),
        opt(did % 5 == 0, F.concat(F.lit(" ISSN "), issn_body, rot11(issn_c))),
        opt(did % 4 == 0, F.concat(F.lit(" ISBN "), isbn12, isbn_c)),
        opt(did % 7 == 0, F.concat(F.lit(" ISBN "), isbn12, rot10(isbn_c))),
        opt(did % 6 == 0, F.concat(F.lit(" https://orcid.org/"), orc_body, orc_c)),
        opt(did % 11 == 0, F.concat(F.lit(" https://orcid.org/"), orc_body, rot11(orc_c))),
    )


def _html_blocks_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages with planted <table> and <pre> blocks —
    data tables, a layout table, class-hinted and heuristic-hinted
    code (incl. the unescaped `#include <stdio.h>` trap every regex
    tag-stripper must handle identically in both engines)."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = did.cast("string")

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><body><p>"), F.substring(F.col("text"), 1, 40), F.lit("</p>"),
        opt(did % 2 == 0, F.concat(
            F.lit("<table><tr><th>h1</th><th>h2</th></tr><tr><td>a"), s,
            F.lit("</td><td>b</td></tr></table>"),
        )),
        opt(did % 6 == 0, F.lit("<table><tr><td>nav</td></tr></table>")),
        opt(did % 3 == 0, F.concat(
            F.lit('<pre><code class="language-python">def f():\n    return '),
            s, F.lit("\n</code></pre>"),
        )),
        opt(did % 5 == 0,
            F.lit("<pre>#include <stdio.h>\nint main() { return 0; }</pre>")),
        F.lit("</body></html>"),
    )
    return d.select("doc_id", html.alias("html"))


def q_html_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # structured-block extraction for training data: <table> geometry
    # (data-vs-layout heuristic) + <pre> code blocks (language hints)
    # — the modalities generic prose extraction mangles
    from sandcrawler_spark.functions.htmlblocks import code_blocks, html_tables

    pages = _html_blocks_pages(spark, sf_dir)
    t = html_tables(pages).select(
        "doc_id", F.lit("table").alias("kind"), "idx", "n_rows", "n_cells",
        "is_data_table",
        F.lit(None).cast("int").alias("n_lines"),
        F.lit(None).cast("int").alias("n_chars"),
        F.lit(None).cast("string").alias("lang_hint"),
        "content_md5",
    )
    c = code_blocks(pages).select(
        "doc_id", F.lit("code").alias("kind"), "idx",
        F.lit(None).cast("int").alias("n_rows"),
        F.lit(None).cast("int").alias("n_cells"),
        F.lit(None).cast("boolean").alias("is_data_table"),
        "n_lines", "n_chars", "lang_hint", "content_md5",
    )
    return t.unionByName(c)


def _html_blocks_oracle() -> str:
    from sandcrawler_spark.functions.htmlblocks import blocks_oracle_sql

    planted = """
SELECT doc_id,
  '<html><body><p>' || substring(text, 1, 40) || '</p>'
  || CASE WHEN doc_id % 2 = 0
       THEN '<table><tr><th>h1</th><th>h2</th></tr><tr><td>a'
            || CAST(doc_id AS VARCHAR) || '</td><td>b</td></tr></table>'
       ELSE '' END
  || CASE WHEN doc_id % 6 = 0
       THEN '<table><tr><td>nav</td></tr></table>' ELSE '' END
  || CASE WHEN doc_id % 3 = 0
       THEN '<pre><code class="language-python">def f():' || chr(10)
            || '    return ' || CAST(doc_id AS VARCHAR) || chr(10)
            || '</code></pre>'
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN '<pre>#include <stdio.h>' || chr(10)
            || 'int main() { return 0; }</pre>'
       ELSE '' END
  || '</body></html>' AS html
FROM documents
""".strip()
    return blocks_oracle_sql(planted)


_URL_RESOLVE_BATTERY = [
    "g", "./g", "g/", "/g", "//cdn.example.net/lib.js", "?y=2", "g?y",
    "#frag", ";x", "", ".", "..", "../g", "../../g", "../../../g",
    "g/../h", "g/./h", "javascript:void(0)", "mailto:a@b.c",
    "https://other.example.com/x/../y?z", "./../img/../css/site.css",
    "sub/dir/",
]


def q_url_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full RFC 3986 §5.2 reference resolution (merge + the
    # remove_dot_segments stack algorithm as a segment fold) — the
    # dot-relative hrefs linkgraph._resolve_dst documents dropping;
    # battery cycles the RFC's own §5.4 forms against per-doc bases
    from sandcrawler_spark.functions.urlresolve import resolve_url

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base = F.concat(
        F.lit("https://site"), (did % 7).cast("string"),
        F.lit(".example.org/s"), (did % 4).cast("string"),
        F.lit("/p/doc.html?ref="), did.cast("string"),
    )
    href = F.element_at(
        F.array(*[F.lit(s) for s in _URL_RESOLVE_BATTERY]),
        (did % len(_URL_RESOLVE_BATTERY) + 1).cast("int"),
    )
    return d.select(
        "doc_id", href.alias("href"),
        resolve_url(base, href).alias("resolved"),
    )


def _url_resolve_oracle() -> str:
    from sandcrawler_spark.functions.urlresolve import resolve_url_sql

    battery = ", ".join("'" + s.replace("'", "''") + "'" for s in _URL_RESOLVE_BATTERY)
    return f"""
WITH _ur AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/s'
           || CAST(doc_id % 4 AS VARCHAR) || '/p/doc.html?ref='
           || CAST(doc_id AS VARCHAR) AS base,
         ([{battery}])[CAST(doc_id % {len(_URL_RESOLVE_BATTERY)} + 1 AS INT)] AS href
  FROM documents
)
SELECT doc_id, href, {resolve_url_sql("base", "href")} AS resolved
FROM _ur
""".strip()


def q_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-bit minhash calibration: the 32x-smaller sketch's estimate
    # next to exact shingle Jaccard on true near-dup pairs AND
    # unrelated pairs — the accuracy relation that decides whether
    # b-bit sketches can replace full signatures at a given threshold
    from sandcrawler_spark.operators.dedupe import bbit_jaccard_pairs

    docs = _aug_docs(spark, sf_dir)
    near = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 100000).alias("id_b")
    )
    far = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 99)).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    return bbit_jaccard_pairs(docs, near.unionByName(far), n_shingle=3, k=64)


_BBIT_MINHASH_ORACLE = f"""
WITH {_AUG_DOCS_CTE.strip()},
{_SHINGLES_CTE.strip()},
sigb AS (
  SELECT doc_id, sh,
         [CAST(CAST('0x' || substr(
            list_min(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ':' || s))),
            32, 1) AS UBIGINT) % 2 AS INT) FOR i IN range(0, 64)] AS bits
  FROM shingled WHERE len(sh) > 0
),
pairs AS (
  SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM aug_docs WHERE doc_id < 50
  UNION ALL
  SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM aug_docs
  WHERE doc_id % 2 = 0 AND doc_id < 99
),
joined AS (
  SELECT p.id_a, p.id_b,
         CAST(len(list_filter(range(1, 65), j -> a.bits[j] = b.bits[j])) AS BIGINT)
           AS n_match,
         a.sh AS sh_a, b.sh AS sh_b
  FROM pairs p
  JOIN sigb a ON a.doc_id = p.id_a
  JOIN sigb b ON b.doc_id = p.id_b
)
SELECT id_a, id_b, CAST(n_match AS INT) AS n_match,
       greatest(CAST(0 AS BIGINT),
                ((2 * n_match - 64) * CAST(1000000 AS BIGINT)) // 64) AS jhat_micro,
       (CAST(1000000 AS BIGINT) * len(list_intersect(sh_a, sh_b)))
         // len(list_distinct(list_concat(sh_a, sh_b))) AS jexact_micro,
       abs(greatest(CAST(0 AS BIGINT),
                    ((2 * n_match - 64) * CAST(1000000 AS BIGINT)) // 64)
           - (CAST(1000000 AS BIGINT) * len(list_intersect(sh_a, sh_b)))
             // len(list_distinct(list_concat(sh_a, sh_b)))) AS abs_err_micro
FROM joined
""".strip()


def q_table_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    # markdown pipe-row linearization of extracted tables — the
    # training-format rendering (pipe-escape inside cells, two explode
    # levels, order-preserving row indices)
    from sandcrawler_spark.functions.htmlblocks import table_markdown_rows

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><body>"),
        opt(did % 2 == 0, F.concat(
            F.lit("<table><tr><th>h1</th><th>h2</th></tr><tr><td>a"),
            did.cast("string"),
            F.lit("</td><td>b</td></tr></table>"),
        )),
        opt(did % 6 == 0, F.lit("<table><tr><td>nav</td></tr></table>")),
        F.lit("</body></html>"),
    )
    return table_markdown_rows(d.select("doc_id", html.alias("html")))


def _table_markdown_oracle() -> str:
    from sandcrawler_spark.functions.htmlblocks import table_markdown_oracle_sql

    planted = """
SELECT doc_id,
  '<html><body>'
  || CASE WHEN doc_id % 2 = 0
       THEN '<table><tr><th>h1</th><th>h2</th></tr><tr><td>a'
            || CAST(doc_id AS VARCHAR) || '</td><td>b</td></tr></table>'
       ELSE '' END
  || CASE WHEN doc_id % 6 = 0
       THEN '<table><tr><td>nav</td></tr></table>' ELSE '' END
  || '</body></html>' AS html
FROM documents
""".strip()
    return table_markdown_oracle_sql(planted)


_URL_TAXO_PATHS = [
    "/blog/my-post-title", "/2021/07/headline-story", "/forum/thread/",
    "/docs/api/reference", "/product/widget-", "/tag/history/page/",
    "/about", "/news/2019/11/item", "/category/tools", "/item/sku-",
]

_URL_TAXO_RULES = [
    ("dated-article", r"/20[0-9]{2}/[01][0-9]/"),
    ("blog", r"/blog/"),
    ("forum", r"/(forum|thread)/"),
    ("docs", r"/(docs|documentation)/"),
    ("commerce", r"/(product|item)/"),
    ("listing", r"/(tag|category)/|/page/[0-9]+$"),
]


def q_url_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dolma/C4-style URL-shape taxonomy for mixture planning: path
    # patterns classify pages into content categories BEFORE any
    # fetch — the zero-cost prior that decides crawl priority and
    # corpus mixture shares; first-match-wins ordered rules
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    path = F.concat(
        F.element_at(
            F.array(*[F.lit(p) for p in _URL_TAXO_PATHS]),
            (did % len(_URL_TAXO_PATHS) + 1).cast("int"),
        ),
        did.cast("string"),
    )
    url = F.concat(
        F.lit("https://h"), (did % 9).cast("string"), F.lit(".example.org"), path
    )
    cat = F.lit("other")
    for name, pat in reversed(_URL_TAXO_RULES):
        cat = F.when(path.rlike(pat), F.lit(name)).otherwise(cat)
    depth = (F.size(F.split(path, "/")) - 1).cast("int")
    rows = d.select(url.alias("url"), cat.alias("category"), depth.alias("depth"))
    return rows.groupBy("category").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.min("depth").cast("int").alias("min_depth"),
        F.max("depth").cast("int").alias("max_depth"),
    )


def _url_taxonomy_oracle() -> str:
    paths = ", ".join("'" + p + "'" for p in _URL_TAXO_PATHS)
    case = "CASE\n"
    for name, pat in _URL_TAXO_RULES:
        case += f"    WHEN regexp_matches(path, '{pat}') THEN '{name}'\n"
    case += "    ELSE 'other' END"
    return f"""
WITH u AS (
  SELECT ([{paths}])[CAST(doc_id % {len(_URL_TAXO_PATHS)} + 1 AS INT)]
           || CAST(doc_id AS VARCHAR) AS path
  FROM documents
),
c AS (
  SELECT path, {case} AS category,
         CAST(len(string_split(path, '/')) - 1 AS INT) AS depth
  FROM u
)
SELECT category, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(MIN(depth) AS INT) AS min_depth,
       CAST(MAX(depth) AS INT) AS max_depth
FROM c GROUP BY category
""".strip()


def q_capture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-URL content drift between consecutive captures: token-set
    # Jaccard vs the previous capture (lag over the capture stream) —
    # the text-level complement of recrawl_rates' digest-flip counter,
    # feeding change-rate estimation with HOW MUCH changed, not just
    # whether; capture content synthesized deterministically with a
    # rotating token window so drift is exact in both engines
    caps = _captures(spark, sf_dir)
    w = Window.partitionBy("url").orderBy("datetime")
    idx = F.row_number().over(w)
    c = caps.select("url", "datetime").withColumn("cap_idx", idx)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.concat(F.lit("w"), ((F.col("cap_idx") + j) % 37).cast("string")),
    )
    c = c.withColumn("toks", toks)
    prev = F.lag("toks").over(Window.partitionBy("url").orderBy("cap_idx"))
    c = c.withColumn("prev", prev).filter(F.col("prev").isNotNull())
    jac = F.expr(
        "(CAST(1000000 AS BIGINT) * size(array_intersect(toks, prev))) div "
        "size(array_union(toks, prev))"
    )
    per_cap = c.select("url", "cap_idx", jac.alias("jaccard_micro"))
    return per_cap.groupBy("url").agg(
        F.count("*").cast("int").alias("n_transitions"),
        F.min("jaccard_micro").cast("long").alias("min_jac_micro"),
        F.max("jaccard_micro").cast("long").alias("max_jac_micro"),
        F.sum("jaccard_micro").cast("long").alias("sum_jac_micro"),
    )


_CAPTURE_DRIFT_ORACLE = """
WITH cap AS (
  SELECT url, datetime FROM (
    SELECT 'https://stream.example.org/u/' || CAST(user_id AS VARCHAR) AS url,
           strftime(ts, '%Y%m%d%H%M%S') AS datetime,
           event_id,
           ROW_NUMBER() OVER (
             PARTITION BY 'https://stream.example.org/u/' || CAST(user_id AS VARCHAR),
                          strftime(ts, '%Y%m%d%H%M%S')
             ORDER BY event_id
           ) AS rn
    FROM events
  ) WHERE rn = 1
),
idxd AS (
  SELECT url, datetime,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY datetime) AS cap_idx
  FROM cap
),
tokd AS (
  SELECT url, cap_idx,
         list_transform(range(0, 8),
                        j -> 'w' || CAST((cap_idx + j) % 37 AS VARCHAR)) AS toks
  FROM idxd
),
lagd AS (
  SELECT url, cap_idx, toks,
         lag(toks) OVER (PARTITION BY url ORDER BY cap_idx) AS prev
  FROM tokd
),
jacd AS (
  SELECT url, CAST(cap_idx AS INT) AS cap_idx,
         (CAST(1000000 AS BIGINT) * len(list_intersect(toks, prev)))
           // len(list_distinct(list_concat(toks, prev))) AS jaccard_micro
  FROM lagd WHERE prev IS NOT NULL
)
SELECT url, CAST(COUNT(*) AS INT) AS n_transitions,
       CAST(MIN(jaccard_micro) AS BIGINT) AS min_jac_micro,
       CAST(MAX(jaccard_micro) AS BIGINT) AS max_jac_micro,
       CAST(SUM(jaccard_micro) AS BIGINT) AS sum_jac_micro
FROM jacd GROUP BY url
""".strip()


def q_outlink_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the payoff of the full RFC 3986 resolver on the link graph:
    # pages planted with absolute / protocol-relative / root-relative
    # AND dot-relative hrefs; counts what the deterministic subset
    # (linkgraph._resolve_dst's documented drop of dot-relative forms)
    # recovers vs full resolution — the recovered edges are whole site
    # sections relative-path templates would otherwise hide
    from sandcrawler_spark.functions.urlresolve import resolve_url

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 10).cast("string"), F.lit(".example.org"))
    base = F.concat(F.lit("https://"), host, F.lit("/a/b/page"), did.cast("string"), F.lit(".html"))
    hrefs = F.array(
        F.concat(F.lit("https://ext.example.net/x"), did.cast("string")),
        F.lit("//cdn.example.net/lib.js"),
        F.lit("/rooted/path"),
        F.lit("../up/one"),
        F.lit("./same/dir"),
        F.lit("plain/rel"),
        F.lit("#frag-only"),
    )
    rows = d.select(host.alias("host"), base.alias("base"), F.explode(hrefs).alias("href"))
    subset_ok = (
        F.col("href").rlike("^https?://")
        | F.col("href").rlike("^//")
        | (F.col("href").startswith("/") & ~F.col("href").startswith("//"))
    )
    full = resolve_url(F.col("base"), F.col("href"))
    # fragment-only refs resolve to the base itself — not a NEW edge;
    # exclude them from the full count so 'recovered' means real links
    full_ok = full.isNotNull() & (full != F.col("base"))
    agg = rows.groupBy("host").agg(
        F.count("*").cast("long").alias("n_hrefs"),
        F.sum(subset_ok.cast("long")).cast("long").alias("n_subset"),
        F.sum(full_ok.cast("long")).cast("long").alias("n_full"),
    )
    return agg.select(
        "host", "n_hrefs", "n_subset", "n_full",
        (F.col("n_full") - F.col("n_subset")).cast("long").alias("n_recovered"),
    )


def _outlink_resolved_oracle() -> str:
    from sandcrawler_spark.functions.urlresolve import resolve_url_sql

    return f"""
WITH rows AS (
  SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) || '.example.org' AS host,
         'https://h' || CAST(doc_id % 10 AS VARCHAR)
           || '.example.org/a/b/page' || CAST(doc_id AS VARCHAR) || '.html' AS base,
         UNNEST(['https://ext.example.net/x' || CAST(doc_id AS VARCHAR),
                 '//cdn.example.net/lib.js', '/rooted/path', '../up/one',
                 './same/dir', 'plain/rel', '#frag-only']) AS href
  FROM documents
),
flags AS (
  SELECT host,
         CASE WHEN regexp_matches(href, '^https?://') OR regexp_matches(href, '^//')
                   OR (href LIKE '/%' AND href NOT LIKE '//%')
              THEN 1 ELSE 0 END AS subset_ok,
         CASE WHEN ({resolve_url_sql("base", "href")}) IS NOT NULL
                   AND ({resolve_url_sql("base", "href")}) <> base
              THEN 1 ELSE 0 END AS full_ok
  FROM rows
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_hrefs,
       CAST(SUM(subset_ok) AS BIGINT) AS n_subset,
       CAST(SUM(full_ok) AS BIGINT) AS n_full,
       CAST(SUM(full_ok) - SUM(subset_ok) AS BIGINT) AS n_recovered
FROM flags GROUP BY host
""".strip()


_HTTP_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def q_http_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 7231 HTTP-date triple-format parsing to epoch seconds —
    # pure integer days-from-civil (no engine date functions: pattern
    # dialects and session timezones differ across engines, integer
    # civil-date arithmetic doesn't); malformed every 11th doc -> NULL
    from sandcrawler_spark.functions.httpdate import http_date_cols

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    y = (F.lit(1995) + did % 30).cast("int")
    m = (did % 12 + 1).cast("int")
    dd = (did % 28 + 1).cast("int")
    hh = F.lpad((did % 24).cast("string"), 2, "0")
    mi = F.lpad((did % 60).cast("string"), 2, "0")
    ss = F.lpad((did % 59).cast("string"), 2, "0")
    mon = F.element_at(F.array(*[F.lit(x) for x in _HTTP_MONTHS]), m)
    tpart = F.concat(hh, F.lit(":"), mi, F.lit(":"), ss)
    imf = F.concat(F.lit("Mon, "), F.lpad(dd.cast("string"), 2, "0"), F.lit(" "),
                   mon, F.lit(" "), y.cast("string"), F.lit(" "), tpart, F.lit(" GMT"))
    r850 = F.concat(F.lit("Monday, "), F.lpad(dd.cast("string"), 2, "0"), F.lit("-"),
                    mon, F.lit("-"), F.lpad((y % 100).cast("string"), 2, "0"),
                    F.lit(" "), tpart, F.lit(" GMT"))
    asc_day = F.when(dd < 10, F.concat(F.lit(" "), dd.cast("string"))).otherwise(dd.cast("string"))
    asc = F.concat(F.lit("Mon "), mon, F.lit(" "), asc_day, F.lit(" "), tpart,
                   F.lit(" "), y.cast("string"))
    raw = (
        F.when(did % 11 == 0, F.lit("yesterday"))
        .when(did % 3 == 0, imf)
        .when(did % 3 == 1, r850)
        .otherwise(asc)
    )
    return d.select("doc_id", raw.alias("raw"), *http_date_cols(raw))


def _http_dates_oracle() -> str:
    from sandcrawler_spark.functions.httpdate import http_date_oracle_exprs

    months = ", ".join("'" + x + "'" for x in _HTTP_MONTHS)
    fmt_expr, epoch_expr = http_date_oracle_exprs("raw")
    return f"""
WITH parts AS (
  SELECT doc_id,
         CAST(1995 + doc_id % 30 AS INT) AS y,
         CAST(doc_id % 12 + 1 AS INT) AS m,
         CAST(doc_id % 28 + 1 AS INT) AS dd,
         lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST(doc_id % 59 AS VARCHAR), 2, '0') AS tpart,
         ([{months}])[CAST(doc_id % 12 + 1 AS INT)] AS mon
  FROM documents
),
rawd AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 11 = 0 THEN 'yesterday'
           WHEN doc_id % 3 = 0 THEN
             'Mon, ' || lpad(CAST(dd AS VARCHAR), 2, '0') || ' ' || mon || ' '
             || CAST(y AS VARCHAR) || ' ' || tpart || ' GMT'
           WHEN doc_id % 3 = 1 THEN
             'Monday, ' || lpad(CAST(dd AS VARCHAR), 2, '0') || '-' || mon || '-'
             || lpad(CAST(y % 100 AS VARCHAR), 2, '0') || ' ' || tpart || ' GMT'
           ELSE
             'Mon ' || mon || ' '
             || CASE WHEN dd < 10 THEN ' ' || CAST(dd AS VARCHAR)
                     ELSE CAST(dd AS VARCHAR) END
             || ' ' || tpart || ' ' || CAST(y AS VARCHAR)
         END AS raw
  FROM parts
)
SELECT doc_id, raw, {fmt_expr} AS fmt, {epoch_expr} AS epoch_s
FROM rawd
""".strip()


def q_arc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # legacy ARC container roundtrip (the pre-WARC petabox format the
    # reference's wayback path must read — ia.py:392,446 "(W)ARC"):
    # files BUILT pure-Catalyst (filedesc + length-counted records),
    # re-parsed by the sequential mapInPandas scanner; the oracle
    # rebuilds every header/offset relationally and never runs the
    # scanner — offsets prove the length-walk is byte-exact
    from sandcrawler_spark.sources.arcfmt import (
        arc_filedesc_col,
        arc_record_col,
        scan_arc_blobs,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id")
    url = F.concat(F.lit("https://site"), (did % 10).cast("string"),
                   F.lit(".example.com/doc/"), did.cast("string"))
    ip = F.concat(F.lit("10.0."), (did % 256).cast("string"), F.lit("."),
                  (did % 100).cast("string"))
    date14 = F.concat(F.lit("20200101"), F.lpad((did % 240000).cast("string"), 6, "0"))
    payload = F.concat(F.lit("HTTP/1.1 200 OK\n\n"), F.col("text"))
    recs = d.select(
        did.alias("doc_id"), (did % 8).alias("file_id"),
        arc_record_col(url, ip, date14, F.lit("text/html"), payload).alias("rec"),
    )
    path = F.concat(F.lit("arc/part-"), F.col("file_id").cast("string"), F.lit(".arc"))
    blobs = (
        recs.groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                    lambda s: s["rec"],
                ), "",
            ).alias("body")
        )
        .select(
            path.alias("path"),
            F.encode(F.concat(arc_filedesc_col(path), F.col("body")), "utf-8")
            .alias("content"),
        )
    )
    return scan_arc_blobs(blobs)


_ARC_ROUNDTRIP_ORACLE = """
-- strlen() in DuckDB counts UTF-8 BYTES (length() counts chars), so
-- every length/offset below is byte-based like the engine's
-- octet_length — pinned by test_arc_lengths_are_bytes_on_non_ascii
WITH base AS (
  SELECT doc_id, doc_id % 8 AS file_id,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com/doc/'
           || CAST(doc_id AS VARCHAR) AS url,
         '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
           || CAST(doc_id % 100 AS VARCHAR) AS ip,
         '20200101' || lpad(CAST(doc_id % 240000 AS VARCHAR), 6, '0') AS arc_date,
         'HTTP/1.1 200 OK' || chr(10) || chr(10) || text AS payload
  FROM documents WHERE doc_id < 200
),
recs AS (
  SELECT doc_id, file_id, url, ip, arc_date,
         CAST(strlen(payload) AS BIGINT) AS length,
         md5(payload) AS payload_md5,
         url || ' ' || ip || ' ' || arc_date || ' text/html '
           || CAST(strlen(payload) AS VARCHAR) || chr(10) || payload || chr(10)
           AS rec
  FROM base
),
fd AS (
  SELECT file_id,
         strlen('filedesc://arc/part-' || CAST(file_id AS VARCHAR)
                || '.arc 0.0.0.0 20000101000000 text/plain 20' || chr(10)
                || '1 1 InternetArchive' || chr(10) || chr(10)) AS fd_len
  FROM (SELECT DISTINCT file_id FROM recs)
)
SELECT 'arc/part-' || CAST(r.file_id AS VARCHAR) || '.arc' AS path,
       CAST(f.fd_len + COALESCE(SUM(strlen(rec)) OVER (
         PARTITION BY r.file_id ORDER BY r.doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS offset,
       r.url, r.ip, r.arc_date, 'text/html' AS mimetype, r.length, r.payload_md5
FROM recs r JOIN fd f ON f.file_id = r.file_id
""".strip()


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Gopher QUALITY rule set (Rae et al. 2021 App. A) completing
    # gopher_repetition: all thresholds integer cross-multiplied;
    # violations planted per rule so every flag fires both ways
    from sandcrawler_spark.functions.repetition import gopher_quality_cols

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base = F.col("text")
    text = (
        F.when(did % 11 == 0, F.substring(base, 1, 40))  # too few words
        .when(did % 7 == 0, F.concat(
            base, F.lit("\n"),
            F.lit("- one\n- two\n- three\n- four\n- five\n- six\n"
                  "- seven\n- eight\n- nine\n- ten"),
        ))
        .when(did % 5 == 0, F.concat(
            base, F.lit(" ### ## #tag1 #tag2 #tag3 #tag4 #tag5 #tag6 "
                        "more... and... dots... again... trailing...")))
        .when(did % 13 == 0, F.concat(
            base, F.lit(" 111 222 333 444 555 666 777 888 999 000 "
                        "111 222 333 444 555 666 777 888 999 000 "
                        "111 222 333 444 555 666 777 888 999 000")))
        .otherwise(base)
    )
    return d.select("doc_id", *gopher_quality_cols(text))


def _gopher_quality_oracle() -> str:
    from sandcrawler_spark.functions.repetition import GOPHER_STOPWORDS

    stops = ", ".join("'" + s + "'" for s in GOPHER_STOPWORDS)
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 11 = 0 THEN substring(text, 1, 40)
           WHEN doc_id % 7 = 0 THEN text || chr(10)
             || '- one' || chr(10) || '- two' || chr(10) || '- three' || chr(10)
             || '- four' || chr(10) || '- five' || chr(10) || '- six' || chr(10)
             || '- seven' || chr(10) || '- eight' || chr(10) || '- nine'
             || chr(10) || '- ten'
           WHEN doc_id % 5 = 0 THEN text
             || ' ### ## #tag1 #tag2 #tag3 #tag4 #tag5 #tag6 more... and... dots... again... trailing...'
           WHEN doc_id % 13 = 0 THEN text
             || ' 111 222 333 444 555 666 777 888 999 000'
             || ' 111 222 333 444 555 666 777 888 999 000'
             || ' 111 222 333 444 555 666 777 888 999 000'
           ELSE text
         END AS text
  FROM documents
),
feat AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
         string_split(text, chr(10)) AS lines
  FROM planted
),
agg AS (
  SELECT doc_id,
         len(toks) AS n_words,
         COALESCE(list_sum(list_transform(toks, w -> strlen(w))), 0) AS total_chars,
         len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
         len(list_intersect(list_distinct(toks), [{stops}])) AS n_stop_kinds,
         strlen(text) - strlen(replace(text, '#', '')) AS n_hash,
         len(regexp_extract_all(text, '\\.\\.\\.')) AS n_ellipsis,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> regexp_matches(trim(l), '^([-*\u2022])'))) AS n_bullet,
         len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS n_ell_lines
  FROM feat
)
SELECT doc_id,
       (n_words BETWEEN 50 AND 100000) AS wc_ok,
       (total_chars >= n_words * 3 AND total_chars <= n_words * 10) AS mwl_ok,
       ((n_hash + n_ellipsis) * 10 <= n_words) AS sym_ok,
       (n_bullet * 10 <= n_lines * 9) AS bullet_ok,
       (n_ell_lines * 10 <= n_lines * 3) AS ellipsis_ok,
       (n_alpha * 5 >= n_words * 4) AS alpha_ok,
       (n_stop_kinds >= 2) AS stop_ok,
       ((n_words BETWEEN 50 AND 100000)
        AND (total_chars >= n_words * 3 AND total_chars <= n_words * 10)
        AND ((n_hash + n_ellipsis) * 10 <= n_words)
        AND (n_bullet * 10 <= n_lines * 9)
        AND (n_ell_lines * 10 <= n_lines * 3)
        AND (n_alpha * 5 >= n_words * 4)
        AND (n_stop_kinds >= 2)) AS gopher_pass
FROM agg
""".strip()


def q_seen_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the north star's "bloom/cuckoo" pair as a sizing decision table:
    # for each cuckoo fingerprint width f, the (2,4)-cuckoo FPR bound
    # 8/2^f and bits/key f/0.955, vs the bloom bits/key that buys the
    # SAME fpr (1.442695*(f-3), since log2(8/2^f) = 3-f) — all exact
    # integer arithmetic (rational rounding, no libm), one measured
    # distinct-count + memory at the 10^10-key design point
    urls = _urls(spark, sf_dir)
    n = urls.agg(F.count_distinct("url").cast("long").alias("n_urls"))
    f = F.explode(F.array(*[F.lit(x) for x in (8, 10, 12, 16, 20, 24)])).alias("f_bits")
    t = n.select("n_urls", f)
    fb = F.col("f_bits")
    fpr_ppm = F.expr(
        "CAST((8000000 + CAST(pow(2, f_bits - 1) AS BIGINT)) div "
        "CAST(pow(2, f_bits) AS BIGINT) AS BIGINT)"
    )
    cuckoo_bpk_milli = F.expr("(f_bits * 1000000 + 477) div 955")
    bloom_bpk_milli = F.expr("((f_bits - 3) * 1442695 + 500) div 1000")
    t = t.select(
        "n_urls", "f_bits",
        fpr_ppm.alias("fpr_ppm"),
        cuckoo_bpk_milli.alias("cuckoo_bpk_milli"),
        bloom_bpk_milli.alias("bloom_bpk_milli"),
    )
    mb = lambda c: F.expr(f"({c} * 10000000000) div 8388608000")
    return t.select(
        "n_urls", "f_bits", "fpr_ppm", "cuckoo_bpk_milli", "bloom_bpk_milli",
        mb("cuckoo_bpk_milli").alias("cuckoo_mb_at_1e10"),
        mb("bloom_bpk_milli").alias("bloom_mb_at_1e10"),
        (F.col("cuckoo_bpk_milli") < F.col("bloom_bpk_milli")).alias("cuckoo_smaller"),
    )


_SEEN_COMPARE_ORACLE = f"""
WITH {_URLS_CTE.strip()},
n AS (SELECT CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls FROM urls),
t AS (
  SELECT n_urls, UNNEST([8, 10, 12, 16, 20, 24]) AS f_bits FROM n
),
calc AS (
  SELECT n_urls, f_bits,
         CAST((8000000 + CAST(pow(2, f_bits - 1) AS BIGINT))
              // CAST(pow(2, f_bits) AS BIGINT) AS BIGINT) AS fpr_ppm,
         (f_bits * 1000000 + 477) // 955 AS cuckoo_bpk_milli,
         ((f_bits - 3) * 1442695 + 500) // 1000 AS bloom_bpk_milli
  FROM t
)
SELECT n_urls, CAST(f_bits AS INT) AS f_bits, fpr_ppm,
       CAST(cuckoo_bpk_milli AS BIGINT) AS cuckoo_bpk_milli,
       CAST(bloom_bpk_milli AS BIGINT) AS bloom_bpk_milli,
       CAST((cuckoo_bpk_milli * 10000000000) // 8388608000 AS BIGINT) AS cuckoo_mb_at_1e10,
       CAST((bloom_bpk_milli * 10000000000) // 8388608000 AS BIGINT) AS bloom_mb_at_1e10,
       (cuckoo_bpk_milli < bloom_bpk_milli) AS cuckoo_smaller
FROM calc
"""


def q_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reliability table for the NB quality classifier: fixed-width
    # log-odds bins (0.5 nats, clamped [-5,5]) x observed
    # positive rate in integer ppm — the calibration receipt that
    # decides whether raw log-odds can gate the corpus or need
    # recalibration first
    from sandcrawler_spark.operators.quality_clf import (
        nb_score_docs,
        train_nb_classifier,
    )

    d = _t(spark, sf_dir, "documents")
    w = train_nb_classifier(
        d.withColumn("_label", (F.col("lang") == "en").cast("int")), "_label"
    )
    scored = nb_score_docs(d, w).join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")),
        on="doc_id",
    )
    bin_id = F.greatest(
        F.lit(-5).cast("long"),
        F.least(F.lit(5).cast("long"),
                F.expr("logodds_micronat div 500000")),
    )
    agg = scored.groupBy(bin_id.alias("bin_id")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    return agg.select(
        "bin_id", "n_docs", "n_pos",
        F.expr("(1000000 * n_pos) div n_docs").alias("pos_ppm"),
    )


def _nb_calibration_oracle() -> str:
    from sandcrawler_spark.operators.quality_clf import nb_oracle_sql

    inner = nb_oracle_sql(
        "SELECT doc_id, text, lang FROM documents", "lang = 'en'"
    )
    return f"""
WITH _cal_scores AS ({inner}),
_cal_joined AS (
  SELECT s.doc_id, s.logodds_micronat,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM _cal_scores s JOIN documents d ON d.doc_id = s.doc_id
),
_cal_binned AS (
  SELECT greatest(CAST(-5 AS BIGINT),
                  least(CAST(5 AS BIGINT), logodds_micronat // 500000)) AS bin_id,
         y
  FROM _cal_joined
)
SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       (1000000 * CAST(SUM(y) AS BIGINT)) // COUNT(*) AS pos_ppm
FROM _cal_binned GROUP BY bin_id
""".strip()


def q_anchor_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # retrieval over the ANCHOR index: each target URL described by
    # the sorted bag of its inbound anchor texts, ranked by BM25 —
    # anchor text beats body text for navigational queries (the
    # classic web-IR result), and this composes the anchor-text
    # aggregation with the ranked-retrieval stack end-to-end
    from sandcrawler_spark.operators.linkgraph import extract_anchor_texts
    from sandcrawler_spark.operators.search import bm25_topk, top_terms

    edges = extract_anchor_texts(_link_pages(spark, sf_dir))
    docs = edges.groupBy(F.col("dst_url").alias("doc_id")).agg(
        F.concat_ws(" ", F.array_sort(F.collect_list("anchor_text"))).alias("text")
    )
    return bm25_topk(docs, top_terms(docs, n=2), k=10)


def _anchor_search_oracle() -> str:
    from sandcrawler_spark.operators.search import bm25_oracle_sql

    docs_sql = f"""
WITH {_URLS_CTE.strip()},
{_ANCHOR_EDGES_CTE.strip()}
SELECT dst_url AS doc_id,
       array_to_string(list_sort(list(anchor_text)), ' ') AS text
FROM anchor_edges GROUP BY dst_url
""".strip()
    terms_sql = f"""
SELECT term FROM (
  SELECT term, COUNT(*) AS c FROM (
    SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
    FROM ({docs_sql})
  ) GROUP BY term ORDER BY c DESC, term ASC LIMIT 2
)
""".strip()
    return bm25_oracle_sql(docs_sql, terms_sql, k=10)


def q_warc_revisit_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WRITE-side revisit dedup — the reason wayback has revisit records
    # at all: at archive time, captures whose payload digest was
    # already stored become `revisit` records pointing at the original
    # (response bytes written once per digest). min(struct) firsts per
    # digest + join-back (no per-digest window), integer byte ledger;
    # the read-side resolver (revisit_resolution) undoes exactly this
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
    did = F.col("doc_id")
    # ~3 captures share each payload: digest collides on doc_id % 150
    payload = F.concat(F.lit("HTTP/1.1 200 OK\n\n"), F.substring(F.col("text"), 1, 100))
    caps = d.select(
        did.alias("doc_id"),
        F.concat(F.lit("https://site"), (did % 9).cast("string"),
                 F.lit(".example.com/p/"), (did % 150).cast("string")).alias("url"),
        F.concat(F.lit("2020010100"), F.lpad((did % 10000).cast("string"), 4, "0")).alias("ts"),
        F.md5(F.concat(F.lit("p:"), (did % 150).cast("string"))).alias("digest"),
        F.octet_length(payload).cast("long").alias("payload_bytes"),
    )
    firsts = caps.groupBy("digest").agg(
        F.min(F.struct("doc_id", "url", "ts")).alias("_f")
    ).select(
        "digest", F.col("_f.doc_id").alias("first_doc"),
        F.col("_f.url").alias("ref_url"), F.col("_f.ts").alias("ref_ts"),
    )
    out = caps.join(firsts, on="digest")
    is_first = F.col("doc_id") == F.col("first_doc")
    header_bytes = F.lit(120).cast("long")  # fixed synthetic header cost
    return out.select(
        "doc_id", "url", "digest",
        F.when(is_first, F.lit("response")).otherwise(F.lit("revisit")).alias("kind"),
        F.when(is_first, F.lit(None).cast("string")).otherwise(F.col("ref_url")).alias("ref_url"),
        F.when(is_first, F.lit(None).cast("string")).otherwise(F.col("ref_ts")).alias("ref_ts"),
        F.when(is_first, F.col("payload_bytes") + header_bytes)
        .otherwise(header_bytes).alias("bytes_written"),
        F.when(is_first, F.lit(0).cast("long"))
        .otherwise(F.col("payload_bytes")).alias("bytes_saved"),
    )


_WARC_REVISIT_WRITE_ORACLE = """
-- strlen() = UTF-8 bytes in DuckDB (see _ARC_ROUNDTRIP_ORACLE note)
WITH caps AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 9 AS VARCHAR) || '.example.com/p/'
           || CAST(doc_id % 150 AS VARCHAR) AS url,
         '2020010100' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ts,
         md5('p:' || CAST(doc_id % 150 AS VARCHAR)) AS digest,
         CAST(strlen('HTTP/1.1 200 OK' || chr(10) || chr(10)
                     || substring(text, 1, 100)) AS BIGINT) AS payload_bytes
  FROM documents WHERE doc_id < 450
),
firsts AS (
  SELECT digest,
         MIN(ROW(doc_id, url, ts)) AS f
  FROM caps GROUP BY digest
),
fx AS (
  SELECT digest, f[1] AS first_doc, f[2] AS ref_url, f[3] AS ref_ts
  FROM firsts
)
SELECT c.doc_id, c.url, c.digest,
       CASE WHEN c.doc_id = x.first_doc THEN 'response' ELSE 'revisit' END AS kind,
       CASE WHEN c.doc_id = x.first_doc THEN NULL ELSE x.ref_url END AS ref_url,
       CASE WHEN c.doc_id = x.first_doc THEN NULL ELSE x.ref_ts END AS ref_ts,
       CASE WHEN c.doc_id = x.first_doc THEN c.payload_bytes + 120
            ELSE CAST(120 AS BIGINT) END AS bytes_written,
       CASE WHEN c.doc_id = x.first_doc THEN CAST(0 AS BIGINT)
            ELSE c.payload_bytes END AS bytes_saved
FROM caps c JOIN fx x ON c.digest = x.digest
""".strip()


def q_https_upgrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HTTPS-upgrade audit: which http:// frontier observations have a
    # live https:// twin (same host+path captured 200, no redirect)
    # and can be upgraded in place — crawl hygiene that collapses
    # scheme-duplicate frontier entries and stops mixed-scheme dedupe
    # misses. Keys come from the seed-42 corpus CDX (real scheme mix,
    # Zipf-skewed hosts — journal0 carries ~1/3 of captures), fanned
    # to documents-table volume by rid; one (host, path) equi-join,
    # integer ppm rollup per host.
    d = _t(spark, sf_dir, "documents")
    caps = d.select((F.col("doc_id") % 256).alias("rid")).join(
        F.broadcast(_corpus_cdx_ranked(spark)), on="rid"
    )
    http_side = caps.filter(F.col("scheme") == "http").select("host", "path")
    https_side = (
        caps.filter(
            (F.col("scheme") == "https") & (F.col("status_code") == 200)
            & (F.coalesce(F.col("redirect_url"), F.lit("")) == "")
        )
        .select("host", "path")
        .distinct()
    )
    joined = http_side.join(
        https_side.withColumn("_has_https", F.lit(1)), on=["host", "path"], how="left"
    )
    agg = joined.groupBy("host").agg(
        F.count("*").cast("long").alias("n_http"),
        F.sum(F.coalesce(F.col("_has_https"), F.lit(0))).cast("long").alias("n_upgradable"),
    )
    return agg.select(
        "host", "n_http", "n_upgradable",
        F.expr("(1000000 * n_upgradable) div n_http").alias("upgrade_ppm"),
        (F.col("n_upgradable") == F.col("n_http")).alias("fully_upgradable"),
    )


def _https_upgrade_oracle() -> str:
    return f"""
WITH {_corpus_cdx_ranked_cte()},
caps AS (
  SELECT c.* FROM documents d JOIN cdxr c ON d.doc_id % 256 = c.rid
),
http_side AS (SELECT host, path FROM caps WHERE scheme = 'http'),
https_side AS (
  SELECT DISTINCT host, path FROM caps
  WHERE scheme = 'https' AND status_code = 200
    AND COALESCE(redirect_url, '') = ''
),
joined AS (
  SELECT h.host, h.path,
         CASE WHEN s.host IS NOT NULL THEN 1 ELSE 0 END AS has_https
  FROM http_side h
  LEFT JOIN https_side s ON s.host = h.host AND s.path = h.path
),
agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_http,
         CAST(SUM(has_https) AS BIGINT) AS n_upgradable
  FROM joined GROUP BY host
)
SELECT host, n_http, n_upgradable,
       (1000000 * n_upgradable) // n_http AS upgrade_ppm,
       (n_upgradable = n_http) AS fully_upgradable
FROM agg
""".strip()


def q_tracker_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # third-party prevalence over the bipartite (first-party host x
    # sub-resource host) graph: a resource host embedded by many
    # DISTINCT first parties is a tracker/CDN — the corpus-wide
    # generalization of per-page adblock filtering (sub_resources /
    # functions/biblio.py), and the signal the static rule list in
    # adblock_data.py is bootstrapped from
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    page_host = F.concat(F.lit("h"), (did % 20).cast("string"), F.lit(".example.org"))

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    html = F.concat(
        F.lit('<img src="https://'), page_host, F.lit('/self.png">'),
        F.lit('<script src="https://cdn.assets.example.net/lib.js"></script>'),
        opt(did % 2 == 0,
            F.lit('<img src="https://tracker.ads.example.net/px.gif">')),
        opt(did % 3 == 0,
            F.lit('<script src="https://pixel.spy.example.net/t.js"></script>')),
        opt(did % 20 == 7,
            F.lit('<img src="https://widget.niche.example.net/w.png">')),
    )
    res = d.select(
        page_host.alias("page_host"),
        F.explode(
            F.regexp_extract_all(
                html, F.lit(r'src="https://([^/"]+)/'), F.lit(1)
            )
        ).alias("res_host"),
    ).filter(F.col("res_host") != F.col("page_host"))
    agg = res.groupBy("res_host").agg(
        F.count_distinct("page_host").cast("int").alias("n_first_parties"),
        F.count("*").cast("long").alias("n_embeds"),
    )
    return agg.select(
        "res_host", "n_first_parties", "n_embeds",
        (F.col("n_first_parties") >= 5).alias("is_tracker"),
    )


_TRACKER_HOSTS_ORACLE = """
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS page_host,
         '<img src="https://h' || CAST(doc_id % 20 AS VARCHAR)
         || '.example.org/self.png">'
         || '<script src="https://cdn.assets.example.net/lib.js"></script>'
         || CASE WHEN doc_id % 2 = 0
              THEN '<img src="https://tracker.ads.example.net/px.gif">'
              ELSE '' END
         || CASE WHEN doc_id % 3 = 0
              THEN '<script src="https://pixel.spy.example.net/t.js"></script>'
              ELSE '' END
         || CASE WHEN doc_id % 20 = 7
              THEN '<img src="https://widget.niche.example.net/w.png">'
              ELSE '' END AS html
  FROM documents
),
res AS (
  SELECT page_host,
         UNNEST(regexp_extract_all(html, 'src="https://([^/"]+)/', 1)) AS res_host
  FROM pages
),
third AS (SELECT * FROM res WHERE res_host <> page_host),
agg AS (
  SELECT res_host,
         CAST(COUNT(DISTINCT page_host) AS INT) AS n_first_parties,
         CAST(COUNT(*) AS BIGINT) AS n_embeds
  FROM third GROUP BY res_host
)
SELECT res_host, n_first_parties, n_embeds, (n_first_parties >= 5) AS is_tracker
FROM agg
""".strip()


def q_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc longest repeated substring (suffix-sort + adjacent-LCP,
    # capped): the within-document memorization audit — templated spam
    # and generator loops surface as long internal repeats
    from sandcrawler_spark.functions.textstats import longest_repeat

    return longest_repeat(_t(spark, sf_dir, "documents"))


_LONGEST_REPEAT_ORACLE = """
WITH pre AS (
  SELECT doc_id, substring(text, 1, 200) AS pre FROM documents
),
sfx AS (
  SELECT doc_id, substring(pre, CAST(pos AS INT), 24) AS suffix
  FROM (SELECT doc_id, pre, UNNEST(range(1, strlen(pre) + 1)) AS pos FROM pre)
),
paired AS (
  SELECT doc_id, suffix,
         lag(suffix) OVER (PARTITION BY doc_id ORDER BY suffix) AS prev
  FROM sfx
),
scored AS (
  SELECT doc_id, suffix,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT), range(1, 25)),
           (acc, k) -> CASE WHEN acc = k - 1
                             AND k <= strlen(suffix) AND k <= strlen(prev)
                             AND substring(suffix, CAST(k AS INT), 1)
                                 = substring(prev, CAST(k AS INT), 1)
                        THEN k ELSE acc END
         ) AS INT) AS lcp
  FROM paired WHERE prev IS NOT NULL
),
ranked AS (
  SELECT doc_id, suffix, lcp,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY lcp DESC, suffix ASC) AS rk
  FROM scored
)
SELECT doc_id, lcp AS repeat_len, substring(suffix, 1, lcp) AS repeat_sub
FROM ranked WHERE rk = 1
""".strip()


def q_parked_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parked/for-sale lander detection at host granularity — the
    # soft-404 problem for whole domains (expired sites re-registered
    # as ad landers keep inbound links + 200s); phrase AND link-count
    # conjunction so stories ABOUT parking don't condemn their host
    from sandcrawler_spark.functions.soft404 import parked_hosts, parked_score_cols

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host_id = did % 20
    host = F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.org"))
    parked_body = F.lit(
        '<html><body><h1>This domain is for sale</h1>'
        '<a href="https://registrar.example.net/buy">buy</a>'
        " related searches</body></html>"
    )
    normal_body = F.concat(
        F.lit("<html><body><p>"), F.substring(F.col("text"), 1, 80),
        F.lit('</p><a href="/a">1</a><a href="/b">2</a><a href="/c">3</a>'
              "</body></html>"),
    )
    news_body = F.concat(
        F.lit("<html><body><p>coverage: this domain is for sale says "
              "registrar</p>"),
        F.lit('<a href="/a">1</a><a href="/b">2</a><a href="/c">3</a>'
              "</body></html>"),
    )
    body = (
        F.when(host_id.isin(0, 9) & (did % 4 != 0), parked_body)
        .when((host_id == 5) & (did % 3 == 0), news_body)
        .otherwise(normal_body)
    )
    pages = d.select(host.alias("host"), *parked_score_cols(body))
    return parked_hosts(pages)


def _parked_domains_oracle() -> str:
    from sandcrawler_spark.functions.soft404 import PARKED_RX

    return f"""
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' AS host,
         CASE WHEN doc_id % 20 IN (0, 9) AND doc_id % 4 <> 0
              THEN '<html><body><h1>This domain is for sale</h1>'
                   || '<a href="https://registrar.example.net/buy">buy</a>'
                   || ' related searches</body></html>'
              WHEN doc_id % 20 = 5 AND doc_id % 3 = 0
              THEN '<html><body><p>coverage: this domain is for sale says registrar</p>'
                   || '<a href="/a">1</a><a href="/b">2</a><a href="/c">3</a></body></html>'
              ELSE '<html><body><p>' || substring(text, 1, 80)
                   || '</p><a href="/a">1</a><a href="/b">2</a><a href="/c">3</a></body></html>'
         END AS body
  FROM documents
),
flags AS (
  SELECT host,
         CASE WHEN regexp_matches(lower(body), '{PARKED_RX}')
                   AND len(regexp_extract_all(lower(body), '<a\\s[^>]*href')) <= 2
              THEN 1 ELSE 0 END AS is_parked
  FROM pages
),
agg AS (
  SELECT host, CAST(COUNT(*) AS INT) AS n_pages,
         CAST(SUM(is_parked) AS INT) AS n_parked
  FROM flags GROUP BY host
)
SELECT host, n_pages, n_parked, (n_parked * 2 >= n_pages) AS host_parked
FROM agg
""".strip()


_FRESHNESS_BUDGET = 150_000  # fetches per 210-day period


def q_recrawl_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # freshness-optimal revisit allocation (Cho & Garcia-Molina,
    # discretized): concave F = f/(f+lambda) makes global
    # gain-per-fetch greedy exactly optimal — one range-shuffle cumsum,
    # no loop; per-URL change rates seeded from md5(url)
    from sandcrawler_spark.operators.recrawl import freshness_allocation

    rates = _urls(spark, sf_dir).select(
        "url",
        (F.conv(F.substring(F.md5("url"), 1, 6), 16, 10).cast("long")
         % 900000 + 1000).alias("lam_micro"),
    )
    return freshness_allocation(rates, _FRESHNESS_BUDGET)


def _recrawl_allocation_oracle() -> str:
    from sandcrawler_spark.operators.recrawl import freshness_oracle_sql

    rates = f"""
WITH {_URLS_CTE.strip()}
SELECT url,
       CAST(CAST('0x' || substr(md5(url), 1, 6) AS UBIGINT) % 900000 + 1000
            AS BIGINT) AS lam_micro
FROM urls
""".strip()
    return freshness_oracle_sql(rates, _FRESHNESS_BUDGET)


def q_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # code-switch detection: paragraph-level language ID + transition
    # count — the signal that routes mixed-language pages to
    # paragraph-level filtering instead of doc-level keep/drop
    from sandcrawler_spark.functions.textstats import paragraph_langs

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    fr = F.lit("le la les de des et un une dans sur pour que qui ne pas")
    en = F.substring(F.col("text"), 1, 120)

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    ptext = F.concat(
        en,
        opt(did % 2 == 0, F.concat(F.lit("\n\n"), fr)),
        F.lit("\n\n"), F.substring(F.col("text"), 121, 120),
        opt(did % 3 == 0, F.concat(F.lit("\n\n"), fr)),
    )
    return paragraph_langs(d.select("doc_id", ptext.alias("text")))


_LANG_SEGMENTS_ORACLE = """
WITH planted AS (
  SELECT doc_id,
         substring(text, 1, 120)
         || CASE WHEN doc_id % 2 = 0
              THEN chr(10) || chr(10)
                   || 'le la les de des et un une dans sur pour que qui ne pas'
              ELSE '' END
         || chr(10) || chr(10) || substring(text, 121, 120)
         || CASE WHEN doc_id % 3 = 0
              THEN chr(10) || chr(10)
                   || 'le la les de des et un une dans sur pour que qui ne pas'
              ELSE '' END AS text
  FROM documents
),
paras AS (
  SELECT doc_id, UNNEST(list_zip(arr, range(1, len(arr) + 1))) AS z
  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS arr FROM planted)
),
scored AS (
  SELECT doc_id, CAST(z[2] AS INT) AS pidx,
         CASE WHEN len(toks) > 0
                   AND 100 * len(list_filter(toks, x -> list_contains(
                     ['the','of','and','a','to','in','is','it','that','for',
                      'on','with','as','was','at','by','an','be','this','are'], x)))
                       >= 8 * len(toks)
              THEN 'en' ELSE 'other' END AS pred
  FROM (
    SELECT doc_id, z,
           list_filter(string_split_regex(lower(z[1]), '\\s+'), x -> x <> '') AS toks
    FROM paras
  )
),
flagged AS (
  SELECT doc_id, pred,
         CASE WHEN lag(pred) OVER (PARTITION BY doc_id ORDER BY pidx) IS NOT NULL
                   AND lag(pred) OVER (PARTITION BY doc_id ORDER BY pidx) <> pred
              THEN 1 ELSE 0 END AS switch
  FROM scored
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_paras,
       CAST(SUM(CASE WHEN pred = 'en' THEN 1 ELSE 0 END) AS INT) AS n_en,
       CAST(SUM(CASE WHEN pred = 'other' THEN 1 ELSE 0 END) AS INT) AS n_other,
       CAST(SUM(switch) AS INT) AS n_switches,
       CASE WHEN SUM(CASE WHEN pred = 'en' THEN 1 ELSE 0 END)
                 >= SUM(CASE WHEN pred = 'other' THEN 1 ELSE 0 END)
            THEN 'en' ELSE 'other' END AS dominant_lang
FROM flagged
GROUP BY doc_id
""".strip()


def q_jsonld_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # schema.org JSON-LD bibliographic extraction — the metadata
    # channel meta-tag mining (html_biblio/meta_tags) misses; engine-
    # native JSON paths both sides, malformed blocks -> NULL fields
    from sandcrawler_spark.functions.jsonld import extract_jsonld

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = did.cast("string")

    def opt(cond, seg):
        return F.when(cond, seg).otherwise(F.lit(""))

    scholarly = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type":"ScholarlyArticle","headline":"Study '),
        s,
        F.lit('","author":[{"name":"Author A"},{"name":"Author B"}],'
              '"isPartOf":{"issn":"1234-5678"},"datePublished":"2020-0'),
        (did % 9 + 1).cast("string"),
        F.lit('-01"}</script>'),
    )
    news = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type":"NewsArticle","headline":"News '),
        s,
        F.lit('","author":{"name":"Desk"}}</script>'),
    )
    broken = F.lit(
        '<script type="application/ld+json">{"@type":"Scholarly'
        "</script>"
    )
    html = F.concat(
        F.lit("<html><head>"),
        opt(did % 2 == 0, scholarly),
        opt(did % 3 == 0, news),
        opt(did % 5 == 0, broken),
        F.lit("</head><body>x</body></html>"),
    )
    return extract_jsonld(d.select("doc_id", html.alias("html")))


def _jsonld_meta_oracle() -> str:
    from sandcrawler_spark.functions.jsonld import jsonld_oracle_sql

    planted = """
SELECT doc_id,
  '<html><head>'
  || CASE WHEN doc_id % 2 = 0
       THEN '<script type="application/ld+json">'
            || '{"@type":"ScholarlyArticle","headline":"Study '
            || CAST(doc_id AS VARCHAR)
            || '","author":[{"name":"Author A"},{"name":"Author B"}],'
            || '"isPartOf":{"issn":"1234-5678"},"datePublished":"2020-0'
            || CAST(doc_id % 9 + 1 AS VARCHAR) || '-01"}</script>'
       ELSE '' END
  || CASE WHEN doc_id % 3 = 0
       THEN '<script type="application/ld+json">'
            || '{"@type":"NewsArticle","headline":"News '
            || CAST(doc_id AS VARCHAR)
            || '","author":{"name":"Desk"}}</script>'
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN '<script type="application/ld+json">{"@type":"Scholarly</script>'
       ELSE '' END
  || '</head><body>x</body></html>' AS html
FROM documents
""".strip()
    return jsonld_oracle_sql(planted)


def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SentencePiece-style unigram-LM segmentation: corpus-derived
    # piece costs + per-word Viterbi (Arrow pandas UDF); the oracle
    # replays the SAME DP as a recursive CTE — imperative loop proven
    # equal to the declared recurrence
    from sandcrawler_spark.operators.unigram import (
        corpus_words,
        unigram_vocab,
        viterbi_segment,
    )

    words = corpus_words(_t(spark, sf_dir, "documents"))
    return viterbi_segment(words, unigram_vocab(words))


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc TextRank keywords: intra-document co-occurrence
    # centrality (vs tfidf_keywords' corpus contrast) — integer
    # fixed-point 2-iteration PageRank, bit-identical across engines
    from sandcrawler_spark.operators.textrank import textrank_keywords

    return textrank_keywords(_t(spark, sf_dir, "documents"), top_k=3)


def q_maxscore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MaxScore-pruned BM25 top-k over a common+rare term mix — the
    # oracle is the EXACT BM25 twin (bm25_oracle_sql), so a green row
    # is a machine-checked losslessness proof for the pruning
    from sandcrawler_spark.functions.textstats import EN_STOPWORDS, tokens_col
    from sandcrawler_spark.operators.search import maxscore_topk

    d = _t(spark, sf_dir, "documents")
    cnts = (
        d.select(F.explode(tokens_col(F.lower(F.col("text")))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("_cnt"))
    )
    common = (
        cnts.filter(~F.col("term").isin(*EN_STOPWORDS))
        .orderBy(F.col("_cnt").desc(), F.col("term").asc()).limit(2)
    )
    rare = (
        cnts.filter(F.col("_cnt") >= 3)
        .orderBy(F.col("_cnt").asc(), F.col("term").asc()).limit(2)
    )
    terms = common.select("term").union(rare.select("term"))
    return maxscore_topk(d, terms, k=15)


def q_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    # real byte-level image-header parsing (PNG IHDR / GIF screen
    # descriptor / JPEG SOF0 scan) over synthesized binary blobs —
    # encode and decode both run inside the engine, the oracle knows
    # only the closed-form dims, so a decode-offset bug cannot pass.
    # Header-only sniffing is the cheap pre-decode filter a 100 TB
    # multimodal pass applies before ever paying a pixel codec.
    from sandcrawler_spark.functions.imagebin import (
        encode_image_header,
        image_header_stats,
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    fmt = (
        F.when(did % 3 == 0, F.lit("png"))
        .when(did % 3 == 1, F.lit("gif"))
        .otherwise(F.lit("jpeg"))
    )
    width = (F.lit(1) + did % 512).cast("int")  # includes 1x1 tracking pixels
    height = (F.lit(1) + did % 256).cast("int")
    blobs = d.select(
        "doc_id", encode_image_header(fmt, width, height).alias("content")
    )
    return image_header_stats(blobs)


def q_identifier_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scholarly-identifier extraction with real check-digit validation
    # (ISSN mod-11, ISBN-13 EAN mod-10, ORCID ISO 7064 11-2, arXiv
    # month check) — the corpus-side linkage pass the reference routes
    # its DOIs/ISSNs through grobid.py:71 / html_metadata.py meta tables
    from sandcrawler_spark.functions.identifiers import (
        extract_identifiers,
        identifier_stats,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _identifier_plant_col().alias("text")
    )
    return identifier_stats(extract_identifiers(d))


def _identifier_extract_oracle() -> str:
    from sandcrawler_spark.functions.identifiers import (
        identifiers_oracle_sql,
        isbn13_check_sql,
        issn_check_sql,
        orcid_check_sql,
    )

    def rot11(c):
        return (
            f"CASE WHEN {c} = 'X' THEN '0' WHEN {c} = '9' THEN 'X' "
            f"ELSE CAST(CAST({c} AS INT) + 1 AS VARCHAR) END"
        )

    def rot10(c):
        return (
            f"CASE WHEN {c} = '9' THEN '0' "
            f"ELSE CAST(CAST({c} AS INT) + 1 AS VARCHAR) END"
        )

    planted = f"""
SELECT doc_id,
  text
  || ' doi:10.' || CAST(1000 + doc_id % 9000 AS VARCHAR) || '/sc.' || CAST(doc_id AS VARCHAR)
  || CASE WHEN doc_id % 2 = 0
       THEN ' arXiv:24' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
            || '.' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
       ELSE '' END
  || CASE WHEN doc_id % 13 = 0
       THEN ' arXiv:2413.' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
       ELSE '' END
  || CASE WHEN doc_id % 3 = 0
       THEN ' ISSN ' || issn_body || {issn_check_sql("issn_body")}
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN ' ISSN ' || issn_body || {rot11(issn_check_sql("issn_body"))}
       ELSE '' END
  || CASE WHEN doc_id % 4 = 0
       THEN ' ISBN ' || isbn12 || {isbn13_check_sql("isbn12")}
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' ISBN ' || isbn12 || {rot10(isbn13_check_sql("isbn12"))}
       ELSE '' END
  || CASE WHEN doc_id % 6 = 0
       THEN ' https://orcid.org/' || orc_body || {orcid_check_sql("orc_body")}
       ELSE '' END
  || CASE WHEN doc_id % 11 = 0
       THEN ' https://orcid.org/' || orc_body || {rot11(orcid_check_sql("orc_body"))}
       ELSE '' END
  AS text
FROM (
  SELECT doc_id, text,
         substring(base7, 1, 4) || '-' || substring(base7, 5, 3) AS issn_body,
         '978' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0') AS isbn12,
         substring(orc15, 1, 4) || '-' || substring(orc15, 5, 4) || '-'
           || substring(orc15, 9, 4) || '-' || substring(orc15, 13, 3) AS orc_body
  FROM (
    SELECT doc_id, text,
           lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0') AS base7,
           '000' || lpad(CAST(doc_id % 1000000000000 AS VARCHAR), 12, '0') AS orc15
    FROM documents
  )
)
""".strip()
    return identifiers_oracle_sql(planted)


_IMAGE_DIMS_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'gif'
              ELSE 'jpeg' END AS fmt,
         CAST(1 + doc_id % 512 AS INT) AS width,
         CAST(1 + doc_id % 256 AS INT) AS height
  FROM documents
)
SELECT doc_id, fmt, width, height,
       CAST(CASE fmt WHEN 'png' THEN 33 WHEN 'gif' THEN 13 ELSE 39 END AS INT)
         AS n_bytes,
       CAST(floor(width * 100.0 / height) AS INT) AS aspect_pct,
       (width <= 2 AND height <= 2) AS is_pixel
FROM dims
""".strip()


def q_oai_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # OAI-PMH selective harvest (v2.0 §3.3.1 inclusive from/until
    # window + §2.5.1 deleted tombstones): per-repository ListRecords
    # XML built from the frontier, parsed back through the codegen'd
    # record parser, then windowed to [1994-01-01, 1995-12-31] and
    # set 'set1'. Oracle derives the survivors relationally from
    # orders (independent path — it never touches XML).
    from sandcrawler_spark.functions.oaipmh import (
        build_oai_record_xml,
        harvest_window,
        parse_oai_records,
    )

    u = _urls(spark, sf_dir).filter(F.col("site_id") < 5)
    okey = F.col("o_orderkey").cast("string")
    block = build_oai_record_xml(
        identifier=F.concat(F.lit("oai:"), F.col("host"), F.lit(":"), okey),
        datestamp=F.col("o_orderdate").cast("string"),
        setspec=F.concat(F.lit("set"), (F.col("o_orderkey") % 3).cast("string")),
        deleted=F.col("o_orderkey") % 11 == 0,
        title=F.concat(F.lit("Order "), okey),
    )
    xml = (
        u.select("host", "o_orderkey", block.alias("_b"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<ListRecords>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("o_orderkey", "_b"))),
                        lambda s: s["_b"],
                    ),
                    "",
                ),
                F.lit("</ListRecords>"),
            ).alias("xml")
        )
    )
    recs = parse_oai_records(xml, "xml", keep_cols=["host"])
    return harvest_window(
        recs, from_date="1994-01-01", until_date="1995-12-31", set_spec="set1"
    )


def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rule-based sentence segmentation stats (the stage between
    # extraction and packing): the fixture prefixes every doc with a
    # battery that exercises all five protection passes (decimals,
    # e.g./i.e., et al., title abbreviations, initials) and injects
    # per-doc-variable boundaries by promoting 'window' occurrences
    # to sentence starts — both twins share the construction.
    from sandcrawler_spark.functions.sentences import with_sentence_stats

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Dr. J. Smith et al. found e.g. values near 3.14 and 2.71! "),
        F.regexp_replace(F.col("text"), "window", "end. Window"),
    )
    docs = d.select(F.col("doc_id").cast("bigint").alias("doc_id"), raw.alias("text"))
    return with_sentence_stats(docs).select(
        "doc_id", "n_words", "n_sentences", "mean_words_x100"
    )


def q_robots_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 9309 §2.4 robots-cache freshness audit: every page fetch
    # classified fresh / expired(>24h) / miss against the per-host
    # robots-refetch log (events stream; 1-in-97 events are robots
    # fetches). Broadcast host-level refetch arrays, zero shuffle on
    # the fetch log; the oracle replays it as a DuckDB ASOF join.
    from sandcrawler_spark.operators.politeness import robots_cache_audit

    e = _t(spark, sf_dir, "events")
    host = F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".example.net"))
    fetches = e.select(
        host.alias("host"),
        F.unix_timestamp("ts").cast("long").alias("epoch_s"),
    )
    robots = e.filter(F.col("event_id") % 97 == 0).select(
        host.alias("host"),
        F.unix_timestamp("ts").cast("long").alias("robots_epoch_s"),
    )
    return robots_cache_audit(fetches, robots, ttl_s=86400).orderBy("host")


def q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # domain-level curation triage: per-doc quality gate (>= 50 words)
    # rolled up to the PSL registered domain and scored with the
    # Wilson lower bound (Wilson 1927) so thin-evidence domains rank
    # below well-attested ones — the RefinedWeb-style domain
    # allow/deny sort key. Hosts mix www/apex forms so the PSL fold
    # is exercised; the oracle derives the domain arithmetically.
    from sandcrawler_spark.functions.psl import with_registered_domain
    from sandcrawler_spark.operators.diagnostics import wilson_domain_rollup
    from sandcrawler_spark.functions.sentences import _WORD_PAT

    d = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("b"),
        (F.col("doc_id") % 23).cast("string"),
        F.lit("site.com"),
    )
    docs = d.select(
        host.alias("host"),
        (F.regexp_count(F.col("text"), F.lit(_WORD_PAT)) >= 50).alias("passed"),
    )
    docs = with_registered_domain(docs, "host")
    return wilson_domain_rollup(docs, "registered_domain", "passed", min_docs=3)


def q_cdx_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDX-server collapse=timestamp:8 (one row per URL-day, first
    # capture kept, collapsed count carried): the dedup view replay
    # UIs page through — one min(struct) aggregate, no per-URL window
    from sandcrawler_spark.operators.cdxslice import collapse_captures

    return collapse_captures(_captures(spark, sf_dir), digits=8)


def q_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RSS/Atom autodiscovery (<link rel="alternate" type="application/
    # rss+xml|atom+xml">): attribute order varies per page build and
    # relative hrefs resolve against the page URL — the discovery half
    # of feed_roundtrip. Oracle derives feed URLs relationally.
    from sandcrawler_spark.functions.feeds import discover_feeds

    u = _urls(spark, sf_dir).filter(F.col("site_id") < 8)
    m = F.col("o_orderkey") % 4
    head = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<head><link rel="alternate" type="application/rss+xml" href="https://'),
                F.col("host"),
                F.lit('/feed.xml"><title>t</title></head>'),
            ),
        )
        .when(
            m == 1,
            F.lit("<head><link type='application/atom+xml' rel='alternate' href='/atom.xml'></head>"),
        )
        .when(
            m == 2,
            F.lit('<head><link rel="stylesheet" href="/style.css">'
                  '<link rel="alternate" type="application/rss+xml" href="rss"></head>'),
        )
        .otherwise(F.lit("<head><title>no feed</title></head>"))
    )
    pages = u.select("url", head.alias("html"), F.col("o_orderkey"))
    return discover_feeds(pages, "html", "url", keep_cols=["o_orderkey"])


def q_link_rot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # link-rot transition matrix (first-capture status vs last-capture
    # status per URL): death/resurrection accounting the recrawler and
    # seen-set read — two struct extrema per URL, no per-URL window
    from sandcrawler_spark.operators.recrawl import link_rot

    return link_rot(_captures(spark, sf_dir))


def q_purge_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deletion-compliance receipt: one takedown list (doc_id % 17)
    # propagated across documents, embeddings, and a derived packed
    # subset — broadcast semi-joins, n_before = n_purged + n_after
    from sandcrawler_spark.operators.denylist import purge_propagation

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    purge = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").cast("long").alias("key")
    )
    packed = d.filter(F.col("doc_id") % 3 != 0)
    return purge_propagation(
        {
            "documents": (d.withColumn("doc_id", F.col("doc_id").cast("long")), "doc_id"),
            "embeddings": (e.withColumn("vec_id", F.col("vec_id").cast("long")), "vec_id"),
            "packed": (packed.withColumn("doc_id", F.col("doc_id").cast("long")), "doc_id"),
        },
        purge,
    ).orderBy("table_name")


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # leakage-safe temporal split with an embargo gap (train <
    # 1995-10-03, gap dropped, test >= 1996-01-01) over order dates —
    # string-range predicates the parquet scan prunes on
    from sandcrawler_spark.operators.sampling import temporal_split

    o = _t(spark, sf_dir, "orders")
    return temporal_split(o, "o_orderdate", "1995-10-03", "1996-01-01").orderBy("split")


def q_cdxj_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDXJ (pywb/OutbackCDX JSON-block index lines) build -> parse
    # roundtrip over the capture stream; the oracle derives the rows
    # relationally from events and never touches the line format
    from sandcrawler_spark.functions.cdxfmt import build_cdxj_line, parse_cdxj_lines

    c = _captures(spark, sf_dir)
    surt = F.concat(
        F.lit("org,example,stream)/u/"),
        F.regexp_extract(F.col("url"), r"/u/(\d+)$", 1),
    )
    lines = c.select(
        build_cdxj_line(
            surt, F.col("datetime"), F.col("url"), F.col("mimetype"),
            F.col("status_code"), F.col("sha1hex"),
            F.col("warc_csize"), (F.col("event_id") % 100000).cast("long"),
            F.col("warc_path"),
        ).alias("value")
    )
    return parse_cdxj_lines(lines)


def q_warc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WARC 1.1 record segmentation (ISO 28500 WARC-Segment-*):
    # payloads split in thirds, reassembled in segment order with
    # declared-length and 1..n-contiguity validation; planted defects
    # exercise both failure arms (doc_id%13 -> gap, %17 -> mismatch)
    from sandcrawler_spark.sources.warcfmt import reassemble_segments

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    L = F.length("text")
    third = F.floor(L / 3).cast("int")
    segs = None
    for i, (start, ln) in enumerate(
        [(F.lit(1), third), (third + 1, third), (2 * third + 1, L)], start=1
    ):
        part = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("origin_id"),
            F.lit(i).alias("segment_number"),
            F.substring(F.col("text"), start, ln).alias("payload"),
            (
                F.when(
                    F.col("doc_id") % 17 == 0, F.octet_length("text") + 1
                ).otherwise(F.octet_length("text")).cast("long")
                if i == 3
                else F.lit(None).cast("long")
            ).alias("segment_total_length"),
            F.col("doc_id"),
        )
        if i == 2:
            part = part.filter(F.col("doc_id") % 13 != 0)
        segs = part if segs is None else segs.unionByName(part)
    return reassemble_segments(segs.drop("doc_id"))


def q_timemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFC 7089 Memento TimeMap per URL: link-format serialization with
    # first/last/interior rel values and integer-arithmetic
    # IMF-fixdates (no JVM formatter, no locale) — per-URL sorted
    # collect, the lookup_best group shape
    from sandcrawler_spark.functions.memento import timemap_export

    return timemap_export(_captures(spark, sf_dir))


def q_arc2warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ARC -> WARC migration (the archive-ops job that moved pre-2008
    # holdings): every legacy record re-framed as a WARC/1.0 resource
    # record with ISO date + deterministic digest id; the receipt is
    # the per-record migration table (sizes prove the re-framing)
    from sandcrawler_spark.sources.warcfmt import arc2warc_record_col

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id")
    url = F.concat(F.lit("https://site"), (did % 10).cast("string"),
                   F.lit(".example.com/doc/"), did.cast("string"))
    date14 = F.concat(F.lit("20200101"), F.lpad((did % 240000).cast("string"), 6, "0"))
    payload = F.concat(F.lit("HTTP/1.1 200 OK\n\n"), F.col("text"))
    rec = arc2warc_record_col(url, date14, F.lit("text/html"), payload)
    return d.select(
        did.cast("long").alias("doc_id"),
        url.alias("url"),
        F.regexp_extract(rec, r"WARC-Date: (\S+)", 1).alias("warc_date"),
        F.regexp_extract(rec, r"WARC-Record-ID: <([^>]*)>", 1).alias("record_id"),
        F.octet_length(payload).cast("long").alias("content_length"),
        F.octet_length(rec).cast("long").alias("record_len"),
    )


def q_feed_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    # feed-polling cadence from observed publish rates (the policy
    # layer over the feed discovery channel): entries/day in integer
    # x100, poll interval = 24h / rate clamped to [1h, 168h] — one
    # host-keyed aggregate, the dual of capture-based change rates
    from sandcrawler_spark.operators.recrawl import feed_poll_schedule

    u = _urls(spark, sf_dir).filter(F.col("site_id") < 10)
    entries = u.select("host", F.col("o_orderdate").alias("published"))
    return feed_poll_schedule(entries, as_of="1998-12-31")


def q_kn_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    # Goodman 1999 §4, count-estimated discount D = N1/(N1+2*N2)):
    # the classical-smoothing counterpart to sb_lm_scores, scored in
    # integer micro-nats over the same corpus
    from sandcrawler_spark.operators.lm import kn_score_docs, train_kneser_ney

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bi, ctx, cont, glob = train_kneser_ney(docs)
    return kn_score_docs(docs, bi, ctx, cont, glob)


_STALE_FIRST = [
    # round-5 session-B additions — never driver-checked, sample first
    "oai_harvest", "sentence_stats", "robots_cache", "kn_lm_scores",
    "domain_quality", "cdx_collapse", "feed_discovery",
    "link_rot", "purge_propagation", "temporal_split",
    "cdxj_roundtrip", "warc_segments", "timemap", "arc2warc", "feed_poll",
    # round-5 additions — never driver-checked, sample first
    "pq_codebook", "ivf_cell_profile",
    # round-4 session-16 additions — never driver-checked, sample first
    "identifier_extract", "image_dims", "maxscore_topk", "html_blocks",
    "textrank_keywords", "url_resolve", "unigram_segment", "jsonld_meta",
    "lang_segments", "recrawl_allocation", "parked_domains", "longest_repeat",
    "tracker_hosts", "bbit_minhash", "table_markdown", "url_taxonomy",
    "capture_drift", "outlink_resolved", "http_dates", "arc_roundtrip",
    "gopher_quality", "seen_compare", "nb_calibration", "anchor_search",
    "warc_revisit_write", "https_upgrade",
    # round-4 session-14 additions — never driver-checked, sample first
    "redirect_resolution", "fuzzy_url_join", "pmi_pairs", "kcenter_select",
    "cache_headers", "subdomain_traps", "nepotistic_links",
    "hard_negatives", "charset_sniff",
    # round-4 session-13 additions — never driver-checked, sample first
    "skew_advisor", "warc_cdx_audit",
    # round-4 session-12 additions — never driver-checked, sample first
    "dhash_images", "audio_chunks", "cdn_politeness", "scd2_history",
    "template_clusters",
    # round-4 session-11 additions — never driver-checked, sample first
    "frame_sample", "media_resize", "ip_politeness", "crawl_lineage",
    # round-4 session-10 additions — never driver-checked, sample first
    "tag_density", "title_dupes", "meta_tags", "postings_compression",
    "frontier_merge", "outlink_entropy", "circuit_breaker", "wat_export",
    "lsh_tuning", "robots_coverage", "mixture_epochs", "cdx_export",
    "dup_cluster_histogram", "anchor_stuffing", "capture_coverage",
    "keep_longest_dedupe", "robots_delta",
    # round-4 session-9 additions — never driver-checked, sample first
    "ucb_frontier", "pagination_gaps", "alloc_fairness",
    "revalidation_savings", "host_ktruss", "wet_roundtrip",
    "bpe_coverage", "sitemap_recrawl", "reshard_churn", "ann_sq8",
    "host_wcc", "lang_mismatch", "pagination_fill", "frontier_aging",
    "sketch_accuracy", "host_branching", "retry_after", "ring_balance",
    "seen_sizing",
    # round-4 session-8 additions — never driver-checked, sample first
    "ann_ivfpq", "hll_sliding", "host_mirrors", "ewma_trend",
    "pct_normalize", "stratum_overlap", "distance_profile",
    "hreflang_pairs", "meta_refresh", "host_moves", "crawl_capacity",
    "topic_affinity", "shard_cut", "community_shard_cut",
    "salsa_scores", "degree_assortativity", "interval_join",
    "event_transitions", "rate_anomalies", "soft_dedupe_weights",
    # round-4 session-7 additions — never driver-checked, sample first
    "mime_sniff",
    "opic_scores", "adamic_adar", "char_entropy", "token_drift", "zipf_fit",
    # round-4 session-6 additions — never driver-checked, sample first
    "spam_mass", "bowtie_classes", "readability", "tfidf_keywords",
    "cdc_chunks", "seed_cover", "capture_recapture", "url_badwords",
    "embedding_pca", "snapshot_diff", "novelty_curve", "source_diversity",
    "degree_distribution",
    # round-4 session-5 additions — never driver-checked, sample first
    "host_triangles", "weighted_sample", "dust_rules",
    "kmv_host_cardinality", "sb_lm_scores", "weighted_sample_stratified",
    "kmv_overlap", "canonical_aliases",
    "pq_codes", "ann_pq", "pq_recall",
    "warc_roundtrip", "warc_fetch_join", "corpus_sample",
    "benchmark_decontaminate", "ann_recall",
    "minhash_lsh", "simhash_pairs", "cosine_knn", "ann_lsh",
    "ann_lsh_multiprobe", "ann_ivf", "slug_self_join", "score_insertable",
    "batch_dedupe_latest", "recrawl_frontier", "fetch_statuses",
    "extraction_roundtrip", "multimodal_meta", "html_biblio",
    "sub_resources", "sha1_digest_join", "surt_seed_join", "union_lanes",
    "grobid_hook", "revisit_resolution",
    # r4 additions with no driver history yet get appended here
    "cumulative_events", "recrawl_rates", "shard_assign",
    "incremental_pagerank", "adaptive_delay", "hyperball_centrality",
    "histogram_quantiles",
    "dsir_weights", "anchor_texts", "zorder_prune", "trust_rank",
    "reciprocal_links", "c4_line_filters", "nb_quality", "feed_roundtrip",
    "robots_match", "soft404", "registered_domain", "bpe_encode",
    "fix_mojibake", "domain_budget_alloc", "host_communities",
    "context_pack", "containment_pairs", "ccnet_buckets", "nfc_normalize",
    "line_dedupe",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = _all_queries()
    out = {k: qs[k] for k in _STALE_FIRST if k in qs}
    out.update((k, v) for k, v in qs.items() if k not in out)
    return out


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "identifier_extract": q_identifier_extract,
        "image_dims": q_image_dims,
        "maxscore_topk": q_maxscore_topk,
        "html_blocks": q_html_blocks,
        "textrank_keywords": q_textrank_keywords,
        "url_resolve": q_url_resolve,
        "unigram_segment": q_unigram_segment,
        "jsonld_meta": q_jsonld_meta,
        "lang_segments": q_lang_segments,
        "recrawl_allocation": q_recrawl_allocation,
        "parked_domains": q_parked_domains,
        "longest_repeat": q_longest_repeat,
        "tracker_hosts": q_tracker_hosts,
        "bbit_minhash": q_bbit_minhash,
        "table_markdown": q_table_markdown,
        "url_taxonomy": q_url_taxonomy,
        "capture_drift": q_capture_drift,
        "outlink_resolved": q_outlink_resolved,
        "http_dates": q_http_dates,
        "arc_roundtrip": q_arc_roundtrip,
        "gopher_quality": q_gopher_quality,
        "seen_compare": q_seen_compare,
        "nb_calibration": q_nb_calibration,
        "anchor_search": q_anchor_search,
        "warc_revisit_write": q_warc_revisit_write,
        "https_upgrade": q_https_upgrade,
        "redirect_resolution": q_redirect_resolution,
        "fuzzy_url_join": q_fuzzy_url_join,
        "pmi_pairs": q_pmi_pairs,
        "kcenter_select": q_kcenter_select,
        "cache_headers": q_cache_headers,
        "subdomain_traps": q_subdomain_traps,
        "nepotistic_links": q_nepotistic_links,
        "hard_negatives": q_hard_negatives,
        "charset_sniff": q_charset_sniff,
        "skew_advisor": q_skew_advisor,
        "warc_cdx_audit": q_warc_cdx_audit,
        "dhash_images": q_dhash_images,
        "audio_chunks": q_audio_chunks,
        "cdn_politeness": q_cdn_politeness,
        "scd2_history": q_scd2_history,
        "template_clusters": q_template_clusters,
        "frame_sample": q_frame_sample,
        "media_resize": q_media_resize,
        "ip_politeness": q_ip_politeness,
        "crawl_lineage": q_crawl_lineage,
        "tag_density": q_tag_density,
        "title_dupes": q_title_dupes,
        "meta_tags": q_meta_tags,
        "postings_compression": q_postings_compression,
        "frontier_merge": q_frontier_merge,
        "outlink_entropy": q_outlink_entropy,
        "circuit_breaker": q_circuit_breaker,
        "wat_export": q_wat_export,
        "lsh_tuning": q_lsh_tuning,
        "robots_coverage": q_robots_coverage,
        "mixture_epochs": q_mixture_epochs,
        "anchor_stuffing": q_anchor_stuffing,
        "capture_coverage": q_capture_coverage,
        "keep_longest_dedupe": q_keep_longest_dedupe,
        "robots_delta": q_robots_delta,
        "cdx_export": q_cdx_export,
        "dup_cluster_histogram": q_dup_cluster_histogram,
        "lineitem_rollup": q_lineitem_rollup,
        "status_counts": q_status_counts,
        "hit_rate_stats": q_hit_rate_stats,
        "politeness_schedule": q_politeness_schedule,
        "politeness_delay": q_politeness_delay,
        "politeness_timing": q_politeness_timing,
        "robots_parse": q_robots_parse,
        "robots_match": q_robots_match,
        "soft404": q_soft404,
        "registered_domain": q_registered_domain,
        "fix_mojibake": q_fix_mojibake,
        "seen_antijoin": q_seen_antijoin,
        "seen_bloom": q_seen_bloom,
        "seen_cuckoo": q_seen_cuckoo,
        "span_dedupe": q_span_dedupe,
        "outlink_edges": q_outlink_edges,
        "backlink_features": q_backlink_features,
        "link_depth": q_link_depth,
        "host_pagerank": q_host_pagerank,
        "host_hits": q_host_hits,
        "host_kcore": q_host_kcore,
        "host_ktruss": q_host_ktruss,
        "host_wcc": q_host_wcc,
        "lang_mismatch": q_lang_mismatch,
        "wet_roundtrip": q_wet_roundtrip,
        "bpe_coverage": q_bpe_coverage,
        "sitemap_recrawl": q_sitemap_recrawl,
        "reshard_churn": q_reshard_churn,
        "ann_sq8": q_ann_sq8,
        "host_communities": q_host_communities,
        "community_modularity": q_community_modularity,
        "host_coupling": q_host_coupling,
        "spam_mass": q_spam_mass,
        "opic_scores": q_opic_scores,
        "adamic_adar": q_adamic_adar,
        "char_entropy": q_char_entropy,
        "token_drift": q_token_drift,
        "zipf_fit": q_zipf_fit,
        "bowtie_classes": q_bowtie_classes,
        "seed_cover": q_seed_cover,
        "capture_recapture": q_capture_recapture,
        "url_badwords": q_url_badwords,
        "embedding_pca": q_embedding_pca,
        "snapshot_diff": q_snapshot_diff,
        "source_diversity": q_source_diversity,
        "degree_distribution": q_degree_distribution,
        "salsa_scores": q_salsa_scores,
        "degree_assortativity": q_degree_assortativity,
        "interval_join": q_interval_join,
        "event_transitions": q_event_transitions,
        "rate_anomalies": q_rate_anomalies,
        "soft_dedupe_weights": q_soft_dedupe_weights,
        "hll_sliding": q_hll_sliding,
        "host_mirrors": q_host_mirrors,
        "ewma_trend": q_ewma_trend,
        "pct_normalize": q_pct_normalize,
        "stratum_overlap": q_stratum_overlap,
        "distance_profile": q_distance_profile,
        "hreflang_pairs": q_hreflang_pairs,
        "meta_refresh": q_meta_refresh,
        "host_moves": q_host_moves,
        "crawl_capacity": q_crawl_capacity,
        "topic_affinity": q_topic_affinity,
        "shard_cut": q_shard_cut,
        "community_shard_cut": q_community_shard_cut,
        "novelty_curve": q_novelty_curve,
        "page_robots": q_page_robots,
        "nofollow_outlinks": q_nofollow_outlinks,
        "trust_rank": q_trust_rank,
        "reciprocal_links": q_reciprocal_links,
        "host_triangles": q_host_triangles,
        "weighted_sample": q_weighted_sample,
        "dust_rules": q_dust_rules,
        "dust_apply": q_dust_apply,
        "frontier_rank_blend": q_frontier_rank_blend,
        "hll_host_cardinality": q_hll_host_cardinality,
        "kmv_host_cardinality": q_kmv_host_cardinality,
        "kmv_overlap": q_kmv_overlap,
        "canonical_aliases": q_canonical_aliases,
        "sb_lm_scores": q_sb_lm_scores,
        "kn_lm_scores": q_kn_lm_scores,
        "domain_quality": q_domain_quality,
        "cdx_collapse": q_cdx_collapse,
        "feed_discovery": q_feed_discovery,
        "link_rot": q_link_rot,
        "purge_propagation": q_purge_propagation,
        "temporal_split": q_temporal_split,
        "cdxj_roundtrip": q_cdxj_roundtrip,
        "warc_segments": q_warc_segments,
        "timemap": q_timemap,
        "arc2warc": q_arc2warc,
        "feed_poll": q_feed_poll,
        "oai_harvest": q_oai_harvest,
        "sentence_stats": q_sentence_stats,
        "robots_cache": q_robots_cache,
        "weighted_sample_stratified": q_weighted_sample_stratified,
        "cms_part_counts": q_cms_part_counts,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "sitemap_roundtrip": q_sitemap_roundtrip,
        "feed_roundtrip": q_feed_roundtrip,
        "temperature_mix": q_temperature_mix,
        "url_traps": q_url_traps,
        "ucb_frontier": q_ucb_frontier,
        "pagination_gaps": q_pagination_gaps,
        "pagination_fill": q_pagination_fill,
        "frontier_aging": q_frontier_aging,
        "sketch_accuracy": q_sketch_accuracy,
        "host_branching": q_host_branching,
        "retry_after": q_retry_after,
        "ring_balance": q_ring_balance,
        "seen_sizing": q_seen_sizing,
        "alloc_fairness": q_alloc_fairness,
        "revalidation_savings": q_revalidation_savings,
        "best_capture": q_best_capture,
        "asof_closest": q_asof_closest,
        "paper_filter_slice": q_paper_filter_slice,
        "tarball_filter_slice": q_tarball_filter_slice,
        "surt_canonical": q_surt_canonical,
        "word_counts": q_word_counts,
        "quality_scores": q_quality_scores,
        "readability": q_readability,
        "lang_pred_counts": q_lang_pred_counts,
        "token_counts": q_token_counts,
        "winnow_fingerprints": q_winnow_fingerprints,
        "postings_stats": q_postings_stats,
        "tfidf_keywords": q_tfidf_keywords,
        "cdc_chunks": q_cdc_chunks,
        "bm25_search": q_bm25_search,
        "phrase_search": q_phrase_search,
        "lm_doc_scores": q_lm_doc_scores,
        "ccnet_buckets": q_ccnet_buckets,
        "nfc_normalize": q_nfc_normalize,
        "c4_line_filters": q_c4_line_filters,
        "nb_quality": q_nb_quality,
        "dsir_weights": q_dsir_weights,
        "anchor_texts": q_anchor_texts,
        "zorder_prune": q_zorder_prune,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "host_budget_alloc": q_host_budget_alloc,
        "domain_budget_alloc": q_domain_budget_alloc,
        "context_pack": q_context_pack,
        "cumulative_events": q_cumulative_events,
        "corpus_pack": q_corpus_pack,
        "event_quantiles": q_event_quantiles,
        "user_sessions": q_user_sessions,
        "embedding_neardup": q_embedding_neardup,
        "semantic_dedupe": q_semantic_dedupe,
        "corpus_split": q_corpus_split,
        "topic_balance": q_topic_balance,
        "corpus_diagnostics": q_corpus_diagnostics,
        "script_profile": q_script_profile,
        "corpus_manifest": q_corpus_manifest,
        "lang_profile": q_lang_profile,
        "quality_fusion": q_quality_fusion,
        "fingerprint_dedupe": q_fingerprint_dedupe,
        "jaccard_pairs": q_jaccard_pairs,
        "containment_pairs": q_containment_pairs,
        "line_dedupe": q_line_dedupe,
        "host_boilerplate": q_host_boilerplate,
        "boilerplate_strip": q_boilerplate_strip,
        "dedupe_recall": q_dedupe_recall,
        "neardup_dedupe": q_neardup_dedupe,
        "gopher_repetition": q_gopher_repetition,
        "paragraph_dedupe": q_paragraph_dedupe,
        "pii_scrub": q_pii_scrub,
        "warc_roundtrip": q_warc_roundtrip,
        "warc_fetch_join": q_warc_fetch_join,
        "corpus_sample": q_corpus_sample,
        "benchmark_decontaminate": q_benchmark_decontaminate,
        "minhash_lsh": q_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "cosine_knn": q_cosine_knn,
        "ann_lsh": q_ann_lsh,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "ann_ivf": q_ann_ivf,
        "ann_recall": q_ann_recall,
        "pq_codes": q_pq_codes,
        "ann_pq": q_ann_pq,
        "ann_ivfpq": q_ann_ivfpq,
        "pq_recall": q_pq_recall,
        "pq_codebook": q_pq_codebook,
        "ivf_cell_profile": q_ivf_cell_profile,
        "slug_self_join": q_slug_self_join,
        "score_insertable": q_score_insertable,
        "batch_dedupe_latest": q_batch_dedupe_latest,
        "recrawl_frontier": q_recrawl_frontier,
        "fetch_statuses": q_fetch_statuses,
        "extraction_roundtrip": q_extraction_roundtrip,
        "multimodal_meta": q_multimodal_meta,
        "html_biblio": q_html_biblio,
        "sub_resources": q_sub_resources,
        "sha1_digest_join": q_sha1_digest_join,
        "surt_seed_join": q_surt_seed_join,
        "union_lanes": q_union_lanes,
        "grobid_hook": q_grobid_hook,
        "revisit_resolution": q_revisit_resolution,
        "recrawl_rates": q_recrawl_rates,
        "shard_assign": q_shard_assign,
        "mime_sniff": q_mime_sniff,
        "incremental_pagerank": q_incremental_pagerank,
        "adaptive_delay": q_adaptive_delay,
        "hyperball_centrality": q_hyperball_centrality,
        "histogram_quantiles": q_histogram_quantiles,
    }


def _sql_cos(a: str, b: str, digits: int = 6) -> str:
    """DuckDB cosine between two DOUBLE lists — same left-fold order as
    the Spark F.aggregate tier, so doubles match exactly."""
    return (
        f"round(list_reduce(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]), (x, y) -> x + y)"
        f" / (sqrt(list_reduce(list_transform({a}, t -> t * t), (x, y) -> x + y))"
        f" * sqrt(list_reduce(list_transform({b}, t -> t * t), (x, y) -> x + y))), {digits})"
    )


def _kcenter_oracle(k: int = 8) -> str:
    """Greedy k-center twin: k-1 unrolled select/update CTE rounds with
    the engine's exact determinism contract — round(cos, 6) left-fold
    (same FP op order via _sql_cos), argmin on (ms, vec_id), seed =
    min vec_id, far_cos -2.0 sentinel for the seed."""
    # MATERIALIZED: DuckDB inlines single-reference CTEs, and inlining
    # this chained fold re-evaluates every earlier round inside each
    # later one — exponential work (minutes at sf0.01; 0.1 s
    # materialized). A pure planner hint: results are identical.
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "s1 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
    ]
    for r in range(2, k + 1):
        prev_m = f"m{r - 1}"
        prev_src = "e" if r == 2 else f"m{r - 2}"
        prev_ms = "-2.0" if r == 2 else f"m.ms"
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        ctes.append(
            f"{prev_m} AS MATERIALIZED (SELECT m.vec_id, m.v, "
            f"GREATEST({prev_ms}, {_sql_cos('m.v', 'c.v')}) AS ms "
            f"FROM {prev_src} m, s{r - 1} c)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT vec_id, v, ms FROM {prev_m} "
            f"WHERE vec_id NOT IN ({sel_union}) "
            f"ORDER BY ms ASC, vec_id ASC LIMIT 1)"
        )
    rows = ["SELECT CAST(1 AS INT) AS sel_rank, (SELECT vec_id FROM s1) AS vec_id, CAST(-2.0 AS DOUBLE) AS far_cos"]
    rows += [
        f"SELECT CAST({r} AS INT), (SELECT vec_id FROM s{r}), CAST((SELECT ms FROM s{r}) AS DOUBLE)"
        for r in range(2, k + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(rows)


def _ann_recall_oracle(n_q: int = 20, k: int = 5, n_planes: int = 4,
                       mod: int = 25, nprobe: int = 2, kmeans_iters: int = 2) -> str:
    """recall@k of every ANN method recomputed end-to-end in DuckDB:
    exact truth, LSH bucket join, multi-probe fan-out, id-mod IVF, and
    the 2-iteration k-means IVF. The k-means twin reproduces the
    engine's determinism contract: assignment by rounded cosine with
    cent_id tie-break, centroid update as a sorted-by-id left fold
    (list(val ORDER BY vec_id) + list_reduce) divided by the cell size,
    rounded to 6 — identical FP op order to the Spark tier."""
    base = f"""
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
dims AS (SELECT max(len(v)) AS dim FROM e),
idx AS (SELECT unnest(range(0, (SELECT dim FROM dims))) AS pos),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {n_q}),
truth AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY {_sql_cos('e.v', 'q.qv')} DESC, e.vec_id ASC) AS rn
    FROM e, q) WHERE rn <= {k}
),
planes AS (
  SELECT p, list_transform(range(0, dims.dim), c ->
    CAST(CAST('0x' || substr(md5('42:' || CAST(p AS VARCHAR) || ':' || CAST(c // 4 AS VARCHAR)), (c % 4) * 8 + 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0
  ) AS plane
  FROM (SELECT unnest(range(0, {n_planes})) AS p), dims
),
bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_reduce(list_transform(list_zip(e.v, pl.plane), z -> z[1] * z[2]), (a, b) -> a + b) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM e, planes pl
),
esig AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig FROM bits GROUP BY vec_id),
ev AS (SELECT e.vec_id, e.v, s.sig FROM e JOIN esig s ON e.vec_id = s.vec_id),
qs AS (SELECT vec_id AS q_id, v AS qv, sig FROM ev WHERE vec_id < {n_q}),
m_lsh AS (
  SELECT q_id, vec_id FROM (
    SELECT c.q_id, c.vec_id, ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY c.cosine DESC, c.vec_id ASC) AS rn
    FROM (SELECT p.q_id, x.vec_id, {_sql_cos('x.v', 'p.qv')} AS cosine
          FROM qs p JOIN ev x ON x.sig = p.sig) c) WHERE rn <= {k}
),
qprobe AS (
  SELECT q_id, qv, sig FROM qs
  UNION ALL
  SELECT q_id, qv,
         substr(sig, 1, CAST(i AS INT)) ||
         (CASE WHEN substr(sig, CAST(i AS INT) + 1, 1) = '1' THEN '0' ELSE '1' END) ||
         substr(sig, CAST(i AS INT) + 2) AS sig
  FROM qs, (SELECT unnest(range(0, {n_planes})) AS i)
),
m_mp AS (
  SELECT q_id, vec_id FROM (
    SELECT c.q_id, c.vec_id, ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY c.cosine DESC, c.vec_id ASC) AS rn
    FROM (SELECT DISTINCT p.q_id, x.vec_id, {_sql_cos('x.v', 'p.qv')} AS cosine
          FROM qprobe p JOIN ev x ON x.sig = p.sig) c) WHERE rn <= {k}
),
kc_0 AS (SELECT vec_id AS cent_id, v AS cv FROM e
         WHERE vec_id % (SELECT GREATEST({mod}, CAST(ceil(COUNT(*) / 4096.0) AS BIGINT)) FROM e) = 0)"""
    # k-means chain + the two IVF variants (id-mod probes kc_0, trained
    # probes the last iteration's centroids)
    km = ""
    for it in range(1, kmeans_iters + 1):
        km += f""",
kasg_{it} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, kc_{it - 1} c) WHERE rn = 1
),
kdim_{it} AS (
  SELECT cent_id, pos, list_reduce(list(val ORDER BY vec_id), (a, b) -> a + b) AS s, COUNT(*) AS n
  FROM (SELECT a.cent_id, a.vec_id, i.pos, a.v[CAST(i.pos AS INT) + 1] AS val FROM kasg_{it} a, idx i)
  GROUP BY cent_id, pos
),
kc_{it} AS (
  SELECT cent_id, list(round(s / n, 6) ORDER BY pos) AS cv FROM kdim_{it} GROUP BY cent_id
)"""

    def ivf_method(tag: str, cents: str, npr: int = nprobe) -> str:
        return f""",
iasg_{tag} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, {cents} c) WHERE rn = 1
),
iprb_{tag} AS (
  SELECT q_id, qv, cent_id FROM (
    SELECT q.q_id, q.qv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY {_sql_cos('q.qv', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM q, {cents} c) WHERE rn <= {npr}
),
m_{tag} AS (
  SELECT q_id, vec_id FROM (
    SELECT c.q_id, c.vec_id, ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY c.cosine DESC, c.vec_id ASC) AS rn
    FROM (SELECT p.q_id, a.vec_id, {_sql_cos('a.v', 'p.qv')} AS cosine
          FROM iprb_{tag} p JOIN iasg_{tag} a ON p.cent_id = a.cent_id) c) WHERE rn <= {k}
)"""

    methods = (
        km
        + ivf_method("ivf", "kc_0")
        + ivf_method("ivft", f"kc_{kmeans_iters}")
        + ivf_method("ivft4", f"kc_{kmeans_iters}", npr=4)
    )
    return f"""
WITH {base}{methods},
allm AS (
  SELECT 'lsh' AS method, q_id, vec_id FROM m_lsh
  UNION ALL SELECT 'lsh_multiprobe', q_id, vec_id FROM m_mp
  UNION ALL SELECT 'ivf', q_id, vec_id FROM m_ivf
  UNION ALL SELECT 'ivf_trained', q_id, vec_id FROM m_ivft
  UNION ALL SELECT 'ivf_trained_nprobe4', q_id, vec_id FROM m_ivft4
),
tn AS (SELECT COUNT(*) AS n_truth FROM truth),
hits AS (
  SELECT a.method, COUNT(*) AS n_hit
  FROM allm a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id
  GROUP BY a.method
),
names AS (SELECT unnest(['lsh', 'lsh_multiprobe', 'ivf', 'ivf_trained', 'ivf_trained_nprobe4']) AS method)
SELECT n.method, CAST(tn.n_truth AS BIGINT) AS n_truth,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       round(COALESCE(h.n_hit, 0) / tn.n_truth, 4) AS recall
FROM names n LEFT JOIN hits h ON n.method = h.method, tn
"""


def _semdedup_oracle(eps: float = 0.95, mod: int = 50, kmeans_iters: int = 2,
                     n_dups: int = 20, max_cell: int = 100_000) -> str:
    """SemDeDup twin: the k-means chain (same FP-op-order determinism
    contract as _ann_recall_oracle), nearest-cell assignment of the
    augmented corpus, within-cell eps-pairs, and recursive-reach
    connected components with min-id representatives (the
    neardup_dedupe convention)."""
    km = ""
    for it in range(1, kmeans_iters + 1):
        km += f""",
kasg_{it} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, kc_{it - 1} c) WHERE rn = 1
),
kdim_{it} AS (
  SELECT cent_id, pos, list_reduce(list(val ORDER BY vec_id), (a, b) -> a + b) AS s, COUNT(*) AS n
  FROM (SELECT a.cent_id, a.vec_id, i.pos, a.v[CAST(i.pos AS INT) + 1] AS val FROM kasg_{it} a, idx i)
  GROUP BY cent_id, pos
),
kc_{it} AS (
  SELECT cent_id, list(round(s / n, 6) ORDER BY pos) AS cv FROM kdim_{it} GROUP BY cent_id
)"""
    return f"""
WITH RECURSIVE
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id < {n_dups}
),
dims AS (SELECT max(len(v)) AS dim FROM e),
idx AS (SELECT unnest(range(0, (SELECT dim FROM dims))) AS pos),
kc_0 AS (SELECT vec_id AS cent_id, v AS cv FROM e
         WHERE vec_id % (SELECT GREATEST({mod}, CAST(ceil(COUNT(*) / 4096.0) AS BIGINT)) FROM e) = 0){km},
sasg AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, kc_{kmeans_iters} c) WHERE rn = 1
),
cellsz AS (SELECT cent_id, COUNT(*) AS n FROM sasg GROUP BY cent_id),
pairable AS (
  SELECT s.vec_id, s.v, s.cent_id FROM sasg s JOIN cellsz c USING (cent_id)
  WHERE c.n <= {max_cell}
),
sprs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM pairable a JOIN pairable b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE {_sql_cos('a.v', 'b.v')} >= {eps!r}
),
sedges AS (
  SELECT id_a AS s, id_b AS t FROM sprs
  UNION
  SELECT id_b AS s, id_a AS t FROM sprs
),
sreach AS (
  SELECT s, t FROM sedges
  UNION
  SELECT r.s, e2.t FROM sreach r JOIN sedges e2 ON r.t = e2.s
)
SELECT a.vec_id, a.cent_id,
       least(a.vec_id, coalesce(min(r.t), a.vec_id)) AS rep_id,
       a.vec_id = least(a.vec_id, coalesce(min(r.t), a.vec_id)) AS is_rep
FROM sasg a LEFT JOIN sreach r ON r.s = a.vec_id
GROUP BY a.vec_id, a.cent_id
"""


def _topic_balance_oracle(budget: int = 300, alpha: float = 0.7, mod: int = 50,
                          kmeans_iters: int = 2, seed: str = "d4:42") -> str:
    """cluster_balanced_sample twin: the _semdedup_oracle k-means
    chain (no dup augmentation) + the temperature_mix rate/keep math
    keyed by cent_id."""
    km = ""
    for it in range(1, kmeans_iters + 1):
        km += f""",
kasg_{it} AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, kc_{it - 1} c) WHERE rn = 1
),
kdim_{it} AS (
  SELECT cent_id, pos, list_reduce(list(val ORDER BY vec_id), (a, b) -> a + b) AS s, COUNT(*) AS n
  FROM (SELECT a.cent_id, a.vec_id, i.pos, a.v[CAST(i.pos AS INT) + 1] AS val FROM kasg_{it} a, idx i)
  GROUP BY cent_id, pos
),
kc_{it} AS (
  SELECT cent_id, list(round(s / n, 6) ORDER BY pos) AS cv FROM kdim_{it} GROUP BY cent_id
)"""
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
dims AS (SELECT max(len(v)) AS dim FROM e),
idx AS (SELECT unnest(range(0, (SELECT dim FROM dims))) AS pos),
kc_0 AS (SELECT vec_id AS cent_id, v AS cv FROM e
         WHERE vec_id % (SELECT GREATEST({mod}, CAST(ceil(COUNT(*) / 4096.0) AS BIGINT)) FROM e) = 0){km},
sasg AS (
  SELECT vec_id, cent_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, kc_{kmeans_iters} c) WHERE rn = 1
),
counts AS (SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_docs FROM sasg GROUP BY cent_id),
wtd AS (SELECT cent_id, n_docs, pow(CAST(n_docs AS DOUBLE), {alpha!r}) AS w FROM counts),
tot AS (SELECT SUM(w) AS tw FROM wtd),
rates AS (
  SELECT cent_id,
         least(1.0, CAST(CAST(round({float(budget)!r} * w / tw) AS BIGINT) AS DOUBLE) / n_docs) AS rate
  FROM wtd CROSS JOIN tot
)
SELECT s.vec_id, s.cent_id, round(r.rate, 9) AS rate,
       CAST(CAST('0x' || substr(md5('{seed}:' || CAST(s.vec_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE)
         / 4294967296.0 AS u,
       (CAST(CAST('0x' || substr(md5('{seed}:' || CAST(s.vec_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE)
         / 4294967296.0) < r.rate AS kept
FROM sasg s JOIN rates r USING (cent_id)
"""


def _sql_l2m(a: str, b: str) -> str:
    """Squared-L2 in integer micro-units — the operators/pq.py
    determinism contract replayed in DuckDB."""
    return (
        f"CAST(round(1000000 * list_reduce(list_transform(list_zip({a}, {b}), "
        f"z -> (z[1] - z[2]) * (z[1] - z[2])), (x, y) -> x + y)) AS BIGINT)"
    )


def _pq_oracle(query: str, m: int = 4, n_iters: int = 2, ksub: int = 16,
               sample_cap: int = 1024, n_q: int = 5, k: int = 5,
               coarse_mod: int = 25, max_cells: int = 4096,
               nprobe: int = 2) -> str:
    """End-to-end DuckDB twin of the PQ family (operators/pq.py):
    per-subspace k-means (same sorted-fold/round-6 Lloyd updates as the
    IVF oracle) over the BOUNDED deterministic training sample (stride
    = max(1, n // sample_cap), seeds = ksub smallest sampled ids),
    dense-code assignment of the FULL corpus, and — for
    `ann_pq`/`pq_recall` — the ADC LUT scan. query in {'codes', 'ann',
    'recall', 'ivfpq'}; 'ivfpq' additionally replays the CAPPED-cell
    coarse quantizer (stride = max(coarse_mod, ceil(n / max_cells)),
    rounded-cosine assignment + nprobe probe, the ann_ivf CTEs) and
    restricts the ADC scan to probed cells."""
    base = f"""
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
dims AS (SELECT max(len(v)) AS dim FROM e),
sd AS (SELECT CAST(dim // {m} AS INT) AS subdim FROM dims),
subs AS (SELECT CAST(unnest(range(0, {m})) AS INT) AS sub),
esub AS (
  SELECT e.vec_id, s.sub,
         e.v[s.sub * sd.subdim + 1 : (s.sub + 1) * sd.subdim] AS sv
  FROM e, subs s, sd
),
sidx AS (SELECT unnest(range(0, (SELECT subdim FROM sd))) AS pos),
strd AS (SELECT GREATEST(1, COUNT(*) // {sample_cap}) AS stride FROM e),
seeds AS (SELECT vec_id FROM e, strd WHERE vec_id % strd.stride = 0
          ORDER BY vec_id LIMIT {ksub}),
tsub AS (SELECT es.* FROM esub es, strd WHERE es.vec_id % strd.stride = 0),
pc_0 AS (SELECT es.sub, es.vec_id AS cent_id, es.sv AS cv
         FROM esub es JOIN seeds s USING (vec_id))"""
    for it in range(1, n_iters + 1):
        base += f""",
pasg_{it} AS (
  SELECT vec_id, sub, sv, cent_id FROM (
    SELECT x.vec_id, x.sub, x.sv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.sub
                              ORDER BY {_sql_l2m('x.sv', 'c.cv')} ASC, c.cent_id ASC) AS rn
    FROM tsub x JOIN pc_{it - 1} c ON x.sub = c.sub) WHERE rn = 1
),
pdim_{it} AS (
  SELECT sub, cent_id, pos, list_reduce(list(val ORDER BY vec_id), (a, b) -> a + b) AS s2, COUNT(*) AS n
  FROM (SELECT a.sub, a.cent_id, a.vec_id, i.pos, a.sv[CAST(i.pos AS INT) + 1] AS val
        FROM pasg_{it} a, sidx i)
  GROUP BY sub, cent_id, pos
),
pc_{it} AS (SELECT sub, cent_id, list(round(s2 / n, 6) ORDER BY pos) AS cv FROM pdim_{it} GROUP BY sub, cent_id)"""
    base += f""",
book AS (
  SELECT sub, cent_id, cv,
         CAST(ROW_NUMBER() OVER (PARTITION BY sub ORDER BY cent_id) - 1 AS INT) AS code
  FROM pc_{n_iters}
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT x.vec_id, x.sub, b.code,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id, x.sub
                              ORDER BY {_sql_l2m('x.sv', 'b.cv')} ASC, b.cent_id ASC) AS rn
    FROM esub x JOIN book b ON x.sub = b.sub) WHERE rn = 1
)"""
    if query == "book":
        return f"""
WITH {base}
SELECT CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       CAST(cent_id AS BIGINT) AS cent_id,
       CAST(round(1000000 * list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS BIGINT) AS cv_norm_micro
FROM book
"""
    if query == "codes":
        return f"""
WITH {base}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(sub AS BIGINT) AS sub,
       CAST(code AS BIGINT) AS code
FROM codes
"""
    adc = f""",
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {n_q}),
qsub AS (
  SELECT q.q_id, s.sub,
         q.qv[s.sub * sd.subdim + 1 : (s.sub + 1) * sd.subdim] AS qsv
  FROM q, subs s, sd
),
lut AS (
  SELECT qs.q_id, b.sub, b.code, {_sql_l2m('qs.qsv', 'b.cv')} AS d
  FROM qsub qs JOIN book b ON qs.sub = b.sub
),
adist AS (
  SELECT l.q_id, c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adist_micro
  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
  GROUP BY l.q_id, c.vec_id
),
approx AS (
  SELECT q_id, vec_id, adist_micro FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist_micro ASC, vec_id ASC) AS rn
    FROM adist) WHERE rn <= {k}
)"""
    if query == "ivfpq":
        return f"""
WITH {base},
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {n_q}),
qsub AS (
  SELECT q.q_id, s.sub,
         q.qv[s.sub * sd.subdim + 1 : (s.sub + 1) * sd.subdim] AS qsv
  FROM q, subs s, sd
),
lut AS (
  SELECT qs.q_id, b.sub, b.code, {_sql_l2m('qs.qsv', 'b.cv')} AS d
  FROM qsub qs JOIN book b ON qs.sub = b.sub
),
ccents AS (SELECT vec_id AS cent_id, v AS cv FROM e
           WHERE vec_id % (SELECT GREATEST({coarse_mod}, CAST(ceil(COUNT(*) / {max_cells}.0) AS BIGINT)) FROM e) = 0),
cassigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_sql_cos('e.v', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM e, ccents c) WHERE rn = 1
),
cprobes AS (
  SELECT q_id, cent_id FROM (
    SELECT q.q_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
             {_sql_cos('q.qv', 'c.cv')} DESC, c.cent_id ASC) AS rn
    FROM q, ccents c) WHERE rn <= {nprobe}
),
adist AS (
  SELECT p.q_id, c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adist_micro
  FROM codes c
  JOIN cassigned a ON c.vec_id = a.vec_id
  JOIN cprobes p ON a.cent_id = p.cent_id
  JOIN lut l ON c.sub = l.sub AND c.code = l.code AND l.q_id = p.q_id
  GROUP BY p.q_id, c.vec_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id, adist_micro
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist_micro ASC, vec_id ASC) AS rn
  FROM adist) WHERE rn <= {k}
"""
    if query == "ann":
        return f"""
WITH {base}{adc}
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id, adist_micro
FROM approx
"""
    return f"""
WITH {base}{adc},
truth AS (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY {_sql_l2m('e.v', 'q.qv')} ASC, e.vec_id ASC) AS rn
    FROM e, q) WHERE rn <= {k}
),
tn AS (SELECT COUNT(*) AS n_truth FROM truth),
hits AS (
  SELECT COUNT(*) AS n_hit
  FROM approx a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id
)
SELECT 'pq_adc' AS method, CAST(tn.n_truth AS BIGINT) AS n_truth,
       CAST(hits.n_hit AS BIGINT) AS n_hit,
       round(hits.n_hit / tn.n_truth, 4) AS recall
FROM tn, hits
"""


# ---------------------------------------------------------------------------
# True DuckDB twins for the synthetic-corpus queries: independent SQL
# recomputation over the SAME persisted parquet files the Spark queries
# read (fixtures/corpus_seed42/). No frozen VALUES goldens remain.
# ---------------------------------------------------------------------------

def _corpus_oracle_tables() -> str:
    cd = _corpus_dir().replace("'", "''")
    return f"""
c_pages AS (SELECT * FROM read_parquet('{cd}/pages.parquet')),
c_cdx AS (SELECT * FROM read_parquet('{cd}/cdx.parquet')),
c_req AS (SELECT * FROM read_parquet('{cd}/ingest_request.parquet'))
""".strip()


def _mime_sniff_oracle() -> str:
    """Declared-vs-sniffed mime report: both CASE chains are generated
    from the same tables sniff_mime_col/normalize_mime_col compile
    their when-chains from (functions/mime.py), over the same persisted
    corpus parquet. The sniff window is 32 bytes = 64 hex chars."""
    from sandcrawler_spark.functions.mime import (
        normalize_mime_oracle_case,
        sniff_mime_oracle_case,
    )

    sniff = sniff_mime_oracle_case("substring(upper(hex(p.html)), 1, 64)")
    norm = normalize_mime_oracle_case("d.mimetype")
    return f"""
WITH {_corpus_oracle_tables()},
d AS (
  SELECT DISTINCT url, mimetype FROM c_cdx
  WHERE status_code = 200 AND mimetype <> 'warc/revisit'
),
j AS (
  SELECT {norm} AS declared,
         {sniff} AS sniffed
  FROM d JOIN c_pages p USING (url)
)
SELECT declared, sniffed, CAST(COUNT(*) AS BIGINT) AS n_caps,
       CAST(SUM(CASE WHEN COALESCE(declared, '?') <> sniffed THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
FROM j GROUP BY declared, sniffed
"""


def _fetch_statuses_oracle(max_hops: int = 4) -> str:
    """The bounded fetch hop loop (operators/fetch.py) replayed as
    chained per-hop CTEs: per hop, URL gates -> best-capture window ->
    verdict CASE -> html-hop PDF-link lookup -> next state with loop/
    budget checks. clean_url degenerates to 'prefix http:// when
    scheme-less' for this corpus (hosts already lowercase, no ports/
    fragments); the PDF-link extraction degenerates to the
    citation_pdf_url meta (the only PDF pattern the corpus pages carry,
    and the first pattern in the engine's cascade)."""
    gates = (
        "WHEN cur_url LIKE '%://blocked.example.com/%' OR cur_url LIKE '%/domain-squat/%' "
        "THEN 'skip-url-blocklist' "
        "WHEN cur_url LIKE '%/login.htm%' OR cur_url LIKE '%?SAMLRequest=%' THEN 'skip-wall' "
        "WHEN cur_url LIKE '%/cookieAbsent%' OR cur_url LIKE '%cookieSet=1%' THEN 'blocked-cookie' "
    )
    parts = []
    ctes = [
        _corpus_oracle_tables(),
        """
cdx2 AS (
  SELECT url AS canon_url, url AS cap_url, datetime, mimetype, status_code,
         sha1hex, warc_csize, warc_path, redirect_url
  FROM c_cdx
)""",
        """
pdflink AS (
  SELECT p.url AS cap_url, strftime(p.warc_ts, '%Y%m%d%H%M%S') AS datetime,
         NULLIF(regexp_extract(decode(p.html),
                 '<meta name="citation_pdf_url" content="([^"]*)"', 1), '') AS pdf_url
  FROM c_pages p
  JOIN c_cdx x ON x.url = p.url AND x.datetime = strftime(p.warc_ts, '%Y%m%d%H%M%S')
  WHERE x.mimetype = 'text/html'
)""",
        """
state_0 AS (
  SELECT CASE WHEN ingest_type = 'file' THEN 'pdf' ELSE ingest_type END AS ingest_type,
         base_url,
         CASE WHEN base_url NOT LIKE '%://%' THEN 'http://' || base_url ELSE base_url END AS cur_url,
         [CASE WHEN base_url NOT LIKE '%://%' THEN 'http://' || base_url ELSE base_url END] AS hops,
         CASE WHEN (CASE WHEN ingest_type = 'file' THEN 'pdf' ELSE ingest_type END)
                   NOT IN ('pdf', 'html', 'xml') THEN 'wrong-ingest-type' END AS status
  FROM c_req
)""",
    ]
    for k in range(max_hops + 1):
        parts.append(f"SELECT status FROM state_{k} WHERE status IS NOT NULL")
        parts.append(
            f"SELECT CASE {gates} END AS status FROM state_{k} "
            f"WHERE status IS NULL AND CASE {gates} END IS NOT NULL"
        )
        ctes.append(f"""
best_{k} AS (
  SELECT s.*, x.canon_url, x.cap_url, x.datetime, x.mimetype, x.status_code,
         x.sha1hex, x.warc_csize, x.warc_path, x.redirect_url
  FROM (SELECT * FROM state_{k}
        WHERE status IS NULL AND CASE {gates} END IS NULL) s
  LEFT JOIN cdx2 x ON s.cur_url = x.canon_url
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY s.ingest_type, s.base_url, s.cur_url
    ORDER BY CAST(x.status_code IN (200, 226) AS INT) DESC NULLS LAST,
             -COALESCE(x.status_code, 999) DESC NULLS LAST,
             CAST(x.mimetype = (CASE s.ingest_type WHEN 'pdf' THEN 'application/pdf'
                                WHEN 'html' THEN 'text/html' ELSE 'text/xml' END) AS INT) DESC NULLS LAST,
             CAST(x.mimetype <> 'warc/revisit' AS INT) DESC NULLS LAST,
             CAST(x.warc_path LIKE '%/%' AS INT) DESC NULLS LAST,
             x.datetime DESC NULLS LAST) = 1
)""")
        ctes.append(f"""
cls_{k} AS (
  SELECT *, CASE
    WHEN canon_url IS NULL THEN 'no-capture'
    WHEN status_code IN (301, 302, 303, 307, 308) AND redirect_url IS NOT NULL THEN 'redirect'
    WHEN status_code NOT IN (200, 226) THEN 'terminal-bad-status'
    WHEN warc_csize = 0 THEN 'null-body'
    WHEN ingest_type = 'pdf' AND mimetype = 'text/html' THEN 'html-hop'
    WHEN (ingest_type = 'pdf' AND mimetype = 'application/pdf')
      OR (ingest_type = 'html' AND mimetype IN ('text/html', 'application/xhtml+xml'))
      OR (ingest_type = 'xml' AND mimetype IN ('text/xml', 'application/xml', 'application/jats+xml'))
      THEN 'success'
    ELSE 'wrong-mimetype' END AS verdict
  FROM best_{k}
)""")
        parts.append(
            f"SELECT verdict AS status FROM cls_{k} WHERE verdict NOT IN ('redirect', 'html-hop')"
        )
        ctes.append(f"""
hopped_{k} AS (
  SELECT c.ingest_type, c.base_url, c.hops,
         CASE WHEN c.verdict = 'redirect' THEN c.redirect_url ELSE l.pdf_url END AS nxt,
         CASE WHEN c.verdict = 'redirect' THEN 'redirect' ELSE 'html' END AS via
  FROM cls_{k} c
  LEFT JOIN pdflink l ON c.verdict = 'html-hop'
       AND l.cap_url = c.cap_url AND l.datetime = c.datetime
  WHERE c.verdict IN ('redirect', 'html-hop')
)""")
        parts.append(f"SELECT 'no-pdf-link' AS status FROM hopped_{k} WHERE via = 'html' AND nxt IS NULL")
        ctes.append(f"""
state_{k + 1} AS (
  SELECT ingest_type, base_url,
         CASE WHEN nxt NOT LIKE '%://%' THEN 'http://' || nxt ELSE nxt END AS cur_url,
         list_append(hops, CASE WHEN nxt NOT LIKE '%://%' THEN 'http://' || nxt ELSE nxt END) AS hops,
         CASE
           WHEN list_contains(hops, CASE WHEN nxt NOT LIKE '%://%' THEN 'http://' || nxt ELSE nxt END)
                THEN (CASE WHEN via = 'redirect' THEN 'redirect-loop' ELSE 'link-loop' END)
           WHEN len(hops) >= {max_hops}
                THEN (CASE WHEN via = 'redirect' THEN 'redirects-exceeded' ELSE 'max-hops-exceeded' END)
         END AS status
  FROM hopped_{k} WHERE nxt IS NOT NULL
)""")
    parts.append(
        f"SELECT 'max-hops-exceeded' AS status FROM state_{max_hops + 1} WHERE status IS NULL"
    )
    union = "\n  UNION ALL ".join(f"({p})" for p in parts)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM ({union}) GROUP BY status ORDER BY status"
    )


def _extraction_roundtrip_oracle() -> str:
    # n_byte_identical is the north-rule invariant: the engine's
    # re-extraction must equal the pinned text column on EVERY page, so
    # the twin asserts it equals COUNT(*); n_pages and total_words are
    # recomputed from the persisted text (Python str.split() == regexp
    # split on whitespace runs after trimming).
    return f"""
WITH {_corpus_oracle_tables()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(*) AS BIGINT) AS n_byte_identical,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_words
FROM c_pages
"""


def _c4_oracle() -> str:
    # C4 line/page rules replayed by the functions.c4filters twin over
    # the same persisted pages parquet the Spark query reads
    from sandcrawler_spark.functions.c4filters import c4_oracle_sql

    return c4_oracle_sql(
        f"WITH {_corpus_oracle_tables()} "
        "SELECT url, text FROM c_pages WHERE text IS NOT NULL"
    )


def _grobid_hook_oracle() -> str:
    # The grobid/pdftrio stubs derive everything from sha1(body); the
    # corpus build already recorded that hash per capture in cdx.sha1hex
    # (computed by hashlib at fixture-build time, not by the engine), so
    # the twin replays the stub arithmetic from the hex digits alone.
    return f"""
WITH {_corpus_oracle_tables()},
pdfs AS (
  SELECT DISTINCT p.url, x.sha1hex, x.mimetype
  FROM c_pages p JOIN c_cdx x ON x.url = p.url
  WHERE p.url LIKE '%.pdf'
)
SELECT url,
       CASE WHEN mimetype = 'application/pdf' THEN 'success' ELSE 'error' END AS grobid_status,
       CASE WHEN mimetype = 'application/pdf' THEN '10.1234/' || substr(sha1hex, 1, 6) END AS doi,
       CASE WHEN mimetype = 'application/pdf' THEN 'Synthetic document ' || substr(sha1hex, 1, 8) END AS title,
       CASE WHEN mimetype = 'application/pdf'
            THEN ROUND(CAST(('0x' || substr(sha1hex, 1, 2))::INT AS DOUBLE) / 255.0, 6) END AS ensemble_score
FROM pdfs ORDER BY url
"""


def _revisit_resolution_oracle() -> str:
    # resolve_revisits (operators/sinks.py): originals pass through
    # resolved-to-themselves; warc/revisit rows resolve via the earliest
    # non-revisit capture of the same sha1hex.
    return f"""
WITH {_corpus_oracle_tables()},
rv AS (SELECT *, COALESCE(mimetype = 'warc/revisit', FALSE) AS is_rv FROM c_cdx),
best_orig AS (
  SELECT sha1hex, warc_path AS orig_warc_path
  FROM rv WHERE NOT is_rv
  QUALIFY ROW_NUMBER() OVER (PARTITION BY sha1hex ORDER BY datetime, warc_path) = 1
),
resolved AS (
  SELECT r.is_rv, CASE WHEN r.is_rv THEN b.orig_warc_path ELSE r.warc_path END AS orig_warc_path
  FROM rv r LEFT JOIN best_orig b ON r.is_rv AND r.sha1hex = b.sha1hex
)
SELECT is_rv AS is_revisit, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN orig_warc_path IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_resolved
FROM resolved GROUP BY is_rv
"""


# --- link-graph oracle CTEs: the edge set recomputed RELATIONALLY
# (independent of the Spark path's html -> regexp extraction) ---

_ANCHOR_EDGES_CTE = """
anchor_edges AS (
  SELECT url AS src_url,
         'https://site' || CAST(site_id AS VARCHAR) || '.example.com/about' AS dst_url,
         'about' AS anchor_text
  FROM urls
  UNION ALL
  SELECT u.url,
         'https://site' || CAST(CAST(li.l_partkey % 50 AS INT) AS VARCHAR) || '.example.com/part/' || CAST(li.l_partkey AS VARCHAR),
         (CASE WHEN li.l_orderkey % 3 = 0 THEN 'item ' ELSE 'part ' END) || CAST(li.l_partkey AS VARCHAR)
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
  JOIN urls u ON u.o_orderkey = li.l_orderkey
  UNION ALL
  SELECT 'https://site' || CAST(CAST(l_partkey % 50 AS INT) AS VARCHAR) || '.example.com/part/' || CAST(l_partkey AS VARCHAR),
         'https://site' || CAST(CAST(l_suppkey % 50 AS INT) AS VARCHAR) || '.example.com/supplier/' || CAST(l_suppkey AS VARCHAR),
         'supplier ' || CAST(l_suppkey AS VARCHAR)
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
  UNION ALL
  SELECT 'https://site' || CAST(CAST(s_suppkey % 50 AS INT) AS VARCHAR) || '.example.com/supplier/' || CAST(s_suppkey AS VARCHAR),
         'https://nation' || CAST(s_nationkey AS VARCHAR) || '.example.org/nation/' || CAST(s_nationkey AS VARCHAR),
         'nation ' || CAST(s_nationkey AS VARCHAR)
  FROM supplier
  UNION ALL
  SELECT 'https://nation' || CAST(n_nationkey AS VARCHAR) || '.example.org/nation/' || CAST(n_nationkey AS VARCHAR),
         'https://region' || CAST(n_regionkey AS VARCHAR) || '.example.org/region/' || CAST(n_regionkey AS VARCHAR),
         'region ' || CAST(n_regionkey AS VARCHAR)
  FROM nation
)
"""

_LINK_EDGES_CTE = """
link_edges AS (
  SELECT url AS src_url,
         'https://site' || CAST(site_id AS VARCHAR) || '.example.com/about' AS dst_url
  FROM urls
  UNION
  SELECT u.url AS src_url,
         'https://site' || CAST(CAST(li.l_partkey % 50 AS INT) AS VARCHAR) || '.example.com/part/' || CAST(li.l_partkey AS VARCHAR) AS dst_url
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
  JOIN urls u ON u.o_orderkey = li.l_orderkey
  UNION
  SELECT 'https://site' || CAST(CAST(l_partkey % 50 AS INT) AS VARCHAR) || '.example.com/part/' || CAST(l_partkey AS VARCHAR) AS src_url,
         'https://site' || CAST(CAST(l_suppkey % 50 AS INT) AS VARCHAR) || '.example.com/supplier/' || CAST(l_suppkey AS VARCHAR) AS dst_url
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
  UNION
  SELECT 'https://site' || CAST(CAST(s_suppkey % 50 AS INT) AS VARCHAR) || '.example.com/supplier/' || CAST(s_suppkey AS VARCHAR) AS src_url,
         'https://nation' || CAST(s_nationkey AS VARCHAR) || '.example.org/nation/' || CAST(s_nationkey AS VARCHAR) AS dst_url
  FROM supplier
  UNION
  SELECT 'https://nation' || CAST(n_nationkey AS VARCHAR) || '.example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS src_url,
         'https://region' || CAST(n_regionkey AS VARCHAR) || '.example.org/region/' || CAST(n_regionkey AS VARCHAR) AS dst_url
  FROM nation
)
"""


def _bfs_oracle_ctes(max_depth: int = 4) -> str:
    """Unrolled BFS rounds: bfs{d} = labels after round d."""
    parts = ["bfs0 AS (SELECT url, 0 AS depth FROM urls WHERE priority >= 5)"]
    for d in range(1, max_depth + 1):
        parts.append(f"""bfs{d} AS (
  SELECT url, depth FROM bfs{d - 1}
  UNION ALL
  SELECT DISTINCT e.dst_url AS url, {d} AS depth
  FROM link_edges e JOIN bfs{d - 1} f ON e.src_url = f.url AND f.depth = {d - 1}
  WHERE e.dst_url NOT IN (SELECT url FROM bfs{d - 1})
)""")
    return ",\n".join(parts)


def _hyperball_oracle_ctes(n_iter: int = 3, p: int = 8) -> str:
    """Unrolled HyperBall twin: per-host HLL register tables iterated
    along the host graph — identical md5/rank/harmonic-sum arithmetic
    to operators/sketches.py (same constants as hll_oracle_sql), with
    the same precomputed linear-counting table the Spark side embeds
    for the small-range correction."""
    from sandcrawler_spark.operators.hyperball import _lc_table
    from sandcrawler_spark.operators.sketches import RHO_CAP, _alpha

    m = 1 << p
    est_const = repr(_alpha(m) * m * m * float(1 << RHO_CAP))
    lc_vals = ", ".join(
        f"({z}, {v!r})" for z, v in enumerate(_lc_table(m), start=1)
    )
    parts = [
        """hbedges AS (
  SELECT DISTINCT src_host AS f, dst_host AS t FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
)""",
        "hbnodes AS (SELECT f AS host FROM hbedges UNION SELECT t FROM hbedges)",
        f"""hbregs0 AS (
  SELECT host, h % {m} AS bkt,
         CASE WHEN h // {m} = 0 THEN {RHO_CAP}
              ELSE LEAST(bit_count(((h // {m}) & (-(h // {m}))) - 1) + 1, {RHO_CAP})
         END AS mreg
  FROM (SELECT host, CAST('0x' || substr(md5(host), 1, 15) AS BIGINT) AS h FROM hbnodes)
)""",
        f"hblc(z, lc) AS (SELECT * FROM (VALUES {lc_vals}))",
    ]
    for t in range(1, n_iter + 1):
        parts.append(f"""hbregs{t} AS (
  SELECT host, bkt, MAX(mreg) AS mreg FROM (
    SELECT host, bkt, mreg FROM hbregs{t - 1}
    UNION ALL
    SELECT e.t AS host, p.bkt, p.mreg
    FROM hbedges e JOIN hbregs{t - 1} p ON p.host = e.f
  ) GROUP BY host, bkt
)""")
    for t in range(n_iter + 1):
        parts.append(f"""hbest{t} AS (
  SELECT host,
         CASE WHEN zeros > 0 AND raw <= {2.5 * m!r}
              THEN (SELECT lc FROM hblc WHERE z = greatest(zeros, 1))
              ELSE ROUND(raw, 2) END AS ball_{t}
  FROM (
    SELECT host,
           CAST({m} - COUNT(*) AS INT) AS zeros,
           {est_const} / (SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - mreg))
             + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {RHO_CAP})) AS raw
    FROM hbregs{t} GROUP BY host
  )
)""")
    return ",\n".join(parts)


def _pagerank_oracle_ctes(
    n_iter: int = 5,
    num: int = 17,
    den: int = 20,
    tag: str = "",
    edges_src: str = "link_edges",
    init_ranks_cte: str | None = None,
) -> str:
    """Unrolled fixed-point PageRank (PR_SCALE = 1e12, floor division)
    — replays operators/linkgraph.host_pagerank integer-for-integer.

    tag: suffix for every CTE name (lets one oracle chain two phases);
    edges_src: URL-edge relation to contract into the host graph;
    init_ranks_cte: warm-start ranks (host, rank) — replays
    incremental_pagerank's init (missing hosts -> uniform prior)."""
    scale = 1_000_000_000_000
    H, P, N, O, E = (f"hedges{tag}", f"prhosts{tag}", f"prn{tag}",
                     f"outw{tag}", f"ew{tag}")
    pr = lambda i: f"pr{tag}{i}"  # noqa: E731
    dang = lambda i: f"dang{tag}{i}"  # noqa: E731
    parts = [
        f"""{H} AS MATERIALIZED (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM {edges_src})
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
)""",
        f"{P} AS (SELECT src_host AS host FROM {H} UNION SELECT dst_host FROM {H})",
        f"{N} AS (SELECT COUNT(*) AS n FROM {P})",
        f"{O} AS (SELECT src_host, CAST(SUM(weight) AS BIGINT) AS outw FROM {H} GROUP BY src_host)",
        f"{E} AS (SELECT e.src_host, e.dst_host, e.weight, w.outw FROM {H} e JOIN {O} w USING (src_host))",
    ]
    if init_ranks_cte is None:
        parts.append(
            f"{pr(0)} AS (SELECT host, CAST({scale} // (SELECT n FROM {N}) AS BIGINT) AS rank FROM {P})"
        )
    else:
        parts.append(f"""{pr(0)} AS (
  SELECT p.host,
         CAST(COALESCE(r.rank, {scale} // (SELECT n FROM {N})) AS BIGINT) AS rank
  FROM {P} p LEFT JOIN {init_ranks_cte} r USING (host)
)""")
    for i in range(n_iter):
        parts.append(
            f"{dang(i)} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS d FROM {pr(i)} "
            f"WHERE host NOT IN (SELECT src_host FROM {O}))"
        )
        parts.append(f"""{pr(i + 1)} AS MATERIALIZED (
  SELECT p.host,
         CAST(({scale} * {den - num}) // ({den} * (SELECT n FROM {N}))
           + COALESCE((SELECT SUM((r.rank * {num} * e.weight) // ({den} * e.outw))
                       FROM {E} e JOIN {pr(i)} r ON e.src_host = r.host
                       WHERE e.dst_host = p.host), 0)
           + ({num} * (SELECT d FROM {dang(i)})) // ({den} * (SELECT n FROM {N})) AS BIGINT) AS rank
  FROM {P} p
)""")
    return ",\n".join(parts)


def _opic_oracle_ctes(n_iter: int = 5) -> str:
    """Unrolled batch-synchronous OPIC — replays
    operators/linkgraph.opic_scores integer-for-integer: per round,
    every host spends all its cash (edge-weighted if linking,
    uniformly if dangling) and banks the spend into history."""
    scale = 1_000_000_000_000
    parts = [
        """ophe AS MATERIALIZED (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
)""",
        "opp AS (SELECT src_host AS host FROM ophe UNION SELECT dst_host FROM ophe)",
        "opn AS (SELECT COUNT(*) AS n FROM opp)",
        "opo AS (SELECT src_host, CAST(SUM(weight) AS BIGINT) AS outw FROM ophe GROUP BY src_host)",
        "ope AS (SELECT e.src_host, e.dst_host, e.weight, w.outw FROM ophe e JOIN opo w USING (src_host))",
        f"opst0 AS (SELECT host, CAST({scale} // (SELECT n FROM opn) AS BIGINT) AS cash, CAST(0 AS BIGINT) AS hist FROM opp)",
    ]
    for i in range(n_iter):
        parts.append(
            f"opdang{i} AS MATERIALIZED (SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS d FROM opst{i} "
            f"WHERE host NOT IN (SELECT src_host FROM opo))"
        )
        parts.append(f"""opst{i + 1} AS MATERIALIZED (
  SELECT t.host,
         CAST(COALESCE((SELECT CAST(SUM((s.cash * e.weight) // e.outw) AS BIGINT)
                        FROM ope e JOIN opst{i} s ON e.src_host = s.host
                        WHERE e.dst_host = t.host), 0)
              + (SELECT d FROM opdang{i}) // (SELECT n FROM opn) AS BIGINT) AS cash,
         CAST(t.hist + t.cash AS BIGINT) AS hist
  FROM opst{i} t
)""")
    parts.append(
        f"optot AS (SELECT CAST(SUM(cash + hist) AS BIGINT) AS tot FROM opst{n_iter})"
    )
    return ",\n".join(parts)


def _trustrank_oracle_ctes(
    n_iter: int = 5,
    num: int = 17,
    den: int = 20,
    trust_pred: str = "host LIKE '%.example.org'",
) -> str:
    """Unrolled TrustRank twin (operators/linkgraph.trust_rank):
    teleport + dangling mass restricted to the trust seed set."""
    scale = 1_000_000_000_000
    parts = [
        """tredges AS MATERIALIZED (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
)""",
        "trhosts AS (SELECT src_host AS host FROM tredges UNION SELECT dst_host FROM tredges)",
        f"trseed AS (SELECT host FROM trhosts WHERE {trust_pred})",
        "trnt AS (SELECT COUNT(*) AS nt FROM trseed)",
        "troutw AS (SELECT src_host, CAST(SUM(weight) AS BIGINT) AS outw FROM tredges GROUP BY src_host)",
        "trew AS (SELECT e.src_host, e.dst_host, e.weight, w.outw FROM tredges e JOIN troutw w USING (src_host))",
        f"""trpr0 AS (
  SELECT p.host,
         CAST(CASE WHEN s.host IS NOT NULL THEN {scale} // (SELECT nt FROM trnt)
                   ELSE 0 END AS BIGINT) AS rank
  FROM trhosts p LEFT JOIN trseed s ON p.host = s.host
)""",
    ]
    for i in range(n_iter):
        parts.append(
            f"trdang{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS d FROM trpr{i} "
            f"WHERE host NOT IN (SELECT src_host FROM troutw))"
        )
        parts.append(f"""trpr{i + 1} AS MATERIALIZED (
  SELECT p.host,
         CAST(CASE WHEN s.host IS NOT NULL
               THEN ({scale} * {den - num}) // ({den} * (SELECT nt FROM trnt))
                    + ({num} * (SELECT d FROM trdang{i})) // ({den} * (SELECT nt FROM trnt))
               ELSE 0 END
           + COALESCE((SELECT SUM((r.rank * {num} * e.weight) // ({den} * e.outw))
                       FROM trew e JOIN trpr{i} r ON e.src_host = r.host
                       WHERE e.dst_host = p.host), 0) AS BIGINT) AS rank
  FROM trhosts p LEFT JOIN trseed s ON p.host = s.host
)""")
    return ",\n".join(parts)


def _pca_oracle_ctes(n_iter: int = 5) -> str:
    """Unrolled integer power-iteration twin (operators/pca.py):
    milli-rounded components, sums-identity covariance with
    truncating `//` by n², L∞-renormalized mat-vec rounds, leading-
    component sign fix."""
    parts = [
        """pcc AS (
  SELECT vec_id, embedding,
         UNNEST(generate_series(CAST(1 AS BIGINT), CAST(len(embedding) AS BIGINT))) AS ii
  FROM embeddings
)""",
        """pccm AS MATERIALIZED (
  SELECT vec_id, CAST(ii - 1 AS INT) AS i,
         CAST(round(CAST(embedding[CAST(ii AS INT)] AS DOUBLE) * 1000) AS BIGINT) AS x
  FROM pcc
)""",
        "pcn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)",
        """pccov AS MATERIALIZED (
  SELECT a.i, b.i AS j,
         CAST(((SELECT n FROM pcn) * CAST(SUM(a.x * b.x) AS BIGINT)
               - CAST(SUM(a.x) AS BIGINT) * CAST(SUM(b.x) AS BIGINT))
              // ((SELECT n FROM pcn) * (SELECT n FROM pcn)) AS BIGINT) AS cov
  FROM pccm a JOIN pccm b USING (vec_id)
  GROUP BY a.i, b.i
)""",
        "pv0 AS (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS val FROM pccov)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"pw{t} AS MATERIALIZED (SELECT c.i, CAST(SUM(c.cov * v.val) AS BIGINT) AS w "
            f"FROM pccov c JOIN pv{t - 1} v ON c.j = v.i GROUP BY c.i)"
        )
        parts.append(
            f"pm{t} AS (SELECT greatest(CAST(MAX(ABS(w)) AS BIGINT), 1) AS m FROM pw{t})"
        )
        parts.append(
            f"pv{t} AS MATERIALIZED (SELECT i, CAST((w * 1000) // (SELECT m FROM pm{t}) AS BIGINT) AS val FROM pw{t})"
        )
    parts.append(f"pcmax AS (SELECT MAX(ABS(val)) AS m FROM pv{n_iter})")
    parts.append(
        f"pclead AS (SELECT MIN(i) AS li FROM pv{n_iter} "
        f"WHERE ABS(val) = (SELECT m FROM pcmax))"
    )
    parts.append(
        f"pcsign AS (SELECT CASE WHEN (SELECT val FROM pv{n_iter} "
        f"WHERE i = (SELECT li FROM pclead)) < 0 THEN -1 ELSE 1 END AS s)"
    )
    return ",\n".join(parts)


def _seedcover_oracle_ctes(k: int = 4) -> tuple[str, str]:
    """Unrolled greedy max-coverage twin (operators/linkgraph.
    seed_cover): per round, argmax-uncovered-targets pick (min-host
    tiebreak) then covered-set union."""
    parts = [
        """sce AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
)""",
        "sccov0 AS (SELECT CAST(NULL AS VARCHAR) AS dst_host WHERE 1 = 0)",
    ]
    for r in range(1, k + 1):
        parts.append(f"""scpick{r} AS MATERIALIZED (
  SELECT src_host, CAST(COUNT(*) AS BIGINT) AS gain
  FROM sce WHERE dst_host NOT IN (SELECT dst_host FROM sccov{r - 1})
  GROUP BY src_host ORDER BY gain DESC, src_host ASC LIMIT 1
)""")
        parts.append(f"""sccov{r} AS MATERIALIZED (
  SELECT dst_host FROM sccov{r - 1}
  UNION
  SELECT e.dst_host FROM sce e JOIN scpick{r} p USING (src_host)
)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT {r} AS "round", src_host AS host, gain,'
        f" CAST((SELECT COUNT(*) FROM sccov{r}) AS BIGINT) AS covered_total"
        f" FROM scpick{r}"
        for r in range(1, k + 1)
    )
    return ",\n".join(parts), sel


def _bowtie_oracle_ctes(max_rounds: int = 8) -> str:
    """Unrolled bow-tie twin (operators/linkgraph.bowtie_classes):
    max-degree pivot (min-host tiebreak), bounded forward/backward
    reach over the distinct host edges, CORE/IN/OUT/OTHER labels."""
    # every iterated CTE is MATERIALIZED: btf{i} is referenced twice
    # (union + join) per round, and DuckDB re-inlines plain CTEs
    # exponentially (the bpe_merges lesson)
    parts = [
        """btedges AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
)""",
        """btdeg AS MATERIALIZED (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT src_host AS host FROM btedges
    UNION ALL SELECT dst_host FROM btedges
  ) GROUP BY host
)""",
        "btpivot AS (SELECT host FROM btdeg ORDER BY deg DESC, host ASC LIMIT 1)",
        "btf0 AS (SELECT host FROM btpivot)",
        "btb0 AS (SELECT host FROM btpivot)",
    ]
    for i in range(1, max_rounds + 1):
        parts.append(
            f"btf{i} AS MATERIALIZED (SELECT host FROM btf{i - 1} UNION "
            f"SELECT e.dst_host FROM btedges e JOIN btf{i - 1} r ON e.src_host = r.host)"
        )
        parts.append(
            f"btb{i} AS MATERIALIZED (SELECT host FROM btb{i - 1} UNION "
            f"SELECT e.src_host FROM btedges e JOIN btb{i - 1} r ON e.dst_host = r.host)"
        )
    parts.append(f"""btcls AS (
  SELECT d.host,
         CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'CORE'
              WHEN b.host IS NOT NULL THEN 'IN'
              WHEN f.host IS NOT NULL THEN 'OUT'
              ELSE 'OTHER' END AS cls
  FROM btdeg d
  LEFT JOIN btf{max_rounds} f ON d.host = f.host
  LEFT JOIN btb{max_rounds} b ON d.host = b.host
)""")
    return ",\n".join(parts)


# boilerplate mine/strip twin base: replays _bp_docs's planted
# template, the position-preserving non-blank line explode, the
# distinct-doc line frequency, and the integer 50%-of-docs cut
_BP_ORACLE_BASE = """
WITH bp_docs AS (
  SELECT source AS host, CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN doc_id % 5 <> 0
              THEN 'Top stories from ' || source || chr(10) ||
                   'Subscribe to ' || source || ' premium' || chr(10)
              ELSE '' END
         || text || chr(10) || '(c) 2024 ' || source || ' media' AS text
  FROM documents
),
split AS (SELECT host, doc_id, string_split(text, chr(10)) AS parts FROM bp_docs),
pos_lines AS (
  SELECT host, doc_id, CAST(UNNEST(range(1, len(parts) + 1)) AS INT) - 1 AS pos, parts
  FROM split
),
lines AS (
  SELECT host, doc_id, pos, list_extract(parts, pos + 1) AS line
  FROM pos_lines WHERE trim(list_extract(parts, pos + 1)) <> ''
),
dfl AS (
  SELECT host, line, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM (SELECT DISTINCT host, doc_id, line FROM lines) GROUP BY host, line
),
hd AS (
  SELECT source AS host, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS host_docs
  FROM documents GROUP BY source
),
bp AS (
  SELECT d.host, d.line, d.n_docs, h.host_docs
  FROM dfl d JOIN hd h USING (host)
  WHERE h.host_docs >= 3 AND d.n_docs * 100 >= 50 * h.host_docs
)
"""


def _hits_oracle_ctes(n_iter: int = 3) -> str:
    """Unrolled fixed-point HITS twin of operators/linkgraph.host_hits:
    per half-step the total contribution mass T is an exact HUGEINT
    sum, the scale factor s = GREATEST(1, T // HITS_SCALE), and every
    per-edge contribution floor-divides by s before the per-host SUM —
    term-for-term the Spark integer arithmetic. Iteration CTEs are
    MATERIALIZED: plain CTEs get exponentially re-inlined through the
    6-level half-step chain (the BPE-oracle lesson)."""
    scale = 1_000_000_000
    parts = [
        """hhedges AS MATERIALIZED (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
)""",
        "hhhosts AS MATERIALIZED (SELECT src_host AS host FROM hhedges UNION SELECT dst_host FROM hhedges)",
        "hhn AS (SELECT COUNT(*) AS n FROM hhhosts)",
        f"hh0 AS MATERIALIZED (SELECT host, CAST({scale} // (SELECT n FROM hhn) AS BIGINT) AS hub FROM hhhosts)",
    ]
    for i in range(n_iter):
        parts.append(
            f"hhta{i} AS MATERIALIZED (SELECT COALESCE(SUM(CAST(h.hub * e.weight AS HUGEINT)), 0) AS t "
            f"FROM hhedges e JOIN hh{i} h ON e.src_host = h.host)"
        )
        parts.append(
            f"hhsa{i} AS (SELECT GREATEST(CAST(1 AS HUGEINT), (SELECT t FROM hhta{i}) // {scale}) AS s)"
        )
        parts.append(f"""hha{i + 1} AS MATERIALIZED (
  SELECT p.host,
         CAST(COALESCE((SELECT SUM((h.hub * e.weight) // (SELECT s FROM hhsa{i}))
                        FROM hhedges e JOIN hh{i} h ON e.src_host = h.host
                        WHERE e.dst_host = p.host), 0) AS BIGINT) AS authority
  FROM hhhosts p
)""")
        parts.append(
            f"hhtb{i} AS MATERIALIZED (SELECT COALESCE(SUM(CAST(a.authority * e.weight AS HUGEINT)), 0) AS t "
            f"FROM hhedges e JOIN hha{i + 1} a ON e.dst_host = a.host)"
        )
        parts.append(
            f"hhsh{i} AS (SELECT GREATEST(CAST(1 AS HUGEINT), (SELECT t FROM hhtb{i}) // {scale}) AS s)"
        )
        parts.append(f"""hh{i + 1} AS MATERIALIZED (
  SELECT p.host,
         CAST(COALESCE((SELECT SUM((a.authority * e.weight) // (SELECT s FROM hhsh{i}))
                        FROM hhedges e JOIN hha{i + 1} a ON e.dst_host = a.host
                        WHERE e.src_host = p.host), 0) AS BIGINT) AS hub
  FROM hhhosts p
)""")
    return ",\n".join(parts)


def _kcore_oracle_ctes(k: int = 3, max_rounds: int = 8) -> str:
    """Unrolled synchronous k-core peeling twin of host_kcore: round i
    recomputes in-survivor degrees over round i-1's node set and keeps
    >= k. The Spark side's early stop lands on the same fixed point the
    full unroll reaches."""
    parts = [
        """kcedges AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
)""",
        "kcsym AS MATERIALIZED (SELECT a, b FROM kcedges UNION ALL SELECT b AS a, a AS b FROM kcedges)",
        "kcn0 AS MATERIALIZED (SELECT a AS host FROM kcedges UNION SELECT b FROM kcedges)",
    ]
    for i in range(1, max_rounds + 1):
        parts.append(f"""kcn{i} AS MATERIALIZED (
  SELECT a AS host, CAST(COUNT(*) AS BIGINT) AS core_degree
  FROM kcsym
  WHERE a IN (SELECT host FROM kcn{i - 1}) AND b IN (SELECT host FROM kcn{i - 1})
  GROUP BY a HAVING COUNT(*) >= {k}
)""")
    return ",\n".join(parts)


def _ktruss_oracle_ctes(k: int = 3, max_rounds: int = 6) -> str:
    """Unrolled synchronous k-truss peeling twin of host_ktruss: round
    i enumerates each triangle of round i-1's edge set once (at its
    smallest vertex — edges are stored a<b), explodes it into its 3
    edges, counts per-edge support, and keeps support >= k-2. The
    Spark side's early stop lands on the same fixed point."""
    parts = [
        """kte0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
)""",
    ]
    for i in range(1, max_rounds + 1):
        parts.append(f"""ktt{i} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM kte{i - 1} e1
  JOIN kte{i - 1} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN kte{i - 1} e3 ON e3.a = e1.b AND e3.b = e2.b
)""")
        parts.append(f"""kts{i} AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
    SELECT x AS a, y AS b FROM ktt{i}
    UNION ALL SELECT x AS a, z AS b FROM ktt{i}
    UNION ALL SELECT y AS a, z AS b FROM ktt{i}
  ) GROUP BY a, b
)""")
        parts.append(f"""kte{i} AS MATERIALIZED (
  SELECT e.a, e.b, COALESCE(s.support, 0) AS support
  FROM kte{i - 1} e LEFT JOIN kts{i} s ON s.a = e.a AND s.b = e.b
  WHERE COALESCE(s.support, 0) >= {k - 2}
)""")
    return ",\n".join(parts)


def _lpa_oracle_ctes(n_rounds: int = 3) -> str:
    """Unrolled synchronous weighted LPA twin of host_lpa: symmetrize
    the host contraction, then per round vote = SUM(weight) per
    (host, neighbor label), winner by (score DESC, label ASC)."""
    parts = [
        """lpah AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
)""",
        """lpasym AS MATERIALIZED (
  SELECT src_host, dst_host, CAST(SUM(weight) AS BIGINT) AS weight FROM (
    SELECT src_host, dst_host, weight FROM lpah
    UNION ALL
    SELECT dst_host AS src_host, src_host AS dst_host, weight FROM lpah
  ) GROUP BY src_host, dst_host
)""",
        "lpa0 AS (SELECT DISTINCT src_host AS host, src_host AS label FROM lpasym)",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""lpa{r} AS MATERIALIZED (
  SELECT host, label FROM (
    SELECT e.src_host AS host, l.label,
           ROW_NUMBER() OVER (
             PARTITION BY e.src_host
             ORDER BY SUM(e.weight) DESC, l.label ASC) AS rn
    FROM lpasym e JOIN lpa{r - 1} l ON e.dst_host = l.host
    GROUP BY e.src_host, l.label
  ) WHERE rn = 1
)""")
    return ",\n".join(parts)


def _nfc_oracle() -> str:
    """DuckDB's nfc_normalize and python's unicodedata both implement
    Unicode standard annex #15 — a true cross-engine twin. The
    decomposed/composed prefixes are built from explicit escapes so
    no editor/tooling silently re-composes them."""
    dec = "cafe\u0301 naive\u0308 "
    com = "caf\u00e9 naiv\u00eb "
    return f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE CAST(doc_id % 3 AS INT)
      WHEN 1 THEN '{dec}' || text
      WHEN 2 THEN '{com}' || text
      ELSE text
    END AS raw
  FROM documents
)
SELECT doc_id,
       nfc_normalize(raw) AS normalized,
       nfc_normalize(raw) <> raw AS changed,
       md5(nfc_normalize(raw)) AS norm_md5
FROM f
"""


def _mojibake_oracle() -> str:
    """The corrupted forms are literal strings derived by the SAME
    mojibake_py the engine's make_mojibake_col twins (the doc text is
    ASCII, which mojibake passes through, so only the injected
    non-ASCII fragments corrupt); the repair's expected output is the
    clean text itself — a true round-trip check."""
    from sandcrawler_spark.functions.encoding import mojibake_py

    b0p = mojibake_py("café ")
    b0s = mojibake_py(" — déjà vu €9")
    b3p = mojibake_py("naïve ")
    return f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'café ' || text || ' — déjà vu €9'
      WHEN 1 THEN text
      WHEN 2 THEN 'real € stays: ' || text
      ELSE 'naïve ' || text
    END AS clean,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '{b0p}' || text || '{b0s}'
      WHEN 1 THEN text
      WHEN 2 THEN 'real € stays: ' || text
      ELSE '{b3p}' || text
    END AS broken
  FROM documents
)
SELECT doc_id, broken, clean AS fixed, clean = clean AS recovered FROM f
"""


def _psl_oracle() -> str:
    """publicsuffix.org longest-match replayed relationally: the rule
    set is the SAME module-constant list (functions/psl.py) rendered
    as literal (key, labels, is_wild, is_exc, tail) rows; exception
    beats all, else longest rule, else the implicit '*'."""
    from sandcrawler_spark.functions.psl import psl_rules_sql_values

    return f"""
WITH hosts AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
    CASE CAST(o_orderkey % 8 AS INT)
      WHEN 0 THEN 'shop' || CAST(o_orderkey AS VARCHAR) || '.example.com'
      WHEN 1 THEN 'news' || CAST(o_orderkey AS VARCHAR) || '.bbc.co.uk'
      WHEN 2 THEN 'u' || CAST(o_orderkey AS VARCHAR) || '.github.io'
      WHEN 3 THEN 'api' || CAST(o_orderkey AS VARCHAR) || '.company.com.au'
      WHEN 4 THEN 'w' || CAST(o_orderkey AS VARCHAR) || '.site.ck'
      WHEN 5 THEN 'www.ck'
      WHEN 6 THEN 'node' || CAST(o_orderkey AS VARCHAR) || '.compute.amazonaws.com'
      ELSE 'intranet' || CAST(o_orderkey AS VARCHAR) || '.unknowntld'
    END AS host
  FROM orders
),
parts AS (
  SELECT o_orderkey, host, string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n
  FROM hosts
),
rules(key, labels, is_wild, is_exc, tail) AS (VALUES
  {psl_rules_sql_values()}
),
cands AS (
  SELECT p.o_orderkey, CAST(t.i AS INT) AS i,
         array_to_string(list_slice(p.labels, p.n - CAST(t.i AS INT) + 1, p.n), '.') AS suffix
  FROM parts p, range(1, 6) t(i)
  WHERE CAST(t.i AS INT) <= p.n
),
matched AS (
  SELECT c.o_orderkey,
         MAX(CASE WHEN r.is_exc THEN r.labels - 1 END) AS exc_len,
         MAX(CASE WHEN NOT r.is_exc THEN r.labels END) AS plain_len
  FROM cands c JOIN rules r
    ON (NOT r.is_wild AND c.suffix = r.key AND c.i = r.labels)
    OR (r.is_wild AND c.i = r.labels AND c.suffix LIKE '%.' || r.tail)
  GROUP BY c.o_orderkey
),
resolved AS (
  SELECT p.o_orderkey, p.host, p.labels, p.n,
         CAST(COALESCE(m.exc_len, m.plain_len, 1) AS INT) AS ps
  FROM parts p LEFT JOIN matched m ON p.o_orderkey = m.o_orderkey
)
SELECT o_orderkey, host,
  -- empty label = invalid host -> NULLs (official checkPublicSuffix
  -- semantics; same guard as the Spark/py tiers)
  CASE WHEN NOT list_contains(labels, '')
       THEN array_to_string(list_slice(labels, n - ps + 1, n), '.') END AS public_suffix,
  CASE WHEN NOT list_contains(labels, '') AND n > ps
       THEN array_to_string(list_slice(labels, n - ps, n), '.') END AS registered_domain
FROM resolved
"""


def _soft404_oracle() -> str:
    from sandcrawler_spark.functions.soft404 import BODY_RX, TINY_BODY_CHARS, TITLE_RX

    return f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(CASE WHEN doc_id % 7 = 2 THEN 404
              WHEN doc_id % 7 = 5 THEN 500 ELSE 200 END AS INT) AS status,
    CASE WHEN doc_id % 7 = 0 THEN '404 Page Not Found'
         WHEN doc_id % 7 = 3 THEN 'Understanding Error 404 Handling #' || CAST(doc_id AS VARCHAR)
         ELSE 'Document ' || CAST(doc_id AS VARCHAR) END AS title,
    CASE WHEN doc_id % 7 = 1 THEN 'Sorry, the page you requested was not found on this server.'
         WHEN doc_id % 7 = 4 THEN 'This article does not exist anymore.'
         WHEN doc_id % 7 = 3 THEN text || ' A misconfigured server returns error 404 pages for valid URLs.'
         ELSE text END AS body
  FROM documents
),
verdicts AS (
  SELECT doc_id, status,
    CASE WHEN status <> 200 THEN CAST(NULL AS VARCHAR)
         WHEN regexp_matches(lower(coalesce(title, '')), '{TITLE_RX}') THEN 'soft404:title'
         WHEN regexp_matches(lower(coalesce(body, '')), '{BODY_RX}')
              AND length(lower(coalesce(body, ''))) < {TINY_BODY_CHARS}
           THEN 'soft404:tiny-error-body'
    END AS reason
  FROM f
)
SELECT doc_id, status, reason, reason IS NOT NULL AS is_soft404 FROM verdicts
"""


def oracle_sql() -> dict[str, str]:
    from sandcrawler_spark.functions.textstats import EN_STOPWORDS
    from sandcrawler_spark.operators.bpe import bpe_apply_oracle_sql, bpe_oracle_sql
    from sandcrawler_spark.operators.bandit import ucb_oracle_sql
    from sandcrawler_spark.operators.pq import sq_oracle_sql
    from sandcrawler_spark.operators.sharding import (
        reshard_oracle_sql,
        ring_balance_oracle_sql,
    )
    from sandcrawler_spark.operators.budget import budget_oracle_sql, gini_oracle_sql
    from sandcrawler_spark.operators.dsir import dsir_oracle_sql
    from sandcrawler_spark.functions.memento import timemap_oracle_sql
    from sandcrawler_spark.functions.sentences import sentence_stats_oracle_sql
    from sandcrawler_spark.operators.diagnostics import wilson_rollup_oracle_sql
    from sandcrawler_spark.operators.lm import kn_oracle_sql, lm_oracle_sql, sb_oracle_sql
    from sandcrawler_spark.operators.quality_clf import nb_oracle_sql
    from sandcrawler_spark.operators.search import bm25_oracle_sql
    from sandcrawler_spark.operators.textrank import textrank_oracle_sql
    from sandcrawler_spark.operators.unigram import unigram_oracle_sql
    from sandcrawler_spark.operators.sketches import (
        cms_oracle_sql,
        hll_oracle_sql,
        hll_sliding_oracle_sql,
        kmv_intersection_oracle_sql,
        kmv_oracle_sql,
        kmv_pairwise_oracle_sql,
    )

    seen_sql = f"""
WITH {_URLS_CTE.strip()}
SELECT url FROM urls WHERE o_orderkey % 3 <> 0
"""
    link_base = f"WITH {_URLS_CTE.strip()},\n{_LINK_EDGES_CTE.strip()}"
    sc_ctes, sc_sel = _seedcover_oracle_ctes(4)
    from sandcrawler_spark.functions.urlfilter import (
        BLOCK_AT,
        REVIEW_AT,
        badwords_oracle_case,
    )

    bw_score = badwords_oracle_case("url")
    out = {
        # every aggregate is CAST to a fixed width: DuckDB SUM returns
        # HUGEINT/DECIMAL where Spark returns BIGINT, and the driver's
        # value stringifier renders them differently
        # redirect closure: recursive walk with hop cap 32; a src
        # whose walk never reaches a terminal node (cycle or over-cap
        # chain) resolves to NULL / -1 — must match the Spark
        # pointer-jumping semantics exactly
        "redirect_resolution": """
WITH RECURSIVE nodes AS (SELECT c_custkey AS k FROM customer),
redges AS (
  SELECT 'https://r.example.org/u/' || CAST(k AS VARCHAR) AS src,
         'https://r.example.org/u/' || CAST(k - 1 AS VARCHAR) AS dst
  FROM nodes WHERE k % 10 <> 0
  UNION ALL
  SELECT 'https://r.example.org/u/' || CAST(k AS VARCHAR),
         'https://r.example.org/u/' || CAST(k + 3 AS VARCHAR)
  FROM nodes WHERE k % 50 = 0
),
walk(src_url, cur, hops) AS (
  SELECT src, dst, CAST(1 AS BIGINT) FROM redges
  UNION ALL
  SELECT w.src_url, e.dst, w.hops + 1
  FROM walk w JOIN redges e ON e.src = w.cur
  WHERE w.hops < 32
),
term AS (
  SELECT w.src_url, w.cur, w.hops FROM walk w
  WHERE NOT EXISTS (SELECT 1 FROM redges e WHERE e.src = w.cur)
)
SELECT s.src AS src_url, t.cur AS final_url,
       CAST(COALESCE(t.hops, -1) AS BIGINT) AS n_hops
FROM (SELECT DISTINCT src FROM redges) s
LEFT JOIN term t ON t.src_url = s.src
""",
        # charset QA twin derived from the generator ARMS with the
        # same WHATWG precedence logic — never re-parses bytes
        "charset_sniff": """
WITH arms AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 'utf-8' END AS bom_cs,
         CASE WHEN doc_id % 4 = 0 THEN 'utf-8'
              WHEN doc_id % 4 = 1 THEN 'iso-8859-1'
              WHEN doc_id % 4 = 3 THEN 'windows-1252' END AS meta_cs,
         CASE WHEN doc_id % 3 = 0 THEN 'utf-8'
              WHEN doc_id % 3 = 2 THEN 'iso-8859-1' END AS header_cs
  FROM documents
)
SELECT doc_id, bom_cs, meta_cs, header_cs,
       COALESCE(bom_cs, header_cs, meta_cs, 'windows-1252') AS effective_cs,
       CASE WHEN bom_cs IS NOT NULL AND header_cs IS NOT NULL AND bom_cs <> header_cs
              THEN 'bom_header_conflict'
            WHEN meta_cs IS NOT NULL AND header_cs IS NOT NULL AND meta_cs <> header_cs
              THEN 'meta_header_conflict'
            WHEN bom_cs IS NULL AND header_cs IS NULL AND meta_cs IS NULL
              THEN 'undeclared'
            ELSE 'consistent' END AS verdict
FROM arms
""",
        "hard_negatives": f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10
), sims AS (
  SELECT q.q_id, e.vec_id, {_sql_cos('e.v', 'q.qv')} AS cosine
  FROM e, q
), banded AS (
  SELECT * FROM sims
  WHERE cosine >= 0.30 AND cosine < 0.95 AND q_id <> vec_id
)
SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM banded
) WHERE rank <= 5
""",
        "nepotistic_links": f"""
{link_base},
nhedges AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
nep AS (
  SELECT src_host, weight,
         ((ascii(substr(md5(src_host), 1, 1)) * 16 + ascii(substr(md5(src_host), 2, 1))) % 16)
         = ((ascii(substr(md5(dst_host), 1, 1)) * 16 + ascii(substr(md5(dst_host), 2, 1))) % 16) AS same
  FROM nhedges
)
SELECT src_host,
       CAST(SUM(weight) AS BIGINT) AS out_weight,
       CAST(SUM(CASE WHEN same THEN weight ELSE 0 END) AS BIGINT) AS same_ip_weight,
       CAST(COUNT(*) AS BIGINT) AS n_out_hosts,
       CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT) AS n_same_ip_hosts,
       CAST(CAST(1000000 AS BIGINT) * SUM(CASE WHEN same THEN weight ELSE 0 END)
            // SUM(weight) AS BIGINT) AS nepotism_ppm,
       CAST(SUM(weight) - SUM(CASE WHEN same THEN weight ELSE 0 END) AS BIGINT) AS clean_out_weight
FROM nep GROUP BY src_host
""",
        "subdomain_traps": f"""
WITH {_URLS_CTE.strip()},
allh AS (
  SELECT host FROM urls
  UNION ALL
  SELECT regexp_replace(lower(p_name), '\\s+', '-', 'g') || '.example.org' AS host FROM part
),
hh AS (
  SELECT host, regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
         COUNT(*) AS n_urls
  FROM allh GROUP BY 1, 2
),
tt AS (
  SELECT domain, host, n_urls,
         regexp_replace(
           CASE WHEN host = domain THEN ''
                ELSE substr(host, 1, strlen(host) - strlen(domain) - 1) END,
           '[0-9]+', 'D', 'g') AS template
  FROM hh
)
SELECT domain AS registered_domain,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT template) AS BIGINT) AS n_templates,
       (COUNT(*) >= 20 AND COUNT(DISTINCT template) * 1000000 <= COUNT(*) * 100000) AS is_trap
FROM tt GROUP BY domain
""",
        # cache plan twin derived from the generator ARMS (k mod
        # classes), not by re-parsing the header strings — if the Spark
        # parser misreads a directive, the hash diverges
        "cache_headers": f"""
WITH {_URLS_CTE.strip()},
h AS (
  SELECT url, o_orderkey AS k,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) * 86400 AS fetched
  FROM urls
),
plan AS (
  SELECT url, k, fetched,
         CASE
           WHEN k % 6 = 1 THEN 'no_store'
           WHEN k % 6 = 2 THEN 'revalidate'
           WHEN k % 6 = 4 THEN 'revalidate'
           WHEN k % 6 = 0 THEN 'fresh'
           WHEN k % 4 = 0 THEN 'fresh'
           WHEN k % 5 = 0 THEN 'heuristic'
           ELSE 'no_policy' END AS verdict,
         CASE
           WHEN k % 6 IN (1, 2, 4) THEN 0
           WHEN k % 6 = 0 THEN 3600
           WHEN k % 4 = 0 THEN 172800
           WHEN k % 5 = 0 THEN 259200
           ELSE 0 END AS ttl0
  FROM h
)
SELECT url, CAST(ttl0 AS BIGINT) AS ttl_s,
       CAST(fetched + ttl0 AS BIGINT) AS stale_epoch,
       (k % 3 = 0 OR k % 5 = 0) AS cond_get,
       verdict
FROM plan
""",
        "kcenter_select": _kcenter_oracle(8),
        "pmi_pairs": """
WITH t AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
    FROM documents)
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
v AS (
  SELECT term, n_term FROM (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_term,
           row_number() OVER (ORDER BY COUNT(*) DESC, term ASC) AS rk
    FROM t GROUP BY term) WHERE rk <= 1000
),
vt AS (SELECT t.doc_id, t.term, v.n_term FROM t JOIN v USING (term)),
p AS (
  SELECT a.term AS term_a, b.term AS term_b, a.n_term AS n_a, b.n_term AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= 5
)
SELECT term_a, term_b, n_ab, n_a, n_b,
       CAST(round(1000000.0 * ln(
           (CAST(n_ab AS DOUBLE) * (SELECT n FROM nd))
           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT) AS pmi_micro
FROM p
""",
        # fuzzy join: the Spark path blocks with exact prefix-filtered
        # q-grams; the oracle is the brute-force definition it must
        # equal — cross join + levenshtein
        "fuzzy_url_join": f"""
WITH {_URLS_CTE.strip()},
seeds AS (
  SELECT substr(url, 1, 14) || 'x' || substr(url, 16) AS seed_url
  FROM urls WHERE o_orderkey % 100 = 0
)
SELECT s.seed_url, u.url, CAST(levenshtein(s.seed_url, u.url) AS INT) AS dist
FROM seeds s, urls u
WHERE levenshtein(s.seed_url, u.url) <= 2
""",
        "skew_advisor": f"""
WITH {_URLS_CTE.strip()},
keyed AS (
  SELECT CASE WHEN site_id % 7 = 0 THEN 'hub.example.com'
              WHEN site_id % 7 = 1 THEN 'mirror.example.com'
              ELSE host END AS skew_host
  FROM urls
),
counts AS (SELECT skew_host, CAST(COUNT(*) AS BIGINT) AS n_rows FROM keyed GROUP BY skew_host),
p90t AS (
  SELECT n_rows AS p90 FROM counts
  QUALIFY ROW_NUMBER() OVER (ORDER BY n_rows, skew_host)
          = (SELECT (900 * COUNT(*) + 999) // 1000 FROM counts)
)
SELECT skew_host, n_rows,
       CAST(p90 AS BIGINT) AS ref_rows,
       CAST((n_rows * 100) // p90 AS BIGINT) AS ratio_centi,
       CAST(least((n_rows + p90 - 1) // p90, 64) AS INT) AS n_salts
FROM counts, p90t WHERE n_rows > 4 * p90
""",
        "warc_cdx_audit": """
WITH crlf AS (SELECT chr(13) || chr(10) AS c),
rec AS (
  SELECT doc_id, doc_id % 8 AS file_id,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'HTTP/1.1 200 OK' || c || 'Content-Type: text/html' || c
           || 'Content-Length: ' || CAST(strlen(text) AS VARCHAR) || c || c || text AS http,
         md5(text) AS digest
  FROM documents, crlf WHERE doc_id < 200
),
rec2 AS (
  SELECT doc_id, file_id, url, digest, strlen(http) AS http_len,
         strlen('WARC/1.0' || c || 'WARC-Type: response' || c
           || 'WARC-Target-URI: ' || url || c
           || 'WARC-Date: 2020-01-01T00:00:00Z' || c
           || 'WARC-Record-ID: <urn:md5:' || md5(url || ' 2020-01-01T00:00:00Z') || '>' || c
           || 'Content-Type: application/http; msgtype=response' || c
           || 'Content-Length: ' || CAST(strlen(http) AS VARCHAR) || c || c) AS head_len
  FROM rec, crlf
),
store AS (
  SELECT 'warc/part-' || CAST(file_id AS VARCHAR) || '.warc' AS path,
         CAST(coalesce(SUM(head_len + http_len + 4) OVER (PARTITION BY file_id
                ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset",
         url, digest
  FROM rec2
),
idx AS (
  SELECT path, "offset", url,
         CASE WHEN substr(digest, 2, 1) = 'b' THEN md5(digest) ELSE digest END AS digest
  FROM store WHERE substr(digest, 1, 1) <> 'a'
  UNION ALL
  SELECT 'warc/part-' || CAST(doc_id % 8 AS VARCHAR) || '.warc',
         CAST(10000000 + doc_id AS BIGINT),
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR),
         md5(text)
  FROM documents WHERE doc_id >= 200 AND doc_id < 210
),
j AS (
  SELECT coalesce(i.path, s.path) AS warc_file,
         CASE WHEN i.url IS NULL THEN 'unindexed_record'
              WHEN s.path IS NULL THEN 'phantom_index'
              WHEN i.digest = s.digest THEN 'ok'
              ELSE 'digest_mismatch' END AS st
  FROM idx i FULL OUTER JOIN store s ON i.path = s.path AND i."offset" = s."offset"
)
SELECT warc_file,
       CAST(SUM(CASE WHEN st = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       CAST(SUM(CASE WHEN st = 'digest_mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_digest_mismatch,
       CAST(SUM(CASE WHEN st = 'phantom_index' THEN 1 ELSE 0 END) AS BIGINT) AS n_phantom_index,
       CAST(SUM(CASE WHEN st = 'unindexed_record' THEN 1 ELSE 0 END) AS BIGINT) AS n_unindexed_record
FROM j GROUP BY warc_file
""",
        # perceptual dHash twin: the 60-term bit expression is GENERATED
        # from the same constant plan in both engines (dhash_sql), so
        # they cannot drift
        "dhash_images": _dhash_images_oracle(),
        "identifier_extract": _identifier_extract_oracle(),
        "image_dims": _IMAGE_DIMS_ORACLE,
        "html_blocks": _html_blocks_oracle(),
        "textrank_keywords": textrank_oracle_sql(
            "SELECT doc_id, text FROM documents", top_k=3
        ),
        "url_resolve": _url_resolve_oracle(),
        "unigram_segment": unigram_oracle_sql("SELECT text FROM documents"),
        "jsonld_meta": _jsonld_meta_oracle(),
        "lang_segments": _LANG_SEGMENTS_ORACLE,
        "recrawl_allocation": _recrawl_allocation_oracle(),
        "parked_domains": _parked_domains_oracle(),
        "longest_repeat": _LONGEST_REPEAT_ORACLE,
        "tracker_hosts": _TRACKER_HOSTS_ORACLE,
        "bbit_minhash": _BBIT_MINHASH_ORACLE,
        "table_markdown": _table_markdown_oracle(),
        "url_taxonomy": _url_taxonomy_oracle(),
        "capture_drift": _CAPTURE_DRIFT_ORACLE,
        "outlink_resolved": _outlink_resolved_oracle(),
        "http_dates": _http_dates_oracle(),
        "arc_roundtrip": _ARC_ROUNDTRIP_ORACLE,
        "gopher_quality": _gopher_quality_oracle(),
        "seen_compare": _SEEN_COMPARE_ORACLE,
        "nb_calibration": _nb_calibration_oracle(),
        "anchor_search": _anchor_search_oracle(),
        "warc_revisit_write": _WARC_REVISIT_WRITE_ORACLE,
        "https_upgrade": _https_upgrade_oracle(),
        # the exact-BM25 twin: equality == pruning-losslessness proof
        "maxscore_topk": bm25_oracle_sql(
            "SELECT doc_id, text FROM documents",
            f"""
SELECT term FROM (
  WITH _ms_cnts AS (
    SELECT term, COUNT(*) AS c FROM (
      SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
      FROM documents
    ) GROUP BY term
  )
  SELECT term FROM (
    SELECT term FROM _ms_cnts
    WHERE term NOT IN ({", ".join("'" + s + "'" for s in EN_STOPWORDS)})
    ORDER BY c DESC, term ASC LIMIT 2
  )
  UNION ALL
  SELECT term FROM (
    SELECT term FROM _ms_cnts WHERE c >= 3 ORDER BY c ASC, term ASC LIMIT 2
  )
)
""",
            k=15,
        ),
        "audio_chunks": """
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         10 + ((ascii(substr(md5(text), 8, 1)) * 5 + ascii(substr(md5(text), 9, 1))) % 50) AS n_windows
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
win AS (
  SELECT doc_id, h, unnest(generate_series(0, n_windows - 1)) AS w FROM m
),
en AS (
  SELECT doc_id, w,
         (ascii(substr(h, CAST(1 + (w * 11) % 32 AS INT), 1)) * 7 + w * 13) % 100 AS energy
  FROM win
),
voiced AS (SELECT * FROM en WHERE energy >= 30),
isl AS (
  SELECT doc_id, w, energy,
         w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS island
  FROM voiced
),
ch AS (
  SELECT doc_id, island, MIN(w) AS start_w, MAX(w) AS end_w,
         COUNT(*) AS n_win, (1000 * SUM(energy)) // COUNT(*) AS mep
  FROM isl GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_w) - 1 AS INT) AS chunk_idx,
       CAST(start_w AS INT) AS start_w, CAST(end_w AS INT) AS end_w,
       CAST(n_win AS INT) AS n_win, CAST(mep AS BIGINT) AS mean_energy_permille
FROM ch
""",
        "cdn_politeness": f"""
WITH {_URLS_CTE.strip()},
dns AS (
  SELECT host,
         CAST((ascii(substr(md5(host), 1, 1)) * 16 + ascii(substr(md5(host), 2, 1))) % 16 AS INT) AS ip_id
  FROM (SELECT DISTINCT host FROM urls)
),
keyed AS (
  SELECT u.url, u.host, '10.0.0.' || CAST(d.ip_id AS VARCHAR) AS ip,
         (d.ip_id % 5 = 0) AS is_cdn,
         CASE WHEN d.ip_id % 5 = 0 THEN 'h:' || u.host
              ELSE 'ip:10.0.0.' || CAST(d.ip_id AS VARCHAR) END AS sched_key,
         u.priority,
         CAST(CASE WHEN d.ip_id % 5 = 0 THEN 4 ELSE 2 + (d.ip_id % 3) END AS INT) AS quota
  FROM urls u JOIN dns d ON u.host = d.host
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY sched_key ORDER BY priority DESC, url) - 1 AS rk
  FROM keyed
)
SELECT url, host, ip, is_cdn, sched_key, priority, quota,
       CAST(FLOOR(rk * 1.0 / quota) AS INT) AS crawl_round,
       CAST(rk % quota AS INT) AS seq_in_round
FROM ranked
""",
        "scd2_history": """
WITH tick AS (
  SELECT user_id AS entity, ts, event_type AS value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events
),
obs AS (SELECT entity, ts, value FROM tick WHERE rn = 1),
changed AS (
  SELECT entity, ts AS valid_from, value,
         LAG(value) OVER (PARTITION BY entity ORDER BY ts) AS prev
  FROM obs
  QUALIFY prev IS NULL OR value <> prev
)
SELECT entity, value, valid_from,
       LEAD(valid_from) OVER (PARTITION BY entity ORDER BY valid_from) AS valid_to,
       CAST(ROW_NUMBER() OVER (PARTITION BY entity ORDER BY valid_from) AS INT) AS version,
       LEAD(valid_from) OVER (PARTITION BY entity ORDER BY valid_from) IS NULL AS is_current
FROM changed
""",
        "template_clusters": f"""
WITH {_corpus_oracle_tables()},
sk AS (
  SELECT url, regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract_all(lower(CASE WHEN substring(upper(hex(html)), 1, 2) = '3C'
                                       THEN decode(html) ELSE '' END),
                            '<([a-z][a-z0-9]*)', 1) AS tags
  FROM c_pages WHERE substring(upper(hex(html)), 1, 2) = '3C'
)
SELECT host, md5(array_to_string(tags, ',')) AS skeleton_sig,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       MIN(url) AS rep_url,
       CAST(MIN(len(tags)) AS INT) AS n_tags,
       CAST(MIN(len(list_distinct(tags))) AS INT) AS n_uniq_tags
FROM sk GROUP BY host, md5(array_to_string(tags, ','))
""",
        # multimodal twins: the stub decode is md5-hexchar arithmetic,
        # so DuckDB recomputes frame fan-out and resize dims exactly
        "frame_sample": """
WITH m AS (
  SELECT doc_id, md5(text) AS h,
         8 + ((ascii(substr(md5(text), 5, 1)) * 7 + ascii(substr(md5(text), 6, 1))) % 120) AS n_frames
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
f AS (
  SELECT doc_id, h, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx FROM m
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       md5(h || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sig
FROM f
""",
        "media_resize": """
WITH m AS (
  SELECT doc_id,
         64 + ((ascii(substr(md5(text), 1, 1)) * 13 + ascii(substr(md5(text), 2, 1))) % 1024) AS w,
         64 + ((ascii(substr(md5(text), 3, 1)) * 13 + ascii(substr(md5(text), 4, 1))) % 1024) AS h
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(CASE WHEN w <= 180 AND h <= 300 THEN w
                 WHEN w * 300 >= h * 180 THEN 180
                 ELSE (w * 300) // h END AS INT) AS out_w,
       CAST(CASE WHEN w <= 180 AND h <= 300 THEN h
                 WHEN w * 300 >= h * 180 THEN (h * 180) // w
                 ELSE 300 END AS INT) AS out_h,
       (w > 180 OR h > 300) AS resized
FROM m
""",
        "ip_politeness": f"""
WITH {_URLS_CTE.strip()},
dns AS (
  SELECT host,
         CAST((ascii(substr(md5(host), 1, 1)) * 16 + ascii(substr(md5(host), 2, 1))) % 16 AS INT) AS ip_id
  FROM (SELECT DISTINCT host FROM urls)
),
ranked AS (
  SELECT u.url, u.host, '10.0.0.' || CAST(d.ip_id AS VARCHAR) AS ip, u.priority,
         CAST(2 + (d.ip_id % 3) AS INT) AS quota,
         ROW_NUMBER() OVER (PARTITION BY d.ip_id ORDER BY u.priority DESC, u.url) - 1 AS rk
  FROM urls u JOIN dns d ON u.host = d.host
)
SELECT url, host, ip, priority, quota,
       CAST(FLOOR(rk * 1.0 / quota) AS INT) AS crawl_round,
       CAST(rk % quota AS INT) AS seq_in_round
FROM ranked
""",
        "crawl_lineage": f"""
WITH {_URLS_CTE.strip()},
unseen AS (SELECT * FROM urls WHERE o_orderkey % 3 <> 0),
allowed AS (SELECT * FROM unseen WHERE NOT starts_with(CAST(o_orderkey AS VARCHAR), '9')),
ranked AS (
  SELECT url, ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url) - 1 AS rk
  FROM allowed
),
sched AS (SELECT url FROM ranked WHERE rk < 40),
fetched AS (SELECT url FROM sched WHERE substr(md5(url), 1, 1) <= 'b')
SELECT CAST(1 AS INT) AS stage_idx, 'seed_hosts' AS stage, CAST((SELECT COUNT(DISTINCT host) FROM urls) AS BIGINT) AS n_rows
UNION ALL SELECT 2, 'frontier', (SELECT COUNT(*) FROM urls)
UNION ALL SELECT 3, 'unseen', (SELECT COUNT(*) FROM unseen)
UNION ALL SELECT 4, 'robots_allowed', (SELECT COUNT(*) FROM allowed)
UNION ALL SELECT 5, 'scheduled_r10', (SELECT COUNT(*) FROM sched)
UNION ALL SELECT 6, 'fetched_sim', (SELECT COUNT(*) FROM fetched)
""",
        "lineitem_rollup": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
        "status_counts": """
SELECT event_type AS status, COUNT(*) AS n FROM events GROUP BY event_type
""",
        "hit_rate_stats": """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       COUNT(*) AS n_total,
       COUNT(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderstatus
""",
        "politeness_schedule": f"""
WITH {_URLS_CTE.strip()},
ranked AS (
  SELECT url, host, priority,
         CAST(1 + (site_id % 4) AS INT) AS quota,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url) - 1 AS rk
  FROM urls
)
SELECT url, host, priority, quota,
       CAST(FLOOR(rk * 1.0 / quota) AS INT) AS crawl_round,
       CAST(rk % quota AS INT) AS seq_in_round
FROM ranked
""",
        "politeness_delay": f"""
WITH {_URLS_CTE.strip()},
quotas AS (
  SELECT DISTINCT host,
         least(CAST(2 + (site_id % 6) AS BIGINT),
               greatest(CAST(FLOOR(60.0 / (10.0 * (1 + site_id % 8))) AS BIGINT), 1)) AS quota
  FROM urls
),
ranked AS (
  SELECT u.url, u.host, q.quota,
         ROW_NUMBER() OVER (PARTITION BY u.host ORDER BY u.priority DESC, u.url) - 1 AS rk
  FROM urls u JOIN quotas q ON u.host = q.host
)
SELECT url, host, CAST(quota AS INT) AS quota,
       CAST(FLOOR(rk * 1.0 / quota) AS INT) AS crawl_round
FROM ranked
""",
        # event-time twin: window_idx must equal crawl_round (every
        # round's fetches fit inside its 60s window by construction:
        # max offset = (quota-1)*delay <= 60-delay), so the rollup is
        # the per-(host, round) count checked against the quota
        "politeness_timing": f"""
WITH {_URLS_CTE.strip()},
quotas AS (
  SELECT DISTINCT host,
         least(CAST(2 + (site_id % 6) AS BIGINT),
               greatest(CAST(FLOOR(60.0 / (10.0 * (1 + site_id % 8))) AS BIGINT), 1)) AS quota
  FROM urls
),
ranked AS (
  SELECT u.url, u.host, q.quota,
         ROW_NUMBER() OVER (PARTITION BY u.host ORDER BY u.priority DESC, u.url) - 1 AS rk
  FROM urls u JOIN quotas q ON u.host = q.host
)
SELECT host, CAST(FLOOR(rk * 1.0 / quota) AS INT) AS window_idx,
       COUNT(*) AS n_fetched, CAST(quota AS INT) AS quota,
       COUNT(*) <= quota AS ok
FROM ranked GROUP BY host, FLOOR(rk * 1.0 / quota), quota
""",
        "robots_parse": f"""
WITH {_URLS_CTE.strip()},
hosts AS (SELECT DISTINCT host, site_id FROM urls)
SELECT host,
       CASE WHEN site_id % 3 = 0 THEN CAST(site_id AS DOUBLE) END AS crawl_delay_s,
       CAST(CASE WHEN site_id % 3 = 0 THEN 1 WHEN site_id % 3 = 1 THEN 2 ELSE 0 END AS INT) AS n_disallow,
       CASE WHEN site_id % 3 = 0 THEN '/admin/' WHEN site_id % 3 = 1 THEN '/tmp/' END AS first_disallow,
       CAST(CASE WHEN site_id % 3 = 0 THEN 2 WHEN site_id % 3 = 1 THEN 1 ELSE 0 END AS INT) AS n_groups
FROM hosts
""",
        # RFC 9309 longest-match replayed relationally: the per-site
        # rule sets are literal (len, is_allow, regex) rows; the
        # winning rule per path is rank-1 by (len DESC, allow DESC)
        "robots_match": f"""
WITH {_URLS_CTE.strip()},
paths AS (
  SELECT host, CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(site_id % 4 AS INT) AS m,
         CASE CAST(o_orderkey % 5 AS INT)
           WHEN 0 THEN '/admin/r' || CAST(o_orderkey AS VARCHAR)
           WHEN 1 THEN '/order/' || CAST(o_orderkey AS VARCHAR) || '.php'
           WHEN 2 THEN '/fishing/' || CAST(o_orderkey AS VARCHAR)
           WHEN 3 THEN '/docs/p' || CAST(o_orderkey AS VARCHAR) || '.htm'
           ELSE '/order/' || CAST(o_orderkey AS VARCHAR)
         END AS path
  FROM urls
),
rules(m, rule_len, is_allow, rx) AS (VALUES
  (0, 6, 0, '^/admin'),
  (0, 7, 0, '^/.*\\.php$'),
  (0, 13, 1, '^/admin/public'),
  (1, 6, 0, '^/fish.*'),
  (1, 6, 0, '^/.*\\.htm'),
  (1, 6, 1, '^/docs/'),
  (2, 1, 0, '^/'),
  (2, 6, 1, '^/order')
),
matched AS (
  SELECT p.host, p.o_orderkey, r.is_allow,
         row_number() OVER (PARTITION BY p.host, p.o_orderkey
                            ORDER BY r.rule_len DESC, r.is_allow DESC) AS rn
  FROM paths p JOIN rules r ON p.m = r.m AND regexp_matches(p.path, r.rx)
)
SELECT p.host, p.o_orderkey, p.path,
       COALESCE(m.is_allow = 0, FALSE) AS disallowed
FROM paths p
LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
  ON p.host = m.host AND p.o_orderkey = m.o_orderkey
""",
        # soft-404 tiers replayed with the SAME module-constant regexes
        # (functions/soft404.py) — RE2 and Java regex agree on this
        # subset; the tiny-body guard measures the lowered string in
        # both engines
        "soft404": _soft404_oracle(),
        "registered_domain": _psl_oracle(),
        "fix_mojibake": _mojibake_oracle(),
        "nfc_normalize": _nfc_oracle(),
        "line_dedupe": """
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'Share on Facebook' || chr(10) || text || chr(10) ||
         'Share on Facebook' || chr(10) || 'Cookie notice' || chr(10) ||
         'Cookie notice' || chr(10) || CAST(doc_id AS VARCHAR) AS t
  FROM documents
),
split AS (
  SELECT doc_id, string_split(t, chr(10)) AS parts FROM f
),
pos_lines AS (
  SELECT doc_id, CAST(UNNEST(range(1, len(parts) + 1)) AS INT) - 1 AS pos, parts
  FROM split
),
lines AS (
  SELECT doc_id, pos, list_extract(parts, pos + 1) AS line FROM pos_lines
),
firsts AS (
  SELECT doc_id, line, MIN(pos) AS pos FROM lines GROUP BY doc_id, line
),
agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM firsts GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines FROM lines GROUP BY doc_id
)
SELECT a.doc_id, a.text, t.n_lines, t.n_lines - a.n_kept AS n_removed
FROM agg a JOIN tot t ON a.doc_id = t.doc_id
""",
        "host_boilerplate": _BP_ORACLE_BASE + """
SELECT host, line, n_docs, host_docs FROM bp
""",
        "boilerplate_strip": _BP_ORACLE_BASE + """,
kept AS (
  SELECT l.host, l.doc_id, l.pos, l.line
  FROM lines l LEFT JOIN bp b ON l.host = b.host AND l.line = b.line
  WHERE b.line IS NULL
),
rebuilt AS (
  SELECT host, doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY host, doc_id
),
tot AS (
  SELECT host, doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lines GROUP BY host, doc_id
)
SELECT t.host, t.doc_id, COALESCE(r.text, '') AS text, t.n_lines,
       t.n_lines - COALESCE(r.n_kept, 0) AS n_removed
FROM tot t LEFT JOIN rebuilt r ON t.host = r.host AND t.doc_id = r.doc_id
""",
        # concat-and-slice packing: the same stable order, one window
        # sum (CAST to BIGINT — DuckDB windowed SUM returns HUGEINT),
        # integer floor-division window ids
        "context_pack": f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, n_tokens, cum - n_tokens AS tok_start,
       CAST((cum - n_tokens) // {_CONTEXT_WINDOW} AS BIGINT) AS win_start,
       CAST((cum - 1) // {_CONTEXT_WINDOW} AS BIGINT) AS win_end
FROM c
""",
        "domain_budget_alloc": f"""
SELECT host AS domain, demand, alloc FROM ({budget_oracle_sql(
    f'''SELECT registered_domain AS host, CAST(COUNT(*) AS BIGINT) AS demand
FROM ({_psl_oracle()})
WHERE registered_domain IS NOT NULL GROUP BY registered_domain''',
    8_000,
)})
""",
        "seen_antijoin": seen_sql,
        "seen_bloom": seen_sql,
        # seen minus the evicted (recrawl-due) slice: orderkey%3==0 is
        # seen, %9==0 was deleted from the filter AND the seen set
        "seen_cuckoo": f"""
WITH {_URLS_CTE.strip()}
SELECT url FROM urls WHERE o_orderkey % 3 <> 0 OR o_orderkey % 9 = 0
""",
        # ExactSubstr-style span dedupe replayed over the same token /
        # gram / rank / coverage pipeline in list-comprehension SQL
        "span_dedupe": f"""
WITH {_AUG_DOCS_CTE.strip()},
tokd AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM aug_docs
),
toks AS (
  SELECT doc_id, UNNEST(range(len(toks))) AS pos, toks FROM tokd
),
tok2 AS (
  SELECT doc_id, pos, toks[pos + 1] AS tok, len(toks) AS ntok,
         md5(array_to_string(toks[pos + 1 : pos + 8], ' ')) AS gram_h
  FROM toks
),
ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram_h ORDER BY doc_id, pos) AS rk
  FROM tok2 WHERE pos <= ntok - 8
),
covered AS (
  SELECT DISTINCT r.doc_id, r.pos + u.i AS pos
  FROM ranked r, (SELECT UNNEST(range(8)) AS i) u
  WHERE r.rk > 1
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok2 t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL
),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS text_deduped
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(MAX(ntok) AS BIGINT) AS n_tokens FROM tok2 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(t.n_tokens, 0) AS n_tokens,
       COALESCE(t.n_tokens, 0) - COALESCE(r.n_kept, 0) AS n_dropped,
       COALESCE(r.text_deduped, '') AS text_deduped
FROM aug_docs d
LEFT JOIN totals t ON d.doc_id = t.doc_id
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
""",
        # link-graph family: edges derived relationally (the Spark path
        # extracts them from synthesized HTML via regexp — an
        # independent derivation, not a replay)
        "outlink_edges": f"""
{link_base}
SELECT src_url, dst_url FROM link_edges
""",
        "backlink_features": f"""
{link_base}
SELECT dst_url,
       CAST(COUNT(*) AS BIGINT) AS n_inlinks,
       CAST(COUNT(DISTINCT regexp_extract(src_url, '^[a-z]+://([^/]+)', 1)) AS BIGINT) AS n_ref_hosts,
       MIN(src_url) AS top_referrer
FROM link_edges GROUP BY dst_url
""",
        "link_depth": f"""
{link_base},
{_bfs_oracle_ctes(4)}
SELECT url, depth FROM bfs4
""",
        "host_pagerank": f"""
{link_base},
{_pagerank_oracle_ctes(5)}
SELECT host, rank FROM pr5
""",
        "host_kcore": f"""
{link_base},
{_kcore_oracle_ctes(3, 8)}
SELECT host, core_degree FROM kcn8
""",
        "host_ktruss": f"""
{link_base},
{_ktruss_oracle_ctes(3, 6)}
SELECT a, b, CAST(support AS BIGINT) AS support FROM kte6
""",
        "host_wcc": f"""
{link_base},
wedges AS (
  SELECT DISTINCT src_host AS a, dst_host AS b FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
),
whosts AS (
  SELECT host,
         CAST(CAST('0x' || substr(md5(host), 1, 15) AS UBIGINT) AS BIGINT) AS hid
  FROM (SELECT a AS host FROM wedges UNION SELECT b FROM wedges)
),
wsym AS (
  SELECT a, b FROM wedges WHERE a <> b
  UNION SELECT b, a FROM wedges WHERE a <> b
),
wreach AS (
  WITH RECURSIVE r(h, t) AS (
    SELECT host, host FROM whosts
    UNION
    SELECT r.h, e.b FROM r JOIN wsym e ON e.a = r.t
  )
  SELECT * FROM r
),
wlabel AS (
  SELECT r.h AS host, MIN(t.hid) AS component
  FROM wreach r JOIN whosts t ON t.host = r.t
  GROUP BY r.h
),
wsize AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS comp_size FROM wlabel GROUP BY component)
SELECT l.host, l.component, s.comp_size
FROM wlabel l JOIN wsize s USING (component)
""",
        "wet_roundtrip": f"""
WITH {_corpus_oracle_tables()}
SELECT lang, url,
       CAST(strlen(text) AS BIGINT) AS rec_content_length,
       md5(text) AS payload_md5
FROM c_pages
WHERE text IS NOT NULL AND lang IS NOT NULL
""",
        "host_hits": f"""
{link_base},
{_hits_oracle_ctes(3)}
SELECT h.host, h.hub, a.authority
FROM hh3 h JOIN hha3 a USING (host)
""",
        "trust_rank": f"""
{link_base},
{_trustrank_oracle_ctes(5)}
SELECT host, rank FROM trpr5
""",
        "host_communities": f"""
{link_base},
{_lpa_oracle_ctes(3)}
SELECT host, label AS community FROM lpa3
""",
        "page_robots": f"""
WITH {_URLS_CTE.strip()}
SELECT url,
       CASE CAST(o_orderkey % 5 AS INT)
         WHEN 0 THEN 'noindex, nofollow'
         WHEN 1 THEN 'noarchive'
         WHEN 2 THEN 'none'
         ELSE '' END AS robots_content,
       CAST(o_orderkey % 5 AS INT) IN (0, 2) AS noindex,
       CAST(o_orderkey % 5 AS INT) IN (0, 2) AS nofollow
FROM urls
""",
        "nofollow_outlinks": f"""
WITH {_URLS_CTE.strip()},
sh AS (SELECT url, o_orderkey, regexp_extract(url, '^(https?://[^/]+)', 1) AS shost FROM urls)
SELECT DISTINCT url AS src_url,
       shost || '/article/' || CAST(o_orderkey AS VARCHAR) AS dst_url,
       FALSE AS nofollow
FROM sh
UNION ALL
SELECT DISTINCT url, shost || '/sponsored/' || CAST(o_orderkey AS VARCHAR), TRUE FROM sh
UNION ALL
SELECT DISTINCT url, 'https://ads.example.net/z/' || CAST(o_orderkey AS VARCHAR), TRUE
FROM sh WHERE o_orderkey % 3 = 0
""",
        "host_coupling": f"""
{link_base},
cpe AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host
),
cpinf AS (SELECT dst_host FROM cpe GROUP BY dst_host HAVING COUNT(*) <= 1000),
cpee AS MATERIALIZED (SELECT e.src_host, e.dst_host FROM cpe e JOIN cpinf USING (dst_host)),
cpdeg AS (SELECT src_host, CAST(COUNT(*) AS BIGINT) AS outd FROM cpee GROUP BY src_host),
cppairs AS (
  SELECT a.src_host AS host_a, b.src_host AS host_b, CAST(COUNT(*) AS BIGINT) AS common
  FROM cpee a JOIN cpee b ON a.dst_host = b.dst_host AND a.src_host < b.src_host
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT p.host_a, p.host_b, p.common,
       CAST((p.common * CAST(1000000 AS BIGINT)) // (da.outd + db.outd - p.common) AS BIGINT) AS coupling_ppm
FROM cppairs p
JOIN cpdeg da ON p.host_a = da.src_host
JOIN cpdeg db ON p.host_b = db.src_host
""",
        "spam_mass": f"""
{link_base},
{_pagerank_oracle_ctes(5)},
{_trustrank_oracle_ctes(5)}
SELECT p.host,
       p.rank AS pr_rank,
       CAST(COALESCE(t.rank, 0) AS BIGINT) AS trust_rank,
       CAST((greatest(CAST(0 AS BIGINT), p.rank - COALESCE(t.rank, 0))
             * CAST(1000000 AS BIGINT)) // p.rank AS BIGINT) AS spam_mass_ppm,
       CAST((greatest(CAST(0 AS BIGINT), p.rank - COALESCE(t.rank, 0))
             * CAST(1000000 AS BIGINT)) // p.rank AS BIGINT) >= 700000 AS is_spam
FROM pr5 p LEFT JOIN trpr5 t USING (host)
""",
        "bowtie_classes": f"""
{link_base},
{_bowtie_oracle_ctes(8)}
SELECT host, cls FROM btcls
""",
        "opic_scores": f"""
{link_base},
{_opic_oracle_ctes(5)}
SELECT host, cash, hist AS history,
       CAST(((cash + hist) * CAST(1000000 AS BIGINT)) // (SELECT tot FROM optot) AS BIGINT) AS importance_ppm
FROM opst5
""",
        "adamic_adar": f"""
{link_base},
aah AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1) AS a,
                  regexp_extract(dst_url, '^https?://([^/]+)', 1) AS b
  FROM link_edges
),
aaund AS MATERIALIZED (
  SELECT a AS src_host, b AS dst_host FROM aah WHERE a <> b
  UNION
  SELECT b, a FROM aah WHERE a <> b
),
aadeg AS (SELECT src_host AS z, CAST(COUNT(*) AS BIGINT) AS deg FROM aaund GROUP BY src_host),
aaw AS (
  SELECT z, CAST(1000000000000 AS BIGINT)
            // CAST(round(ln(CAST(deg AS DOUBLE)) * 1000000) AS BIGINT) AS w_micro
  FROM aadeg WHERE deg >= 2 AND deg <= 1000
),
aazx AS (
  SELECT u.src_host AS z, u.dst_host AS x, w.w_micro
  FROM aaund u JOIN aaw w ON u.src_host = w.z
)
SELECT host_a, host_b, common, aa_micro FROM (
  SELECT a.x AS host_a, b.x AS host_b,
         CAST(COUNT(*) AS BIGINT) AS common,
         CAST(SUM(a.w_micro) AS BIGINT) AS aa_micro
  FROM aazx a JOIN aazx b ON a.z = b.z AND a.x < b.x
  GROUP BY a.x, b.x HAVING COUNT(*) >= 2
) p
WHERE NOT EXISTS (SELECT 1 FROM aaund u
                  WHERE u.src_host = p.host_a AND u.dst_host = p.host_b)
""",
        "degree_distribution": f"""
{link_base},
dde AS MATERIALIZED (
  SELECT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
ddd AS (
  SELECT 'out' AS direction, CAST(length(bin(CAST(COUNT(*) AS BIGINT))) - 1 AS INT) AS bin
  FROM dde GROUP BY src_host
  UNION ALL
  SELECT 'in', CAST(length(bin(CAST(COUNT(*) AS BIGINT))) - 1 AS INT)
  FROM dde GROUP BY dst_host
)
SELECT direction, bin,
       CAST(CAST(1 AS BIGINT) << bin AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_hosts
FROM ddd GROUP BY direction, bin
""",
        # SALSA closed form replayed relationally: bipartite H:/A:
        # node namespaces, min-label components via recursive reach
        # (same pattern as the neardup CC twin), degree shares with
        # HUGEINT products before the truncating ppm division
        "salsa_scores": link_base.replace("WITH ", "WITH RECURSIVE ", 1) + """,
sse AS MATERIALIZED (
  SELECT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
sbe AS (SELECT 'H:' || src_host AS s, 'A:' || dst_host AS t FROM sse),
sedges AS MATERIALIZED (SELECT s, t FROM sbe UNION SELECT t, s FROM sbe),
sreach AS (
  SELECT s, t FROM sedges
  UNION
  SELECT r.s, e.t FROM sreach r JOIN sedges e ON r.t = e.s
),
snodes AS (SELECT DISTINCT s FROM sedges),
slab AS MATERIALIZED (
  SELECT n.s AS id, least(n.s, coalesce(min(r.t), n.s)) AS label
  FROM snodes n LEFT JOIN sreach r ON r.s = n.s GROUP BY n.s
),
sdout AS (SELECT src_host AS host, CAST(COUNT(*) AS BIGINT) AS d_out FROM sse GROUP BY src_host),
sdin  AS (SELECT dst_host AS host, CAST(COUNT(*) AS BIGINT) AS d_in  FROM sse GROUP BY dst_host),
shin AS (SELECT d.host, d.d_out, l.label FROM sdout d JOIN slab l ON l.id = 'H:' || d.host),
sain AS (SELECT d.host, d.d_in,  l.label FROM sdin  d JOIN slab l ON l.id = 'A:' || d.host),
shcomp AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_comp, CAST(SUM(d_out) AS BIGINT) AS d_comp FROM shin GROUP BY label),
sacomp AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_comp, CAST(SUM(d_in)  AS BIGINT) AS d_comp FROM sain GROUP BY label),
snh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_side FROM shin),
sna AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_side FROM sain),
shub AS (
  SELECT h.host, h.d_out,
         CAST((CAST(c.n_comp AS HUGEINT) * h.d_out * 1000000)
              // (CAST(n.n_side AS HUGEINT) * c.d_comp) AS BIGINT) AS hub_ppm
  FROM shin h JOIN shcomp c USING (label), snh n
),
sauth AS (
  SELECT a.host, a.d_in,
         CAST((CAST(c.n_comp AS HUGEINT) * a.d_in * 1000000)
              // (CAST(n.n_side AS HUGEINT) * c.d_comp) AS BIGINT) AS authority_ppm
  FROM sain a JOIN sacomp c USING (label), sna n
)
SELECT COALESCE(h.host, a.host) AS host,
       CAST(COALESCE(h.d_out, 0) AS BIGINT) AS d_out,
       CAST(COALESCE(a.d_in, 0) AS BIGINT) AS d_in,
       CAST(COALESCE(h.hub_ppm, 0) AS BIGINT) AS hub_ppm,
       CAST(COALESCE(a.authority_ppm, 0) AS BIGINT) AS authority_ppm
FROM shub h FULL OUTER JOIN sauth a ON h.host = a.host
""",
        "degree_assortativity": f"""
{link_base},
dau AS MATERIALIZED (
  SELECT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY 1, 2
),
dadeg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS host FROM dau UNION ALL SELECT b FROM dau)
  GROUP BY host
),
daends AS (
  SELECT da.deg AS j, db.deg AS k
  FROM dau u JOIN dadeg da ON u.a = da.host JOIN dadeg db ON u.b = db.host
),
dasym AS (SELECT j, k FROM daends UNION ALL SELECT k AS j, j AS k FROM daends),
daagg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_ends,
         CAST(SUM(j) AS BIGINT) AS sum_deg,
         CAST(SUM(j * k) AS BIGINT) AS sum_prod,
         CAST(SUM(j * j) AS BIGINT) AS sum_sq
  FROM dasym
)
SELECT m_ends, sum_deg, sum_prod, sum_sq,
  CAST(CASE
    WHEN (CAST(m_ends AS HUGEINT) * sum_sq - CAST(sum_deg AS HUGEINT) * sum_deg) = 0 THEN 0
    WHEN (CAST(m_ends AS HUGEINT) * sum_prod - CAST(sum_deg AS HUGEINT) * sum_deg) < 0
    THEN -(( -(CAST(m_ends AS HUGEINT) * sum_prod - CAST(sum_deg AS HUGEINT) * sum_deg) * 1000000)
           // (CAST(m_ends AS HUGEINT) * sum_sq - CAST(sum_deg AS HUGEINT) * sum_deg))
    ELSE ((CAST(m_ends AS HUGEINT) * sum_prod - CAST(sum_deg AS HUGEINT) * sum_deg) * 1000000)
         // (CAST(m_ends AS HUGEINT) * sum_sq - CAST(sum_deg AS HUGEINT) * sum_deg)
  END AS BIGINT) AS r_micro
FROM daagg
""",
        # plain range-predicate join — the relational ground truth the
        # bucketed Spark plan must reproduce pair-for-pair
        "interval_join": """
WITH ija AS (
  SELECT CAST(floor(epoch(date_trunc('day', min(ts)))) AS BIGINT) AS a0 FROM events
),
ijw AS (
  SELECT s, k,
         'site' || CAST(s AS VARCHAR) || '.example.com' AS host,
         a0 + ((s * 7919 + k * 104729) % 672) * 3600 AS start_sec,
         a0 + ((s * 7919 + k * 104729) % 672) * 3600
            + (6 + ((s * 31 + k * 17) % 42)) * 3600 AS end_sec
  FROM ija, (SELECT unnest(range(0, 50)) AS s), (SELECT unnest(range(0, 4)) AS k)
),
ijp AS (
  SELECT event_id,
         'site' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
)
SELECT w.host, CAST(w.s * 4 + w.k AS BIGINT) AS w_id,
       CAST(w.start_sec AS BIGINT) AS start_sec,
       CAST(w.end_sec AS BIGINT) AS end_sec,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(p.value_cents) AS BIGINT) AS value_cents,
       CAST(MIN(p.event_id) AS BIGINT) AS first_event
FROM ijp p JOIN ijw w
  ON p.host = w.host AND p.ts_sec >= w.start_sec AND p.ts_sec < w.end_sec
GROUP BY w.host, w.s, w.k, w.start_sec, w.end_sec
""",
        "event_transitions": """
WITH etp AS (
  SELECT event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
etc AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM etp WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
),
ett AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot FROM etc GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n,
       CAST((c.n * CAST(1000000 AS HUGEINT)) // t.tot AS BIGINT) AS p_ppm
FROM etc c JOIN ett t USING (prev_type)
""",
        # median/MAD in 2x/8x integer units: quantile_cont of integer
        # counts is integer or half-integer, so both scaled medians
        # are exactly representable and the flag compares pure int64
        "rate_anomalies": """
WITH rah AS (
  SELECT 'site' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host,
         date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
ram AS (
  SELECT host, CAST(round(2 * quantile_cont(cnt, 0.5)) AS BIGINT) AS med2
  FROM rah GROUP BY host
),
rad AS (
  SELECT h.host, h.hour, h.cnt, m.med2,
         abs(4 * h.cnt - 2 * m.med2) AS dev4
  FROM rah h JOIN ram m USING (host)
),
raa AS (
  SELECT host, CAST(round(2 * quantile_cont(dev4, 0.5)) AS BIGINT) AS mad8
  FROM rad GROUP BY host
)
SELECT d.host, d.hour, d.cnt, d.med2, a.mad8,
       (8 * d.cnt > 4 * d.med2 + 3 * a.mad8) AS is_anomaly
FROM rad d JOIN raa a USING (host)
""",
        # LPA labels (shared unrolled CTEs) hashed to shards, then the
        # same per-shard internal/cross accounting as shard_cut
        "community_shard_cut": f"""
{link_base},
{_lpa_oracle_ctes(3)},
cce AS (
  SELECT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
ccs AS (
  SELECT host,
         CAST(CAST('0x' || substr(md5(label), 1, 15) AS BIGINT) % 8 AS INT) AS shard
  FROM lpa3
),
cct AS (
  SELECT a.shard AS shard, (a.shard = b.shard) AS internal
  FROM cce e JOIN ccs a ON e.src_host = a.host JOIN ccs b ON e.dst_host = b.host
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(CASE WHEN internal THEN 1 ELSE 0 END) AS BIGINT) AS n_internal,
       CAST(COUNT(*) - SUM(CASE WHEN internal THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
       CAST(((COUNT(*) - SUM(CASE WHEN internal THEN 1 ELSE 0 END)) * CAST(1000000 AS HUGEINT))
            // COUNT(*) AS BIGINT) AS cross_ppm
FROM cct GROUP BY shard
""",
        # rendezvous argmax replayed on both endpoints via a host->
        # shard map joined twice (the shard_assign twin, edge-applied)
        "shard_cut": link_base + """,
sce AS (
  SELECT src_host, dst_host FROM (
    SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
           regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
    FROM link_edges)
  WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
sch AS (SELECT src_host AS host FROM sce UNION SELECT dst_host FROM sce),
scw AS (
  SELECT host, CAST(t.i AS INT) AS shard,
         md5(host || ':' || CAST(t.i AS VARCHAR)) AS wgt
  FROM sch CROSS JOIN range(0, 8) t(i)
),
scm AS (
  SELECT host, shard FROM (
    SELECT host, shard,
           ROW_NUMBER() OVER (PARTITION BY host ORDER BY wgt DESC, shard DESC) AS rn
    FROM scw) WHERE rn = 1
),
sct AS (
  SELECT a.shard AS shard, (a.shard = b.shard) AS internal
  FROM sce e JOIN scm a ON e.src_host = a.host JOIN scm b ON e.dst_host = b.host
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(CASE WHEN internal THEN 1 ELSE 0 END) AS BIGINT) AS n_internal,
       CAST(COUNT(*) - SUM(CASE WHEN internal THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
       CAST(((COUNT(*) - SUM(CASE WHEN internal THEN 1 ELSE 0 END)) * CAST(1000000 AS HUGEINT))
            // COUNT(*) AS BIGINT) AS cross_ppm
FROM sct GROUP BY shard
""",
        # integer (host, dim) sums -> one double cosine per host, the
        # embedding_pca micro-round discipline
        "topic_affinity": """
WITH tae AS (
  SELECT 'site' || CAST(vec_id % 40 AS VARCHAR) || '.example.com' AS host,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
tah AS (
  SELECT host, i.pos,
         CAST(SUM(CAST(round(v[CAST(i.pos AS INT) + 1] * 1000000) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM tae, (SELECT unnest(range(0, (SELECT max(len(v)) FROM tae))) AS pos) i
  GROUP BY host, i.pos
),
taq AS (
  SELECT i.pos,
         CAST(SUM(CAST(round(v[CAST(i.pos AS INT) + 1] * 1000000) AS BIGINT)) AS BIGINT) AS q
  FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 3) s,
       (SELECT unnest(range(0, (SELECT max(len(v)) FROM tae))) AS pos) i
  GROUP BY i.pos
),
taa AS (
  SELECT h.host, MAX(h.n) AS n_docs,
         SUM(CAST(h.s AS HUGEINT) * q.q) AS dot,
         SUM(CAST(h.s AS HUGEINT) * h.s) AS vv,
         SUM(CAST(q.q AS HUGEINT) * q.q) AS qq
  FROM tah h JOIN taq q USING (pos)
  GROUP BY h.host
)
SELECT host, CAST(n_docs AS BIGINT) AS n_docs,
       CASE WHEN vv = 0 OR qq = 0 THEN 0.0
            ELSE round(CAST(dot AS DOUBLE) /
                       (sqrt(CAST(vv AS DOUBLE)) * sqrt(CAST(qq AS DOUBLE))), 6)
       END AS affinity
FROM taa
""",
        # construction-derived twins (canonical_aliases discipline)
        "meta_refresh": f"""
WITH {_URLS_CTE.strip()}
SELECT url, CAST(0 AS BIGINT) AS delay_sec,
       'https://' || host || '/moved/' || CAST(o_orderkey AS VARCHAR) AS target_url
FROM urls WHERE o_orderkey % 3 = 0
UNION ALL
SELECT url, CAST(5 AS BIGINT) AS delay_sec,
       'https://' || host || '/slow/' || CAST(o_orderkey AS VARCHAR) AS target_url
FROM urls WHERE o_orderkey % 3 = 1
""",
        # replays the redirect construction AND the argmax/share logic
        "host_moves": f"""
WITH {_URLS_CTE.strip()},
hmr AS (
  SELECT host AS src_host,
         'site' || CAST(CASE WHEN site_id % 10 = 7 THEN (site_id + 1) % 50
                             ELSE o_orderkey % 50 END AS VARCHAR)
           || '.example.com' AS dst_host
  FROM urls
  WHERE (site_id % 10 = 7 AND o_orderkey % 5 <> 0) OR o_orderkey % 17 = 0
),
hme AS (SELECT src_host, dst_host FROM hmr WHERE src_host <> dst_host),
hmp AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM hme GROUP BY src_host, dst_host
),
hmt AS (SELECT src_host, CAST(SUM(n_pair) AS BIGINT) AS n_total FROM hmp GROUP BY src_host),
hmtop AS (
  SELECT src_host, dst_host, n_pair FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_host
                                 ORDER BY n_pair DESC, dst_host ASC) AS rn
    FROM hmp) WHERE rn = 1
)
SELECT t.src_host, t.dst_host, t.n_pair, x.n_total,
       CAST((t.n_pair * CAST(1000000 AS HUGEINT)) // x.n_total AS BIGINT) AS share_ppm,
       (x.n_total >= 5 AND (t.n_pair * CAST(1000000 AS HUGEINT)) // x.n_total >= 800000) AS moved
FROM hmtop t JOIN hmt x USING (src_host)
""",
        "crawl_capacity": f"""
WITH {_URLS_CTE.strip()},
ccd AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS demand FROM urls GROUP BY host
),
ccdel AS (
  SELECT host, CAST(250 * (1 + site_id % 7) AS BIGINT) AS delay_ms
  FROM (SELECT DISTINCT host, site_id FROM urls)
  WHERE site_id % 4 <> 3
),
ccj AS (
  SELECT d.host, d.demand, COALESCE(l.delay_ms, 1000) AS delay_ms,
         GREATEST(CAST(600 * 1000 AS BIGINT) // COALESCE(l.delay_ms, 1000), 1) AS capacity
  FROM ccd d LEFT JOIN ccdel l USING (host)
)
SELECT host, demand, delay_ms, capacity,
       GREATEST(demand - capacity, 0) AS deficit,
       CAST((demand + capacity - 1) // capacity AS BIGINT) AS rounds_to_drain
FROM ccj
""",
        # relational twin: derives the aligned pairs from the same
        # construction arithmetic (the canonical_aliases discipline —
        # the regex extraction itself is pytest-covered on real forms)
        "hreflang_pairs": f"""
WITH {_URLS_CTE.strip()}
SELECT 'de' AS lang_a,
       'https://' || host || '/de/order/' || CAST(o_orderkey AS VARCHAR) AS url_a,
       'en' AS lang_b, url AS url_b
FROM urls WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 'en' AS lang_a,
       'https://' || host || '/en/order/' || CAST(o_orderkey AS VARCHAR) AS url_a,
       'fr' AS lang_b,
       'https://' || host || '/fr/order/' || CAST(o_orderkey AS VARCHAR) AS url_b
FROM urls WHERE o_orderkey % 3 = 1
""",
        # independent replay of the percent-normalizer: DuckDB splits
        # on '%' and folds the pieces with the same unreserved/upper
        # CASE — not a construction-derived expected value
        "pct_normalize": f"""
WITH {_URLS_CTE.strip()},
pn AS (
  SELECT o_orderkey,
         url || CASE CAST(o_orderkey % 5 AS INT)
           WHEN 0 THEN '/%7euser'
           WHEN 1 THEN '/a%2fb?x=%41%4a'
           WHEN 2 THEN '/p%'
           WHEN 3 THEN '/100%25%2e'
           ELSE '/%zz%5F' END AS url_raw
  FROM urls
),
pnp AS (SELECT o_orderkey, url_raw, str_split(url_raw, '%') AS parts FROM pn)
SELECT o_orderkey, url_raw,
       parts[1] || array_to_string(list_transform(parts[2:], pc ->
         CASE
           WHEN NOT regexp_matches(pc, '^[0-9A-Fa-f]{{2}}') THEN '%' || pc
           WHEN CAST('0x' || upper(pc[1:2]) AS INT) BETWEEN 48 AND 57
             OR CAST('0x' || upper(pc[1:2]) AS INT) BETWEEN 65 AND 90
             OR CAST('0x' || upper(pc[1:2]) AS INT) BETWEEN 97 AND 122
             OR CAST('0x' || upper(pc[1:2]) AS INT) IN (45, 46, 95, 126)
           THEN chr(CAST('0x' || upper(pc[1:2]) AS INT)) || pc[3:]
           ELSE '%' || upper(pc[1:2]) || pc[3:]
         END), '') AS url_norm
FROM pnp
""",
        "stratum_overlap": kmv_pairwise_oracle_sql(
            "SELECT event_type AS stratum, CAST(user_id AS VARCHAR) AS visitor FROM events",
            "visitor",
            "stratum",
            k=64,
        ),
        # neighborhood-function readout over the shared HyperBall CTEs:
        # cents totals per hop, ppm coverage, first-t>=90% flag
        "distance_profile": f"""
{link_base},
{_hyperball_oracle_ctes(3, 8)},
dp_tot AS (
  SELECT CAST(SUM(round(e0.ball_0 * 100)) AS BIGINT) AS n0,
         CAST(SUM(round(e1.ball_1 * 100)) AS BIGINT) AS n1,
         CAST(SUM(round(e2.ball_2 * 100)) AS BIGINT) AS n2,
         CAST(SUM(round(e3.ball_3 * 100)) AS BIGINT) AS n3
  FROM hbest0 e0 JOIN hbest1 e1 USING (host)
       JOIN hbest2 e2 USING (host) JOIN hbest3 e3 USING (host)
),
dp_deff AS (
  SELECT *, CASE WHEN n0 * 100 >= n3 * 90 THEN 0
                 WHEN n1 * 100 >= n3 * 90 THEN 1
                 WHEN n2 * 100 >= n3 * 90 THEN 2
                 ELSE 3 END AS deff
  FROM dp_tot
),
dp_rows AS (
  SELECT 0 AS t, n0 AS pairs_cents, n3, deff FROM dp_deff
  UNION ALL SELECT 1, n1, n3, deff FROM dp_deff
  UNION ALL SELECT 2, n2, n3, deff FROM dp_deff
  UNION ALL SELECT 3, n3, n3, deff FROM dp_deff
)
SELECT CAST(t AS INT) AS t, pairs_cents,
       CAST(CASE WHEN n3 = 0 THEN 0
                 ELSE (pairs_cents * CAST(1000000 AS HUGEINT)) // n3 END AS BIGINT) AS frac_ppm,
       (t = deff) AS is_effective_diameter
FROM dp_rows
""",
        # trailing-window HLL: same register math as the host
        # cardinality twin, window membership as an integer range join
        "hll_sliding": hll_sliding_oracle_sql(
            "SELECT 'site' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host, "
            "CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS day, "
            "CAST(user_id AS VARCHAR) AS visitor FROM events",
            "visitor",
            "host",
            "day",
            window_buckets=7,
            p=6,
            out_group="host",
            out_bucket="day",
        ),
        # exact relational twin of the mirror-pair join, hot-fp cap
        # included (even though it never triggers at oracle SF — the
        # semantics must match the operator, not just this input)
        "host_mirrors": """
WITH mhf AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS host,
         CAST(l_partkey AS VARCHAR) || ':' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS fp
  FROM lineitem
),
msz AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM mhf GROUP BY host),
mhot AS (SELECT fp FROM mhf GROUP BY fp HAVING COUNT(*) > 256),
mcold AS (SELECT host, fp FROM mhf WHERE fp NOT IN (SELECT fp FROM mhot)),
mp AS (
  SELECT a.host AS host_a, b.host AS host_b, CAST(COUNT(*) AS BIGINT) AS shared
  FROM mcold a JOIN mcold b ON a.fp = b.fp AND a.host < b.host
  GROUP BY a.host, b.host HAVING COUNT(*) >= 2
)
SELECT p.host_a, p.host_b, p.shared, sa.n AS n_a, sb.n AS n_b,
       CAST((p.shared * CAST(1000000 AS HUGEINT)) // (sa.n + sb.n - p.shared) AS BIGINT) AS jaccard_ppm,
       CAST((p.shared * CAST(1000000 AS HUGEINT)) // sa.n AS BIGINT) AS cont_a_ppm,
       CAST((p.shared * CAST(1000000 AS HUGEINT)) // sb.n AS BIGINT) AS cont_b_ppm
FROM mp p JOIN msz sa ON p.host_a = sa.host JOIN msz sb ON p.host_b = sb.host
""",
        # the EWMA fold replayed with list_reduce over the same sorted
        # hourly series; div truncates toward zero in both engines
        "ewma_trend": """
WITH ewh AS (
  SELECT 'site' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host,
         date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
ewa AS (
  SELECT host, list(cnt ORDER BY hour) AS xs,
         CAST(COUNT(*) AS BIGINT) AS n_hours, CAST(SUM(cnt) AS BIGINT) AS sum_cnt
  FROM ewh GROUP BY host
),
ewf AS (
  SELECT host, n_hours, sum_cnt,
         list_reduce(list_prepend(CAST(-1 AS BIGINT), xs), (acc, x) ->
           CASE WHEN acc < 0 THEN 8 * x ELSE acc + ((8 * x - acc) // 8) END) AS ewma_scaled,
         (8 * sum_cnt) // n_hours AS mean_scaled
  FROM ewa
)
SELECT host, n_hours, sum_cnt,
       CAST(ewma_scaled AS BIGINT) AS ewma_scaled,
       CAST(mean_scaled AS BIGINT) AS mean_scaled,
       CASE WHEN ewma_scaled * 100 > mean_scaled * 115 THEN 'rising'
            WHEN ewma_scaled * 100 < mean_scaled * 85 THEN 'falling'
            ELSE 'flat' END AS trend
FROM ewf
""",
        "seed_cover": f"""
{link_base},
{sc_ctes}
{sc_sel}
""",
        "source_diversity": """
WITH sdc AS (
  SELECT lang AS grp, source AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY lang, source
),
sda AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_docs,
         CAST(SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS swln
  FROM sdc GROUP BY grp
)
SELECT grp, n_keys, n_docs,
       CAST(CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
            - swln // n_docs AS BIGINT) AS entropy_micronat,
       CAST(round(ln(CAST(n_keys AS DOUBLE)) * 1000000) AS BIGINT) AS ceiling_micronat
FROM sda
""",
        "char_entropy": """
WITH ceh AS (
  SELECT doc_id, substring(text, 1, 256) AS h
  FROM documents WHERE length(substring(text, 1, 256)) > 0
),
cec AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, CAST(length(h) AS BIGINT)),
                i -> substring(h, CAST(i AS INT), 1))) AS ch
  FROM ceh
),
cecnt AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt FROM cec GROUP BY doc_id, ch),
ceagg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(cnt) AS BIGINT) AS n_chars,
         CAST(SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS swln
  FROM cecnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(COALESCE(CAST(round(ln(CAST(a.n_chars AS DOUBLE)) * 1000000) AS BIGINT)
                     - a.swln // a.n_chars, 0) AS BIGINT) AS entropy_micronat,
       CAST(COALESCE(CAST(round(ln(CAST(a.n_chars AS DOUBLE)) * 1000000) AS BIGINT)
                     - a.swln // a.n_chars, 0) AS BIGINT) >= 4500000 AS high_entropy
FROM documents d LEFT JOIN ceagg a USING (doc_id)
""",
        "token_drift": """
WITH tdc AS (
  SELECT lang AS grp,
         CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
         UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
tdcnt AS MATERIALIZED (
  SELECT grp, side, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tdc GROUP BY grp, side, tok
),
tdpool AS (
  SELECT grp,
         CAST(SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS pwln
  FROM (SELECT grp, tok, CAST(SUM(cnt) AS BIGINT) AS cnt FROM tdcnt GROUP BY grp, tok)
  GROUP BY grp
),
tdside AS (
  SELECT grp, side, CAST(SUM(cnt) AS BIGINT) AS n_side,
         CAST(SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS swln
  FROM tdcnt GROUP BY grp, side
),
tdnh AS (
  SELECT grp, n_side,
         CAST(n_side * CAST(round(ln(CAST(n_side AS DOUBLE)) * 1000000) AS BIGINT) - swln AS BIGINT) AS nh
  FROM tdside
),
tdagg AS (
  SELECT grp, CAST(SUM(n_side) AS BIGINT) AS n_tokens, CAST(SUM(nh) AS BIGINT) AS sum_nh
  FROM tdnh GROUP BY grp
)
SELECT a.grp, a.n_tokens,
       CAST(CAST(round(ln(CAST(a.n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
            - p.pwln // a.n_tokens AS BIGINT) AS pooled_entropy_micronat,
       CAST(a.sum_nh // a.n_tokens AS BIGINT) AS mean_side_entropy_micronat,
       CAST((CAST(round(ln(CAST(a.n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
            - p.pwln // a.n_tokens) - a.sum_nh // a.n_tokens AS BIGINT) AS jsd_micronat
FROM tdagg a JOIN tdpool p USING (grp)
""",
        "zipf_fit": """
WITH zfc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok
    FROM documents
  ) GROUP BY tok ORDER BY cnt DESC, tok LIMIT 1000
),
zfr AS (SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank, cnt FROM zfc),
zfxy AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000) AS BIGINT) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM zfr
),
zfm AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM zfxy
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS BIGINT) AS slope_milli,
       CAST((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
            // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT) AS r2_ppm
FROM zfm
""",
        "snapshot_diff": f"""
WITH {_CAPTURES_CTE.strip()},
sdold AS (
  SELECT url, sha1hex AS old_sha1 FROM (
    SELECT url, sha1hex,
           ROW_NUMBER() OVER (PARTITION BY url ORDER BY datetime DESC, event_id DESC) AS rn
    FROM captures WHERE datetime < '20240116000000'
  ) WHERE rn = 1
),
sdnew AS (
  SELECT url, sha1hex AS new_sha1 FROM (
    SELECT url, sha1hex,
           ROW_NUMBER() OVER (PARTITION BY url ORDER BY datetime DESC, event_id DESC) AS rn
    FROM captures WHERE datetime >= '20240116000000'
  ) WHERE rn = 1
)
SELECT COALESCE(o.url, n.url) AS url,
       CASE WHEN o.old_sha1 IS NULL THEN 'NEW'
            WHEN n.new_sha1 IS NULL THEN 'GONE'
            WHEN o.old_sha1 = n.new_sha1 THEN 'SAME'
            ELSE 'CHANGED' END AS status,
       o.old_sha1, n.new_sha1
FROM sdold o FULL OUTER JOIN sdnew n ON o.url = n.url
""",
        "novelty_curve": """
WITH nt AS (
  SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
ng AS (
  SELECT bucket,
         UNNEST(CASE WHEN len(toks) >= 8
                     THEN list_transform(generate_series(0, CAST(len(toks) - 8 AS BIGINT)),
                          i -> array_to_string(list_slice(toks, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' '))
                     ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM nt
),
nf AS (SELECT gram, MIN(bucket) AS first_bucket FROM ng GROUP BY gram),
na AS (
  SELECT g.bucket,
         CAST(COUNT(*) AS BIGINT) AS n_instances,
         CAST(SUM(CASE WHEN g.bucket = f.first_bucket THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM ng g JOIN nf f USING (gram) GROUP BY g.bucket
)
SELECT bucket, n_instances, n_novel,
       CAST((n_novel * CAST(1000000 AS BIGINT)) // n_instances AS BIGINT) AS novelty_ppm
FROM na
""",
        "embedding_pca": f"""
WITH {_pca_oracle_ctes(5)}
SELECT CAST(v.i AS INT) AS dim_i,
       c.cov AS var_milli2,
       CAST(v.val * (SELECT s FROM pcsign) AS BIGINT) AS pc1_milli
FROM pv5 v JOIN pccov c ON c.i = v.i AND c.j = v.i
""",
        "url_badwords": f"""
WITH {_URLS_CTE.strip()},
bwp AS (
  SELECT url || CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN '/casino-bonus-codes'
           WHEN 1 THEN '/research/article'
           WHEN 2 THEN '/free-download/win-prizes'
           WHEN 3 THEN '/viagra-pills-online'
           WHEN 4 THEN '/news/poker-tournament'
           ELSE '' END AS url
  FROM urls
)
SELECT url, {bw_score} AS badword_score,
       CASE WHEN {bw_score} >= {BLOCK_AT} THEN 'block'
            WHEN {bw_score} >= {REVIEW_AT} THEN 'review'
            ELSE 'ok' END AS verdict
FROM bwp
""",
        "capture_recapture": f"""
WITH {_URLS_CTE.strip()},
crm AS (
  SELECT CAST('0x' || substr(md5('a|' || url), 1, 15) AS BIGINT) % 10 < 3 AS am,
         CAST('0x' || substr(md5('b|' || url), 1, 15) AS BIGINT) % 10 < 3 AS bm
  FROM urls
),
cra AS (
  SELECT CAST(SUM(CASE WHEN am THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN bm THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN am AND bm THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(COUNT(*) AS BIGINT) AS n_true
  FROM crm
)
SELECT n1, n2, n_both,
       CAST(((n1 + 1) * (n2 + 1)) // (n_both + 1) - 1 AS BIGINT) AS chapman_est,
       n_true
FROM cra
""",
        "community_modularity": f"""
{link_base},
{_lpa_oracle_ctes(3)},
moddeg AS (SELECT src_host, CAST(SUM(weight) AS BIGINT) AS deg FROM lpasym GROUP BY src_host),
modm2 AS (SELECT GREATEST(CAST(COALESCE(SUM(weight), 0) AS BIGINT), 1) AS m2 FROM lpasym),
modtot AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_hosts,
         CAST(SUM(d.deg) AS BIGINT) AS tot_degree
  FROM moddeg d JOIN lpa3 l ON d.src_host = l.host GROUP BY l.label
),
modin AS (
  SELECT ls.label, CAST(SUM(e.weight) AS BIGINT) AS in_weight2
  FROM lpasym e
  JOIN lpa3 ls ON e.src_host = ls.host
  JOIN lpa3 ld ON e.dst_host = ld.host
  WHERE ls.label = ld.label GROUP BY ls.label
)
SELECT t.label AS community, t.n_hosts,
       COALESCE(i.in_weight2, 0) AS in_weight2, t.tot_degree,
       CAST((CAST(COALESCE(i.in_weight2, 0) AS HUGEINT) * 1000000) // (SELECT m2 FROM modm2)
            - (CAST(t.tot_degree AS HUGEINT) * t.tot_degree * 1000000)
              // (CAST((SELECT m2 FROM modm2) AS HUGEINT) * (SELECT m2 FROM modm2))
            AS BIGINT) AS q_contrib_micro
FROM modtot t LEFT JOIN modin i ON t.label = i.label
""",
        "reciprocal_links": f"""
{link_base},
rlh AS (
  SELECT DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
  FROM link_edges
  WHERE regexp_extract(src_url, '^https?://([^/]+)', 1)
        <> regexp_extract(dst_url, '^https?://([^/]+)', 1)
),
rlo AS (SELECT src_host AS host, CAST(COUNT(*) AS BIGINT) AS n_out FROM rlh GROUP BY src_host),
rlr AS (
  SELECT e.src_host AS host, CAST(COUNT(*) AS BIGINT) AS n_reciprocal
  FROM rlh e JOIN rlh r ON e.src_host = r.dst_host AND e.dst_host = r.src_host
  GROUP BY e.src_host
)
SELECT o.host, o.n_out,
       COALESCE(r.n_reciprocal, 0) AS n_reciprocal,
       CAST((COALESCE(r.n_reciprocal, 0) * CAST(1000000 AS BIGINT)) // o.n_out AS BIGINT) AS reciprocal_ppm
FROM rlo o LEFT JOIN rlr r ON o.host = r.host
""",
        "host_triangles": f"""
{link_base},
thh AS (
  SELECT DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1) AS sh,
         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dh
  FROM link_edges
  WHERE regexp_extract(src_url, '^https?://([^/]+)', 1)
        <> regexp_extract(dst_url, '^https?://([^/]+)', 1)
),
tund AS (SELECT DISTINCT least(sh, dh) AS a, greatest(sh, dh) AS b FROM thh),
tdeg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS host FROM tund UNION ALL SELECT b AS host FROM tund)
  GROUP BY host
),
tori AS (
  SELECT CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN u.b ELSE u.a END AS v,
         CASE WHEN (da.degree, u.a) < (db.degree, u.b) THEN db.degree ELSE da.degree END AS dv
  FROM tund u
  JOIN tdeg da ON da.host = u.a
  JOIN tdeg db ON db.host = u.b
),
ttri AS (
  SELECT e1.u AS u, e1.v AS v1, e2.v AS v2
  FROM tori e1
  JOIN tori e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
  WHERE EXISTS (SELECT 1 FROM tori c WHERE c.u = e1.v AND c.v = e2.v)
),
tper AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT u AS host FROM ttri
        UNION ALL SELECT v1 AS host FROM ttri
        UNION ALL SELECT v2 AS host FROM ttri)
  GROUP BY host
)
SELECT d.host, d.degree,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       CAST((d.degree * (d.degree - 1)) // 2 AS BIGINT) AS wedges,
       CASE WHEN d.degree >= 2
            THEN CAST(COALESCE(p.triangles, 0) * CAST(1000000 AS BIGINT)
                      // ((d.degree * (d.degree - 1)) // 2) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS clustering_ppm
FROM tdeg d LEFT JOIN tper p ON p.host = d.host
""",
        "dust_rules": f"""
WITH {_URLS_CTE.strip()},
dcaps AS (
  SELECT url, md5('dust:' || CAST(o_orderkey AS VARCHAR)) AS fp, o_orderkey, site_id
  FROM urls
),
dlog AS (
  SELECT url, fp FROM dcaps
  UNION ALL SELECT url || '?utm_source=feed' AS url, fp FROM dcaps WHERE o_orderkey % 3 = 0
  UNION ALL SELECT url || '/' AS url, fp FROM dcaps WHERE o_orderkey % 4 = 0
  UNION ALL SELECT url || '/index.html' AS url, fp FROM dcaps WHERE o_orderkey % 5 = 0
  UNION ALL SELECT replace(url, 'https://', 'https://www.') AS url, fp FROM dcaps WHERE site_id % 7 = 0
  UNION ALL SELECT replace(url, '.example.com/', '.example.com:8080/') AS url, fp FROM dcaps WHERE o_orderkey % 11 = 0
),
dcanon AS (SELECT fp, MIN(url) AS canon_url FROM dlog GROUP BY fp),
dpairs AS (
  SELECT DISTINCT c.canon_url, l.url AS alias_url
  FROM dlog l JOIN dcanon c ON c.fp = l.fp
  WHERE l.url <> c.canon_url
),
dcls AS (
  SELECT canon_url,
    CASE
      WHEN regexp_replace(alias_url, '\\?.*$', '') = canon_url AND contains(alias_url, '?') THEN 'strip_query'
      WHEN regexp_replace(alias_url, '/+$', '') = canon_url THEN 'trailing_slash'
      WHEN regexp_replace(alias_url, '/index\\.html$', '') = canon_url THEN 'index_file'
      WHEN regexp_replace(alias_url, '^(https?://)www\\.', '\\1') = canon_url THEN 'www_alias'
      WHEN lower(alias_url) = lower(canon_url) AND alias_url <> canon_url THEN 'case_fold'
      ELSE 'other' END AS rule
  FROM dpairs
)
SELECT regexp_extract(canon_url, '^https?://(?:www\\.)?([^/]+)', 1) AS host,
       rule,
       CAST(COUNT(*) AS BIGINT) AS support,
       COUNT(*) >= 2 AS actionable
FROM dcls
GROUP BY 1, 2
""",
        "dust_apply": f"""
WITH {_URLS_CTE.strip()},
dcaps AS (
  SELECT url, md5('dust:' || CAST(o_orderkey AS VARCHAR)) AS fp, o_orderkey, site_id
  FROM urls
),
dlog AS (
  SELECT url, fp FROM dcaps
  UNION ALL SELECT url || '?utm_source=feed' AS url, fp FROM dcaps WHERE o_orderkey % 3 = 0
  UNION ALL SELECT url || '/' AS url, fp FROM dcaps WHERE o_orderkey % 4 = 0
  UNION ALL SELECT url || '/index.html' AS url, fp FROM dcaps WHERE o_orderkey % 5 = 0
  UNION ALL SELECT replace(url, 'https://', 'https://www.') AS url, fp FROM dcaps WHERE site_id % 7 = 0
  UNION ALL SELECT replace(url, '.example.com/', '.example.com:8080/') AS url, fp FROM dcaps WHERE o_orderkey % 11 = 0
),
dcanon AS (SELECT fp, MIN(url) AS canon_url FROM dlog GROUP BY fp),
dpairs AS (
  SELECT DISTINCT c.canon_url, l.url AS alias_url
  FROM dlog l JOIN dcanon c ON c.fp = l.fp
  WHERE l.url <> c.canon_url
),
dcls AS (
  SELECT canon_url,
    CASE
      WHEN regexp_replace(alias_url, '\\?.*$', '') = canon_url AND contains(alias_url, '?') THEN 'strip_query'
      WHEN regexp_replace(alias_url, '/+$', '') = canon_url THEN 'trailing_slash'
      WHEN regexp_replace(alias_url, '/index\\.html$', '') = canon_url THEN 'index_file'
      WHEN regexp_replace(alias_url, '^(https?://)www\\.', '\\1') = canon_url THEN 'www_alias'
      WHEN lower(alias_url) = lower(canon_url) AND alias_url <> canon_url THEN 'case_fold'
      ELSE 'other' END AS rule
  FROM dpairs
),
dsupp AS (
  SELECT regexp_extract(canon_url, '^https?://(?:www\\.)?([^/]+)', 1) AS host,
         rule, COUNT(*) AS support
  FROM dcls GROUP BY 1, 2
),
dflags AS (
  SELECT host,
         bool_or(rule = 'strip_query' AND support >= 2) AS r_sq,
         bool_or(rule = 'trailing_slash' AND support >= 2) AS r_ts,
         bool_or(rule = 'index_file' AND support >= 2) AS r_if,
         bool_or(rule = 'www_alias' AND support >= 2) AS r_wa
  FROM dsupp GROUP BY host
),
dfront AS (SELECT DISTINCT url FROM dlog),
dapp AS (
  SELECT f.url,
         COALESCE(g.r_sq, FALSE) AS r_sq, COALESCE(g.r_ts, FALSE) AS r_ts,
         COALESCE(g.r_if, FALSE) AS r_if, COALESCE(g.r_wa, FALSE) AS r_wa
  FROM dfront f
  LEFT JOIN dflags g
    ON regexp_extract(f.url, '^https?://(?:www\\.)?([^/]+)', 1) = g.host
),
ds1 AS (SELECT url, r_ts, r_if, r_wa,
               CASE WHEN r_sq THEN regexp_replace(url, '\\?.*$', '') ELSE url END AS c FROM dapp),
ds2 AS (SELECT url, r_if, r_wa,
               CASE WHEN r_ts THEN regexp_replace(c, '/+$', '') ELSE c END AS c FROM ds1),
ds3 AS (SELECT url, r_wa,
               CASE WHEN r_if THEN regexp_replace(c, '/index\\.html$', '') ELSE c END AS c FROM ds2),
ds4 AS (SELECT url,
               CASE WHEN r_wa THEN regexp_replace(c, '^(https?://)www\\.', '\\1') ELSE c END AS c FROM ds3)
SELECT url, c AS canon_url, c <> url AS rewritten FROM ds4
""",
        "weighted_sample": """
WITH draws AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS weight,
         (CAST(CAST('0x' || substr(md5('wsample:42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
  FROM documents
  WHERE length(text) > 0
)
SELECT doc_id, weight,
       CAST(round(1000000.0 * ln(u) / CAST(weight AS DOUBLE)) AS BIGINT) AS key_micro
FROM draws
ORDER BY key_micro DESC, doc_id
LIMIT 200
""",
        "histogram_quantiles": """
WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
hist AS (
  SELECT event_type,
         CAST(length(CAST(v AS VARCHAR)) - 1 AS INT) AS e,
         CAST(CASE WHEN v < 10 THEN v
                   ELSE CAST(substr(CAST(v AS VARCHAR), 1, 2) AS INT)
              END AS INT) AS sub,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, e, sub,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY e, sub
                        ROWS UNBOUNDED PRECEDING) AS c,
         SUM(cnt) OVER (PARTITION BY event_type) AS n,
         CASE WHEN e = 0 THEN CAST(sub AS BIGINT)
              ELSE CAST(sub || repeat('0', e - 1) AS BIGINT) END AS low
  FROM hist
),
qs(q) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES (0.5), (0.9), (0.99)) t(x))
SELECT c.event_type, qs.q,
       CAST(MAX(c.n) AS BIGINT) AS n,
       CAST(MIN(c.low) AS BIGINT) AS est
FROM cum c CROSS JOIN qs
WHERE c.c >= greatest(ceil(qs.q * c.n), 1)
GROUP BY c.event_type, qs.q
""",
        "hyperball_centrality": f"""
{link_base},
{_hyperball_oracle_ctes(3, 8)}
SELECT e0.host, e0.ball_0, e1.ball_1, e2.ball_2, e3.ball_3,
       CAST(
         (CAST(round(e1.ball_1 * 100) AS BIGINT) - CAST(round(e0.ball_0 * 100) AS BIGINT)) * 1000000 // 100
         + (CAST(round(e2.ball_2 * 100) AS BIGINT) - CAST(round(e1.ball_1 * 100) AS BIGINT)) * 1000000 // 200
         + (CAST(round(e3.ball_3 * 100) AS BIGINT) - CAST(round(e2.ball_2 * 100) AS BIGINT)) * 1000000 // 300
       AS BIGINT) AS harmonic_micro
FROM hbest0 e0
JOIN hbest1 e1 USING (host)
JOIN hbest2 e2 USING (host)
JOIN hbest3 e3 USING (host)
""",
        "incremental_pagerank": f"""
{link_base},
edges_old AS (
  SELECT * FROM link_edges
  WHERE substr(md5(src_url || '|' || dst_url), 1, 1) <> 'f'
),
{_pagerank_oracle_ctes(3, tag="_pold", edges_src="edges_old")},
{_pagerank_oracle_ctes(2, tag="_pinc", edges_src="link_edges", init_ranks_cte="pr_pold3")}
SELECT host, rank FROM pr_pinc2
""",
        "frontier_rank_blend": f"""
{link_base},
{_bfs_oracle_ctes(4)},
{_pagerank_oracle_ctes(5)},
pctl AS (
  SELECT host,
         CAST(FLOOR((RANK() OVER (ORDER BY rank, host) - 1) * 100
              / GREATEST((SELECT n FROM prn) - 1, 1)) AS INT) AS host_pctl
  FROM pr5
)
SELECT u.url, u.host, u.priority,
       CAST(COALESCE(b.depth, 5) AS INT) AS link_depth,
       COALESCE(p.host_pctl, 0) AS host_pctl,
       u.priority * 10000 + (5 - CAST(COALESCE(b.depth, 5) AS INT)) * 1000
         + COALESCE(p.host_pctl, 0) AS crawl_score
FROM urls u
LEFT JOIN bfs4 b ON u.url = b.url
LEFT JOIN pctl p ON u.host = p.host
""",
        "hll_host_cardinality": hll_oracle_sql(
            f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls",
            "url",
            ["host"],
            p=6,
        ),
        "kmv_host_cardinality": kmv_oracle_sql(
            f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls",
            "url",
            ["host"],
            k=64,
        ),
        "kmv_overlap": kmv_intersection_oracle_sql(
            f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls WHERE o_orderkey % 2 = 0",
            f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls WHERE o_orderkey % 3 = 0",
            "url",
            ["host"],
            k=64,
        ),
        "sb_lm_scores": sb_oracle_sql("SELECT doc_id, text FROM documents"),
        "kn_lm_scores": kn_oracle_sql("SELECT doc_id, text FROM documents"),
        "cdx_collapse": f"""
WITH {_CAPTURES_CTE.strip()},
b AS (SELECT url, datetime, status_code, mimetype,
             substr(datetime, 1, 8) AS bucket
      FROM captures),
f AS (SELECT url, bucket, min(datetime) AS datetime,
             CAST(COUNT(*) AS BIGINT) AS n_collapsed
      FROM b GROUP BY url, bucket)
SELECT f.url, f.bucket, f.datetime, b.status_code, b.mimetype, f.n_collapsed
FROM f JOIN b ON b.url = f.url AND b.datetime = f.datetime
""",
        "feed_poll": f"""
WITH {_URLS_CTE.strip()},
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_entries,
         min(o_orderdate) AS mn, max(o_orderdate) AS mx
  FROM urls WHERE site_id < 10 GROUP BY host
),
calc AS (
  SELECT host, n_entries,
         CAST(date_diff('day', mn, mx) + 1 AS BIGINT) AS span_days,
         CAST(date_diff('day', mx, DATE '1998-12-31') AS BIGINT) AS newest_age_days
  FROM agg
)
SELECT host, n_entries, span_days,
       CAST((100 * n_entries) // span_days AS BIGINT) AS rate_x100,
       newest_age_days,
       CAST(LEAST(168, GREATEST(1, 2400 // GREATEST((100 * n_entries) // span_days, 1))) AS BIGINT) AS poll_hours
FROM calc
""",
        "arc2warc": """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents WHERE doc_id < 200
),
f AS (
  SELECT doc_id,
         'https://site' || CAST(CAST(doc_id % 10 AS INT) AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         '20200101' || lpad(CAST(CAST(doc_id % 240000 AS INT) AS VARCHAR), 6, '0') AS date14,
         'HTTP/1.1 200 OK' || chr(10) || chr(10) || text AS payload
  FROM d
),
g AS (
  SELECT doc_id, url, payload,
         substr(date14,1,4) || '-' || substr(date14,5,2) || '-' || substr(date14,7,2)
           || 'T' || substr(date14,9,2) || ':' || substr(date14,11,2)
           || ':' || substr(date14,13,2) || 'Z' AS iso
  FROM f
),
h AS (
  SELECT doc_id, url, iso, payload,
         'urn:md5:' || md5(url || ' ' || iso) AS rid,
         CAST(strlen(payload) AS BIGINT) AS cl
  FROM g
)
SELECT doc_id, url, iso AS warc_date, rid AS record_id, cl AS content_length,
       CAST(strlen(
         'WARC/1.0' || chr(13) || chr(10)
         || 'WARC-Type: resource' || chr(13) || chr(10)
         || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
         || 'WARC-Date: ' || iso || chr(13) || chr(10)
         || 'WARC-Record-ID: <' || rid || '>' || chr(13) || chr(10)
         || 'Content-Type: text/html' || chr(13) || chr(10)
         || 'Content-Length: ' || CAST(cl AS VARCHAR) || chr(13) || chr(10)
         || chr(13) || chr(10) || payload
         || chr(13) || chr(10) || chr(13) || chr(10)
       ) AS BIGINT) AS record_len
FROM h
""",
        "cdxj_roundtrip": f"""
WITH {_CAPTURES_CTE.strip()}
SELECT 'org,example,stream)/u/' || regexp_extract(url, '/u/(\\d+)$', 1) AS surt,
       datetime, url, mimetype,
       CAST(status_code AS INT) AS http_status,
       sha1hex AS sha1b32,
       CAST(warc_csize AS BIGINT) AS warc_csize,
       CAST(event_id % 100000 AS BIGINT) AS warc_offset,
       warc_path
FROM captures
""",
        "warc_segments": """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         strlen(text) AS bl, length(text) AS L,
         CAST(floor(length(text) / 3) AS INT) AS t
  FROM documents
),
parts AS (
  SELECT doc_id,
         substr(text, 1, t) AS a,
         substr(text, t + 1, t) AS b,
         substr(text, 2 * t + 1, L) AS c,
         bl, (doc_id % 13 = 0) AS gap, (doc_id % 17 = 0) AS mm
  FROM d
)
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS origin_id,
       CAST(CASE WHEN gap THEN 2 ELSE 3 END AS BIGINT) AS n_segments,
       CASE WHEN gap THEN a || c ELSE a || b || c END AS payload,
       CAST(bl + CASE WHEN mm THEN 1 ELSE 0 END AS BIGINT) AS total_declared,
       CAST(strlen(CASE WHEN gap THEN a || c ELSE a || b || c END) AS BIGINT) AS total_actual,
       CASE WHEN gap THEN 'gap'
            WHEN mm THEN 'length_mismatch'
            ELSE 'complete' END AS status
FROM parts
""",
        "timemap": timemap_oracle_sql(
            f"WITH {_CAPTURES_CTE.strip()} SELECT url, datetime FROM captures"
        ),
        "link_rot": f"""
WITH {_CAPTURES_CTE.strip()},
fl AS (
  SELECT url, min(datetime) AS fdt, max(datetime) AS ldt
  FROM captures GROUP BY url
),
pairs AS (
  SELECT cf.status_code AS first_status, cl.status_code AS last_status
  FROM fl
  JOIN captures cf ON cf.url = fl.url AND cf.datetime = fl.fdt
  JOIN captures cl ON cl.url = fl.url AND cl.datetime = fl.ldt
),
agg AS (
  SELECT first_status, last_status, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM pairs GROUP BY first_status, last_status
)
SELECT first_status, last_status, n_urls,
       CAST(1000000 * n_urls // (SELECT SUM(n_urls) FROM agg) AS BIGINT) AS share_ppm
FROM agg
""",
        "purge_propagation": """
WITH purge AS (SELECT CAST(doc_id AS BIGINT) AS k FROM documents WHERE doc_id % 17 = 0),
t_docs AS (SELECT CAST(doc_id AS BIGINT) AS k FROM documents),
t_emb AS (SELECT CAST(vec_id AS BIGINT) AS k FROM embeddings),
t_packed AS (SELECT CAST(doc_id AS BIGINT) AS k FROM documents WHERE doc_id % 3 <> 0),
rows_out AS (
  SELECT 'documents' AS table_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_docs) AS n_before,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_docs WHERE k IN (SELECT k FROM purge)) AS n_purged
  UNION ALL
  SELECT 'embeddings',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_emb),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_emb WHERE k IN (SELECT k FROM purge))
  UNION ALL
  SELECT 'packed',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_packed),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t_packed WHERE k IN (SELECT k FROM purge))
)
SELECT table_name, n_before, n_purged,
       CAST(n_before - n_purged AS BIGINT) AS n_after
FROM rows_out ORDER BY table_name
""",
        "temporal_split": """
SELECT CASE WHEN CAST(o_orderdate AS VARCHAR) < '1995-10-03' THEN 'train'
            WHEN CAST(o_orderdate AS VARCHAR) >= '1996-01-01' THEN 'test'
            ELSE 'embargo' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       min(CAST(o_orderdate AS VARCHAR)) AS min_ts,
       max(CAST(o_orderdate AS VARCHAR)) AS max_ts
FROM orders GROUP BY 1 ORDER BY split
""",
        "feed_discovery": f"""
WITH {_URLS_CTE.strip()},
f AS (
  SELECT o_orderkey, url, host, CAST(o_orderkey % 4 AS INT) AS m
  FROM urls WHERE site_id < 8
)
SELECT o_orderkey, url,
       CASE m WHEN 0 THEN 'https://' || host || '/feed.xml'
              WHEN 1 THEN 'https://' || host || '/atom.xml'
              WHEN 2 THEN 'https://' || host || '/order/rss'
       END AS feed_url,
       CASE m WHEN 0 THEN 'rss' WHEN 1 THEN 'atom' WHEN 2 THEN 'rss' END AS kind
FROM f WHERE m < 3
""",
        "domain_quality": wilson_rollup_oracle_sql(
            "SELECT 'b' || CAST(CAST(doc_id % 23 AS INT) AS VARCHAR) || 'site.com' AS domain, "
            "len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50 AS passed "
            "FROM documents",
            min_docs=3,
        ),
        "sentence_stats": sentence_stats_oracle_sql(
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "'Dr. J. Smith et al. found e.g. values near 3.14 and 2.71! ' || "
            "regexp_replace(text, 'window', 'end. Window', 'g') AS text "
            "FROM documents"
        ),
        "oai_harvest": f"""
WITH {_URLS_CTE.strip()},
recs AS (
  SELECT host,
         CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY o_orderkey) - 1 AS INT) AS seq,
         'oai:' || host || ':' || CAST(o_orderkey AS VARCHAR) AS identifier,
         CAST(o_orderdate AS VARCHAR) AS datestamp,
         'set' || CAST(CAST(o_orderkey % 3 AS INT) AS VARCHAR) AS setspecs,
         (o_orderkey % 11 = 0) AS deleted,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE 'Order ' || CAST(o_orderkey AS VARCHAR) END AS title
  FROM urls WHERE site_id < 5
)
SELECT * FROM recs
WHERE datestamp >= '1994-01-01' AND datestamp <= '1995-12-31'
  AND setspecs = 'set1'
""",
        "robots_cache": """
WITH ev AS (
  SELECT 'h' || CAST(CAST(user_id % 20 AS INT) AS VARCHAR) || '.example.net' AS host,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         event_id
  FROM events
),
robots AS (SELECT host, epoch_s AS rts FROM ev WHERE event_id % 97 = 0),
cls AS (
  SELECT f.host, f.epoch_s, r.rts
  FROM ev f ASOF LEFT JOIN robots r ON f.host = r.host AND r.rts <= f.epoch_s
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(CASE WHEN rts IS NOT NULL AND epoch_s - rts <= 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh,
       CAST(SUM(CASE WHEN rts IS NOT NULL AND epoch_s - rts > 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
       CAST(SUM(CASE WHEN rts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss
FROM cls GROUP BY host ORDER BY host
""",
        # relational twin: derives each page's declared canonical from
        # the same construction arithmetic (never re-runs the regex)
        "canonical_aliases": f"""
WITH {_URLS_CTE.strip()}
SELECT CASE WHEN o_orderkey % 3 = 0 THEN url || '?utm_source=feed' ELSE url END AS url,
       url AS canonical_url,
       o_orderkey % 3 = 1 AS is_self
FROM urls
WHERE o_orderkey % 3 IN (0, 1)
""",
        "weighted_sample_stratified": """
WITH draws AS (
  SELECT doc_id, lang,
         CAST(length(text) AS BIGINT) AS weight,
         (CAST(CAST('0x' || substr(md5('wsample:42:' || CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
  FROM documents
  WHERE length(text) > 0
),
keyed AS (
  SELECT doc_id, lang, weight,
         CAST(round(1000000.0 * ln(u) / CAST(weight AS DOUBLE)) AS BIGINT) AS key_micro
  FROM draws
)
SELECT doc_id, lang, weight, key_micro
FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY key_micro DESC, doc_id ASC) AS rn
      FROM keyed)
WHERE rn <= 20
""",
        "cms_part_counts": f"""
WITH stream AS (
  SELECT 'https://site' || CAST(CAST(l_partkey % 50 AS INT) AS VARCHAR)
         || '.example.com/part/' || CAST(l_partkey AS VARCHAR) AS url
  FROM lineitem
),
probes AS (
  SELECT 'https://site' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR)
         || '.example.com/part/' || CAST(p_partkey AS VARCHAR) AS url
  FROM part WHERE p_partkey <= 100
),
truth AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS true_count FROM stream GROUP BY url
),
est AS (
  SELECT * FROM ({cms_oracle_sql("SELECT url FROM stream", "url", "SELECT url FROM probes", "url")})
)
SELECT p.url, COALESCE(t.true_count, 0) AS true_count, e.cms_estimate
FROM probes p
LEFT JOIN truth t ON p.url = t.url
JOIN est e ON p.url = e.url
""",
        "ucb_frontier": ucb_oracle_sql(
            f"""
WITH {_URLS_CTE.strip()}
SELECT host, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS success FROM urls
""".strip(),
            top_k=10,
        ),
        "pagination_gaps": f"""
WITH {_URLS_CTE.strip()},
mixed AS (
  SELECT host, url FROM urls
  UNION ALL
  SELECT 'site' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR) || '.example.com' AS host,
         'https://site' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR)
         || '.example.com/part/' || CAST(p_partkey AS VARCHAR) AS url
  FROM part
  UNION ALL
  SELECT 'news.example.com' AS host,
         'https://news.example.com/page/' || CAST(n_nationkey AS VARCHAR) AS url
  FROM nation
),
shaped AS (
  SELECT host,
         regexp_replace(regexp_replace(regexp_replace(
           regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$', 1),
           '[0-9a-fA-F]{{8,}}', 'H', 'g'),
           '[0-9]+', 'N', 'g'),
           '=[^&#]*', '=*', 'g') AS template,
         regexp_extract(
           regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$', 1),
           '([0-9]+)', 1) AS numtxt
  FROM mixed
),
ok AS (
  SELECT host, template, CAST(numtxt AS BIGINT) AS page_n
  FROM shaped
  WHERE length(regexp_replace(template, '[^N]', '', 'g')) = 1
    AND numtxt <> '' AND length(numtxt) <= 18
),
g AS (
  SELECT host, template,
         CAST(COUNT(DISTINCT page_n) AS BIGINT) AS n_pages,
         CAST(MIN(page_n) AS BIGINT) AS min_page,
         CAST(MAX(page_n) AS BIGINT) AS max_page
  FROM ok GROUP BY host, template
)
SELECT host, template, n_pages, min_page, max_page,
       CAST(max_page - min_page + 1 - n_pages AS BIGINT) AS n_missing,
       max_page - min_page + 1 = n_pages AS complete
FROM g WHERE n_pages >= 3
""",
        "retry_after": """
WITH ra AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(event_id % 3 AS INT) AS form,
         CASE CAST(event_id % 3 AS INT)
           WHEN 0 THEN CAST(event_id % 120 + 1 AS VARCHAR)
           WHEN 1 THEN strftime(ts + (event_id % 90 + 10) * INTERVAL 1 SECOND,
                                '%a, %d %b %Y %H:%M:%S') || ' GMT'
           ELSE 'soon' END AS retry_after,
         CAST(floor(epoch(ts)) AS BIGINT) AS now_epoch
  FROM events
),
parsed AS (
  SELECT *,
         try_strptime(regexp_replace(regexp_replace(retry_after, ' GMT$', ''),
                                     '^[A-Za-z]{3}, ', ''),
                      '%d %b %Y %H:%M:%S') AS dt
  FROM ra
)
SELECT event_id, form, retry_after,
       CAST(CASE WHEN regexp_matches(retry_after, '^[0-9]{1,9}$')
              THEN CAST(retry_after AS BIGINT)
            WHEN dt IS NOT NULL
              THEN greatest(CAST(floor(epoch(dt)) AS BIGINT) - now_epoch,
                            CAST(0 AS BIGINT))
            ELSE NULL END AS BIGINT) AS delay_s
FROM parsed
""",
        "host_branching": f"""
WITH {_URLS_CTE.strip()},
hbmixed AS (
  SELECT host, url FROM urls
  UNION ALL
  SELECT 'site' || CAST(CAST(l_suppkey % 20 AS INT) AS VARCHAR) || '.example.com' AS host,
         'https://site' || CAST(CAST(l_suppkey % 20 AS INT) AS VARCHAR)
         || '.example.com/c' || CAST(CAST(l_partkey % 7 AS INT) AS VARCHAR)
         || '/s' || CAST(CAST(l_suppkey % 5 AS INT) AS VARCHAR)
         || '/item' || CAST(l_orderkey AS VARCHAR) AS url
  FROM lineitem
),
hbsegs AS (
  SELECT host,
         list_filter(string_split(
           regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/]*(/[^?#]*)?', 1),
           '/'), x -> x <> '') AS segs
  FROM hbmixed
),
hbex AS (
  SELECT DISTINCT host, CAST(t.d AS BIGINT) AS depth,
         array_to_string(segs[1:CAST(t.d AS INT)], '/') AS prefix
  FROM hbsegs, UNNEST(generate_series(1, least(len(segs), 8))) AS t(d)
  WHERE array_to_string(segs[1:CAST(t.d AS INT)], '/') <> ''
),
hbnodes AS (
  SELECT host, depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM hbex GROUP BY host, depth
),
hbparents AS (
  SELECT host, depth, CAST(COUNT(*) AS BIGINT) AS parent_nodes FROM (
    SELECT DISTINCT host, depth,
           array_to_string(string_split(prefix, '/')[1:CAST(depth - 1 AS INT)], '/') AS parent
    FROM hbex WHERE depth > 1
  ) GROUP BY host, depth
)
SELECT n.host, n.depth, n.n_nodes,
       COALESCE(p.parent_nodes, 1) AS parent_nodes,
       CAST(CAST(1000000 AS BIGINT) * n.n_nodes
            // greatest(COALESCE(p.parent_nodes, 1), 1) AS BIGINT) AS branching_ppm
FROM hbnodes n LEFT JOIN hbparents p ON n.host = p.host AND n.depth = p.depth
""",
        "sketch_accuracy": f"""
WITH skt AS (
  WITH {_URLS_CTE.strip()}
  SELECT host, CAST(COUNT(DISTINCT url) AS BIGINT) AS true_distinct FROM urls GROUP BY host
),
skh AS (
  SELECT host, hll_estimate
  FROM ({hll_oracle_sql(f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls", "url", ["host"], p=6)})
),
skk AS (
  SELECT host, est_distinct
  FROM ({kmv_oracle_sql(f"WITH {_URLS_CTE.strip()} SELECT host, url FROM urls", "url", ["host"], k=64)})
),
skj AS (
  SELECT t.host, t.true_distinct, h.hll_estimate, k.est_distinct,
         CAST(round(h.hll_estimate * 100) AS BIGINT) AS hx
  FROM skt t JOIN skh h USING (host) JOIN skk k USING (host)
)
SELECT host, true_distinct, hll_estimate,
       CAST(est_distinct AS BIGINT) AS kmv_estimate,
       CAST(CAST(1000000 AS BIGINT) * abs(hx - true_distinct * 100)
            // (true_distinct * 100) AS BIGINT) AS hll_err_ppm,
       CAST(CAST(1000000 AS BIGINT) * abs(est_distinct - true_distinct)
            // true_distinct AS BIGINT) AS kmv_err_ppm
FROM skj
""",
        "frontier_aging": f"""
WITH {_URLS_CTE.strip()},
aged AS (
  SELECT url, host, priority, site_id,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS age_days
  FROM urls
),
a2 AS (
  SELECT *,
         CAST(CAST(priority AS BIGINT) * 100
              + least(age_days // 4, CAST(300 AS BIGINT)) AS BIGINT) AS aged_priority,
         CAST(1 + (site_id % 4) AS BIGINT) AS q
  FROM aged
),
rk AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url) - 1 AS rp,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY aged_priority DESC, url) - 1 AS ra
  FROM a2
)
SELECT url, host, priority, age_days, aged_priority,
       CAST(rp // q AS BIGINT) AS round_pure,
       CAST(ra // q AS BIGINT) AS round_aged,
       ra < rp AS promoted
FROM rk
""",
        "pagination_fill": """
WITH pfmixed AS (
  SELECT 'news.example.com' AS host,
         'https://news.example.com/page/' || CAST(n_nationkey AS VARCHAR) AS url
  FROM nation WHERE n_nationkey % 7 <> 3
  UNION ALL
  SELECT 'news.example.com',
         'https://news.example.com/cat/' || CAST(r_regionkey * 3 AS VARCHAR)
  FROM region
),
pfshaped AS (
  SELECT host,
         regexp_replace(regexp_replace(regexp_replace(
           regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$', 1),
           '[0-9a-fA-F]{8,}', 'H', 'g'),
           '[0-9]+', 'N', 'g'),
           '=[^&#]*', '=*', 'g') AS template,
         regexp_extract(
           regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$', 1),
           '([0-9]+)', 1) AS numtxt
  FROM pfmixed
),
pfok AS (
  SELECT host, template, CAST(numtxt AS BIGINT) AS page_n
  FROM pfshaped
  WHERE numtxt <> '' AND length(numtxt) <= 18
),
pfg AS (
  SELECT host, template,
         CAST(COUNT(DISTINCT page_n) AS BIGINT) AS n_pages,
         CAST(MIN(page_n) AS BIGINT) AS min_page,
         CAST(MAX(page_n) AS BIGINT) AS max_page
  FROM pfok
  WHERE length(regexp_replace(template, '[^N]', '', 'g')) = 1
  GROUP BY host, template
  HAVING COUNT(DISTINCT page_n) >= 3
),
pfbounded AS (
  SELECT * FROM pfg
  WHERE max_page - min_page + 1 - n_pages BETWEEN 1 AND 200
    AND max_page - min_page < 10000
    AND template NOT LIKE '%H%'
),
pffull AS (
  SELECT host, template,
         CAST(UNNEST(generate_series(min_page, max_page)) AS BIGINT) AS page_n
  FROM pfbounded
),
pfmissing AS (
  SELECT f.host, f.template, f.page_n
  FROM pffull f
  LEFT JOIN (SELECT DISTINCT host, template, page_n FROM pfok) o
    ON f.host = o.host AND f.template = o.template AND f.page_n = o.page_n
  WHERE o.page_n IS NULL
)
SELECT host, template, page_n,
       'https://' || host || replace(template, 'N', CAST(page_n AS VARCHAR)) AS url
FROM pfmissing
""",
        "alloc_fairness": f"""
WITH dem AS (
  WITH {_URLS_CTE.strip()}
  SELECT host, CAST(COUNT(*) AS BIGINT) AS demand FROM urls GROUP BY host
)
SELECT 'demand' AS series, n_keys, total, gini_ppm
FROM ({gini_oracle_sql("SELECT host, demand FROM dem", value_col="demand")})
UNION ALL
SELECT 'alloc' AS series, n_keys, total, gini_ppm
FROM ({gini_oracle_sql(budget_oracle_sql("SELECT host, demand FROM dem", 10_000))})
""",
        "revalidation_savings": f"""
WITH {_corpus_cdx_ranked_cte()},
caps AS (
  SELECT c.url,
         c.mimetype AS grp,
         CAST(floor(epoch(e.ts)) AS BIGINT) AS ep,
         CASE WHEN e.event_id % 3 = 0 THEN md5(c.sha1hex || ':v2')
              ELSE c.sha1hex END AS dg,
         CAST(c.warc_csize AS BIGINT) AS sz
  FROM events e JOIN cdxr c ON e.event_id % 256 = c.rid
),
flagged AS (
  SELECT grp, sz,
         LAG(dg) OVER (PARTITION BY url ORDER BY ep, dg) AS prev,
         dg
  FROM caps
),
g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n_caps,
         CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_recaps,
         CAST(SUM(CASE WHEN prev = dg THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         CAST(SUM(CASE WHEN prev = dg THEN sz ELSE 0 END) AS BIGINT) AS bytes_saved
  FROM flagged GROUP BY grp
)
SELECT grp, n_caps, n_recaps, n_unchanged, bytes_saved,
       CAST(CASE WHEN n_recaps = 0 THEN 0
            ELSE CAST(1000000 AS BIGINT) * n_unchanged // n_recaps END AS BIGINT)
         AS unchanged_ppm
FROM g
""",
        "url_traps": f"""
WITH {_URLS_CTE.strip()},
mixed AS (
  SELECT host, url FROM urls
  UNION ALL
  SELECT 'site' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR) || '.example.com' AS host,
         'https://site' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR)
         || '.example.com/part/' || CAST(p_partkey AS VARCHAR) AS url
  FROM part
),
shaped AS (
  SELECT host, url,
         regexp_replace(regexp_replace(regexp_replace(lower(url),
           '[0-9a-fA-F]{{8,}}', 'H', 'g'),
           '[0-9]+', 'N', 'g'),
           '=[^&#]*', '=*', 'g') AS template
  FROM mixed
)
SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls,
       MIN(url) AS min_url, COUNT(*) > 100 AS is_trap
FROM shaped GROUP BY host, template
""",
        "temperature_mix": f"""
WITH {_URLS_CTE.strip()},
counts AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs FROM urls GROUP BY host),
wtd AS (SELECT host, n_docs, pow(CAST(n_docs AS DOUBLE), 0.7) AS w FROM counts),
tot AS (SELECT SUM(w) AS tw FROM wtd),
rates AS (
  SELECT host, n_docs,
         CAST(round(5000.0 * w / tw) AS BIGINT) AS target,
         least(1.0, CAST(CAST(round(5000.0 * w / tw) AS BIGINT) AS DOUBLE) / n_docs) AS rate
  FROM wtd CROSS JOIN tot
),
draws AS (
  SELECT u.host,
         CAST(CAST('0x' || substr(md5('mix:42:' || u.url), 1, 8) AS UBIGINT) AS DOUBLE)
           / 4294967296.0 AS uu,
         r.rate
  FROM urls u JOIN rates r ON u.host = r.host
),
kept AS (
  SELECT host, CAST(SUM(CASE WHEN uu < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
  FROM draws GROUP BY host
)
SELECT r.host, r.n_docs, r.target, round(r.rate, 9) AS rate,
       COALESCE(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k ON r.host = k.host
""",
        "sitemap_roundtrip": f"""
WITH {_URLS_CTE.strip()}
SELECT host,
       CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY o_orderkey) - 1 AS INT) AS seq,
       url AS loc,
       CAST(o_orderdate AS VARCHAR) AS lastmod,
       '0.' || CAST(priority AS VARCHAR) AS priority,
       'url' AS kind
FROM urls WHERE site_id < 5
""",
        "feed_roundtrip": f"""
WITH {_URLS_CTE.strip()}
SELECT host,
       CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY o_orderkey) - 1 AS INT) AS seq,
       url AS link,
       'Order ' || CAST(o_orderkey AS VARCHAR) AS title,
       CAST(o_orderdate AS VARCHAR) AS published,
       'order-' || CAST(o_orderkey AS VARCHAR) AS entry_id,
       CASE WHEN site_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind
FROM urls WHERE site_id < 6
""",
        "cms_heavy_hitters": f"""
WITH stream AS (
  SELECT CASE WHEN l_partkey % 7 = 0
              THEN 'https://hot.example.com/' || CAST(CAST(l_partkey % 3 AS INT) AS VARCHAR)
              ELSE 'https://site' || CAST(CAST(l_partkey % 50 AS INT) AS VARCHAR)
                   || '.example.com/part/' || CAST(l_partkey AS VARCHAR)
         END AS url
  FROM lineitem
),
thresh AS (SELECT CAST(FLOOR(0.01 * COUNT(*)) AS BIGINT) AS t FROM stream),
est AS (
  SELECT * FROM ({cms_oracle_sql("SELECT url FROM stream", "url", "SELECT DISTINCT url FROM stream", "url")})
)
SELECT e.url, e.cms_estimate
FROM est e CROSS JOIN thresh
WHERE e.cms_estimate >= thresh.t
""",
        "best_capture": f"""
WITH {_CAPTURES_CTE.strip()}
SELECT url, datetime, event_id, status_code, mimetype FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY url
    ORDER BY CASE WHEN status_code IN (200, 226) THEN 1 ELSE 0 END DESC,
             -status_code DESC,
             CASE WHEN mimetype = 'click' THEN 1 ELSE 0 END DESC,
             CASE WHEN mimetype <> 'warc/revisit' THEN 1 ELSE 0 END DESC,
             CASE WHEN contains(warc_path, '/') THEN 1 ELSE 0 END DESC,
             datetime DESC
  ) AS _brn FROM captures
) WHERE _brn = 1
""",
        "asof_closest": f"""
WITH {_CAPTURES_CTE.strip()}
SELECT url, datetime, event_id FROM (
  SELECT url, datetime, event_id, ROW_NUMBER() OVER (
    PARTITION BY url
    ORDER BY abs(epoch(strptime(datetime, '%Y%m%d%H%M%S')) - epoch(TIMESTAMP '2024-01-15 12:00:00')) ASC,
             datetime ASC
  ) AS _arn FROM captures
) WHERE _arn = 1
""",
        "paper_filter_slice": """
WITH cdxish AS (
  SELECT CASE WHEN p_partkey % 3 = 0
              THEN 'https://journal' || CAST(p_partkey % 20 AS VARCHAR) || '.edu/pubs/10.' || CAST(1000 + p_partkey % 9000 AS VARCHAR) || '/' || replace(p_name, ' ', '-')
              ELSE 'https://site' || CAST(p_partkey % 20 AS VARCHAR) || '.com/items/' || replace(p_name, ' ', '-') END AS url,
         strftime(DATE '2024-01-01' + CAST(p_partkey % 365 AS INT), '%Y%m%d000000') AS datetime,
         md5(p_name || '|' || p_brand) AS doc_hash
  FROM part
)
SELECT url, datetime, doc_hash FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_hash ORDER BY datetime, url) AS _prn
  FROM cdxish
  WHERE regexp_matches(url, '/(pubs|research|publications|articles|papers|fulltext)/')
     OR regexp_matches(url, '/10\\.[0-9]{3,5}/')
) WHERE _prn = 1
""",
        "tarball_filter_slice": """
WITH cdxish AS (
  SELECT 'com,example,site' || CAST(p_partkey % 20 AS VARCHAR) || ')/files/' || replace(p_name, ' ', '-')
         || CASE WHEN p_partkey % 4 = 0 THEN '.tar.gz' WHEN p_partkey % 4 = 1 THEN '.pdf'
                 WHEN p_partkey % 4 = 2 THEN '.py' ELSE '' END AS surt,
         strftime(DATE '2024-01-01' + CAST(p_partkey % 365 AS INT), '%Y%m%d000000') AS datetime,
         CASE WHEN p_partkey % 5 = 0 THEN 'application/gzip' WHEN p_partkey % 5 = 1 THEN 'application/octet-stream'
              WHEN p_partkey % 5 = 2 THEN 'application/pdf' WHEN p_partkey % 5 = 3 THEN 'text/plain'
              ELSE 'application/x-gtar' END AS mimetype,
         CASE WHEN p_partkey % 13 = 0 THEN 404 ELSE 200 END AS status_code,
         md5(p_name || '|' || CAST(p_partkey % 4 AS VARCHAR)) AS sha1hex
  FROM part
)
SELECT surt, datetime, sha1hex FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY sha1hex ORDER BY surt, datetime) AS _trn
  FROM cdxish
  WHERE status_code = 200
    AND regexp_matches(mimetype, '.*(octet|gzip|gtar|tgz).*')
    AND regexp_matches(surt, '(?i).*\\.tar\\.gz.*')
) WHERE _trn = 1
""",
        "surt_canonical": f"""
WITH {_URLS_CTE.strip()}
SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'HTTPS://WWW.Site' || CAST(site_id AS VARCHAR) || '.Example.COM/Order/' || CAST(o_orderkey AS VARCHAR)
            WHEN o_orderkey % 5 = 1 THEN 'https://site' || CAST(site_id AS VARCHAR) || '.example.com:443/order/' || CAST(o_orderkey AS VARCHAR)
            ELSE 'https://site' || CAST(site_id AS VARCHAR) || '.example.com/order/' || CAST(o_orderkey AS VARCHAR) END AS raw_url,
       CASE WHEN o_orderkey % 5 = 0 THEN 'https://www.site' || CAST(site_id AS VARCHAR) || '.example.com/Order/' || CAST(o_orderkey AS VARCHAR)
            ELSE 'https://site' || CAST(site_id AS VARCHAR) || '.example.com/order/' || CAST(o_orderkey AS VARCHAR) END AS canon_url,
       'com,example,site' || CAST(site_id AS VARCHAR) || ')/order/' || CAST(o_orderkey AS VARCHAR) AS surt,
       CASE WHEN o_orderkey % 5 = 0 THEN 'www.site' || CAST(site_id AS VARCHAR) || '.example.com'
            ELSE 'site' || CAST(site_id AS VARCHAR) || '.example.com' END AS host
FROM urls
""",
        "word_counts": """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_calc
FROM documents
""",
        "readability": """
WITH rc AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_sum(list_transform(
             regexp_extract_all(lower(text), '[a-z]+'),
             w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835000 - (CAST(1015000 AS BIGINT) * n_words) // n_sentences
            - (CAST(84600000 AS BIGINT) * n_syllables) // greatest(CAST(1 AS BIGINT), n_words) AS BIGINT) AS fre_micro,
       CAST((CAST(390000 AS BIGINT) * n_words) // n_sentences
            + (CAST(11800000 AS BIGINT) * n_syllables) // greatest(CAST(1 AS BIGINT), n_words)
            - 15590000 AS BIGINT) AS fkgl_micro
FROM rc
""",
        "quality_scores": """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), r AS (
  SELECT doc_id, text,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, x -> list_contains(['the','of','and','a','to','in','is','it','that','for','on','with','as','was','at','by','an','be','this','are'], x))) AS DOUBLE) AS n_stop,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_char
  FROM t
), s AS (
  SELECT doc_id,
         CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_char > 0 THEN n_punct / n_char ELSE 0.0 END AS punct_ratio,
         n_tok
  FROM r
)
SELECT doc_id,
       round(stop_ratio, 6) AS stopword_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(least(n_tok / 100.0, 1.0) * 0.4 + least(stop_ratio / 0.2, 1.0) * 0.4
             + greatest(0.0, 1.0 - punct_ratio * 5) * 0.2, 6) AS quality
FROM s
""",
        "lang_pred_counts": """
WITH t AS (
  SELECT lang, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), r AS (
  SELECT lang,
         CASE WHEN len(toks) > 0 AND CAST(len(list_filter(toks, x -> list_contains(['the','of','and','a','to','in','is','it','that','for','on','with','as','was','at','by','an','be','this','are'], x))) AS DOUBLE) / len(toks) >= 0.08
              THEN 'en' ELSE 'other' END AS pred
  FROM t
)
SELECT lang, pred, COUNT(*) AS n FROM r GROUP BY lang, pred
""",
        "token_counts": """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')) AS INT) AS n_bpe_tokens,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INT) AS n_words
FROM documents
""",
        "winnow_fingerprints": """
WITH t AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
  FROM documents WHERE doc_id < 100
), g AS (
  SELECT doc_id, length(norm) AS n,
         list_transform(range(1, greatest(length(norm) - 4, 0) + 1),
                        i -> substr(md5(substr(norm, CAST(i AS INT), 5)), 1, 8)) AS hashes
  FROM t
), w AS (
  SELECT doc_id,
         CASE WHEN n >= 8
              THEN list_distinct(list_transform(range(1, greatest(len(hashes) - 3, 0) + 1),
                                                i -> list_min(hashes[i:i+3])))
              ELSE [] END AS fps
  FROM g
)
SELECT doc_id, unnest(fps) AS fingerprint FROM w
""",
        "cdc_chunks": """
WITH cdcb AS (
  SELECT doc_id, text, length(text) AS tlen,
         [CAST(0 AS BIGINT)] ||
         list_filter(
           CASE WHEN length(text) >= 16
                THEN list_transform(generate_series(CAST(16 AS BIGINT), CAST(length(text) AS BIGINT)),
                     p -> CASE WHEN p < length(text)
                                AND CAST('0x' || substr(md5(substr(text, CAST(p AS INT) - 15, 16)), 1, 4) AS INT) % 64 = 0
                               THEN p END)
                ELSE CAST([] AS BIGINT[]) END,
           x -> x IS NOT NULL) ||
         [CAST(length(text) AS BIGINT)] AS bnd
  FROM documents
),
cdci AS (
  SELECT doc_id, text, bnd,
         UNNEST(generate_series(CAST(1 AS BIGINT), CAST(len(bnd) - 1 AS BIGINT))) AS i
  FROM cdcb
),
cdcch AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_seq,
         substr(text, CAST(bnd[CAST(i AS INT)] AS INT) + 1,
                CAST(bnd[CAST(i AS INT) + 1] - bnd[CAST(i AS INT)] AS INT)) AS chunk
  FROM cdci
)
SELECT md5(chunk) AS chunk_md5,
       CAST(MIN(length(chunk)) AS BIGINT) AS chunk_len,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM cdcch
WHERE chunk <> ''
GROUP BY md5(chunk)
HAVING COUNT(*) >= 2
""",
        "tfidf_keywords": """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (SELECT doc_id, UNNEST(toks) AS term FROM t),
p AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM s GROUP BY term, doc_id),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM p GROUP BY term),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
sc AS (
  SELECT p.doc_id, p.term, p.tf, d.doc_freq,
         CAST(p.tf * CAST(round(1000000.0 * ln(
             (CAST((SELECT n FROM nd) AS DOUBLE) + 1.0)
             / (CAST(d.doc_freq AS DOUBLE) + 1.0))) AS BIGINT) AS BIGINT) AS score_micro
  FROM p JOIN dfq d USING (term)
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rk
  FROM sc
)
SELECT doc_id, term, tf, doc_freq, score_micro, rk FROM rk WHERE rk <= 3
""",
        "postings_stats": """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (SELECT doc_id, UNNEST(toks) AS term FROM t),
p AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM s GROUP BY term, doc_id)
SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS corpus_tf
FROM p GROUP BY term HAVING COUNT(*) >= 10
""",
        "bm25_search": bm25_oracle_sql(
            "SELECT doc_id, text FROM documents",
            f"""
SELECT term FROM (
  SELECT term, COUNT(*) AS c FROM (
    SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
    FROM documents
  ) WHERE term NOT IN ({", ".join("'" + s + "'" for s in EN_STOPWORDS)})
  GROUP BY term ORDER BY c DESC, term ASC LIMIT 3
)
""",
            k=15,
        ),
        "lm_doc_scores": lm_oracle_sql("SELECT doc_id, text FROM documents"),
        # head/middle/tail tertiles over the SAME lm scores: rank-1
        # replay (higher logprob = head), per-lang integer floor split
        "ccnet_buckets": f"""
WITH scores AS ({lm_oracle_sql("SELECT doc_id, text FROM documents")}),
lang_scored AS (
  SELECT s.doc_id, d.lang, s.logprob_micronat,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY s.logprob_micronat DESC, s.doc_id ASC) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY d.lang) AS n
  FROM scores s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT doc_id, lang, logprob_micronat,
       CASE (rk * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lang_scored
""",
        "c4_line_filters": _c4_oracle(),
        "nb_quality": nb_oracle_sql(
            "SELECT doc_id, text, lang FROM documents", "lang = 'en'"
        ),
        "dsir_weights": dsir_oracle_sql(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id, text FROM documents WHERE lang = 'en'",
        ),
        "anchor_texts": f"""
WITH {_URLS_CTE.strip()},
{_ANCHOR_EDGES_CTE.strip()},
per_text AS (
  SELECT dst_url, anchor_text, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM anchor_edges GROUP BY dst_url, anchor_text
),
tops AS (
  SELECT dst_url, anchor_text AS top_text FROM per_text
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst_url ORDER BY cnt DESC, anchor_text) = 1
)
SELECT p.dst_url,
       CAST(SUM(p.cnt) AS BIGINT) AS n_anchors,
       CAST(COUNT(*) AS BIGINT) AS n_texts,
       MIN(t.top_text) AS top_text
FROM per_text p JOIN tops t ON p.dst_url = t.dst_url
GROUP BY p.dst_url
""",
        "zorder_prune": """
WITH e AS (
  SELECT event_type, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (CAST(floor(epoch(ts)) AS BIGINT)
          - CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)) // 60 AS minute
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e
WHERE user_id BETWEEN 10 AND 24 AND minute BETWEEN 2000 AND 20000
GROUP BY event_type
""",
        "phrase_search": """
WITH tokd AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
posn AS (
  SELECT doc_id, UNNEST(range(len(toks) - 1)) AS pos, toks
  FROM tokd WHERE len(toks) >= 2
),
bigr AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos + 1] AS w1, toks[pos + 2] AS w2
  FROM posn
),
best AS (
  SELECT w1, w2 FROM (
    SELECT w1, w2, COUNT(*) AS c FROM bigr GROUP BY w1, w2
    ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1
  )
)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits, CAST(MIN(b.pos) AS BIGINT) AS first_hit
FROM bigr b JOIN best x ON b.w1 = x.w1 AND b.w2 = x.w2
GROUP BY b.doc_id
""",
        "bpe_merges": bpe_oracle_sql("SELECT text FROM documents", k=6),
        "bpe_coverage": f"""
WITH seg AS (
  SELECT word, n_units
  FROM ({bpe_apply_oracle_sql("SELECT text FROM documents", _BPE_ENCODE_MERGES)})
),
per AS (
  SELECT stratum, word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT source AS stratum,
           UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
    FROM documents
  ) GROUP BY stratum, word
),
j AS (SELECT p.stratum, p.freq, s.n_units FROM per p JOIN seg s USING (word)),
g AS (
  SELECT stratum, CAST(SUM(freq) AS BIGINT) AS n_words,
         CAST(SUM(freq * n_units) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN n_units = 1 THEN freq ELSE 0 END) AS BIGINT) AS one
  FROM j GROUP BY stratum
)
SELECT stratum, n_words, n_tokens,
       CAST(CAST(1000000 AS BIGINT) * n_tokens // n_words AS BIGINT) AS fertility_ppm,
       CAST(CAST(1000000 AS BIGINT) * one // n_words AS BIGINT) AS one_unit_ppm
FROM g
""",
        "sitemap_recrawl": f"""
WITH {_corpus_oracle_tables()},
sm AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         url AS loc,
         strftime(CAST(warc_ts AS DATE)
                  + (CAST(CAST('0x' || substr(md5(url), 1, 4) AS UBIGINT) % 5 AS BIGINT) - 2)
                    * INTERVAL 1 DAY,
                  '%Y-%m-%d') AS lastmod
  FROM c_pages
),
latest AS (SELECT url, MAX(datetime) AS dt FROM c_cdx GROUP BY url)
SELECT s.host, s.loc, s.lastmod,
       substr(l.dt, 1, 8) AS last_capture_day,
       replace(s.lastmod, '-', '') > substr(l.dt, 1, 8) AS needs_refetch
FROM sm s JOIN latest l ON s.loc = l.url
""",
        "bpe_encode": bpe_apply_oracle_sql(
            "SELECT text FROM documents", _BPE_ENCODE_MERGES
        ),
        "host_budget_alloc": budget_oracle_sql(
            f"""
WITH {_URLS_CTE.strip()}
SELECT host, CAST(COUNT(*) AS BIGINT) AS demand FROM urls GROUP BY host
""",
            10_000,
        ),
        "cumulative_events": """
SELECT event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
            OVER (ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cents
FROM events
""",
        "corpus_pack": """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), r AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, x -> list_contains(['the','of','and','a','to','in','is','it','that','for','on','with','as','was','at','by','an','be','this','are'], x))) AS DOUBLE) AS n_stop,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_char
  FROM t
), s AS (
  SELECT doc_id,
         CAST(round((least(n_tok / 100.0, 1.0) * 0.4
               + least((CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) / 0.2, 1.0) * 0.4
               + greatest(0.0, 1.0 - (CASE WHEN n_char > 0 THEN n_punct / n_char ELSE 0.0 END) * 5) * 0.2)
               * 1000000) AS BIGINT) AS q_micro,
         CAST(n_tok AS BIGINT) AS n_tokens
  FROM r
), c AS (
  SELECT doc_id, q_micro, n_tokens,
         SUM(n_tokens) OVER (ORDER BY q_micro DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM s
)
SELECT doc_id, q_micro, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= 20000
""",
        "event_quantiles": """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
        # lag-gap-flag + running-sum session ids == session_window
        # semantics (new session iff ts - prev_ts > gap, strictly:
        # an event landing exactly at prev + gap still merges —
        # verified by the pytest boundary case)
        "user_sessions": """
WITH l AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
),
f AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM l
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
""",
        "semantic_dedupe": _semdedup_oracle(),
        "topic_balance": _topic_balance_oracle(),
        "script_profile": _script_oracle(),
        "lang_profile": _lang_profile_oracle(),
        "lang_mismatch": _lang_mismatch_oracle(),
        "quality_fusion": """
WITH qf AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS BIGINT)
           * CAST(1000000 AS BIGINT)
           // GREATEST(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT), 1) AS ttr_ppm,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
),
qr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS n_tokens_rank,
         ROW_NUMBER() OVER (ORDER BY ttr_ppm DESC, doc_id ASC) AS ttr_ppm_rank,
         ROW_NUMBER() OVER (ORDER BY n_punct DESC, doc_id ASC) AS n_punct_rank
  FROM qf
)
SELECT doc_id,
       CAST(n_tokens_rank AS BIGINT) AS n_tokens_rank,
       CAST(ttr_ppm_rank AS BIGINT) AS ttr_ppm_rank,
       CAST(n_punct_rank AS BIGINT) AS n_punct_rank,
       CAST(n_tokens_rank + ttr_ppm_rank + n_punct_rank AS BIGINT) AS borda
FROM qr
""",
        "corpus_manifest": """
WITH rows_m AS (
  SELECT source,
         CAST(strlen(text) AS BIGINT) AS b,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15) AS UBIGINT) AS HUGEINT) AS h
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b) AS BIGINT) AS n_bytes,
       CAST(SUM(h) % 2305843009213693951 AS BIGINT) AS manifest_hash
FROM rows_m GROUP BY source
""",
        "corpus_diagnostics": """
WITH t AS (
  SELECT source,
         CAST(strlen(text) AS BIGINT) AS b,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
per_key AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
         CAST(SUM(b) AS BIGINT) AS tot_bytes
  FROM t GROUP BY source
),
tris AS (
  SELECT source, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
  FROM (SELECT source, toks, UNNEST(range(1, len(toks) - 1)) AS i FROM t WHERE len(toks) >= 3)
),
gs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_trigrams
  FROM tris GROUP BY source
)
SELECT p.source, p.n_docs, p.n_tokens,
       COALESCE(g.n_trigrams, 0) AS n_trigrams,
       COALESCE(g.distinct_trigrams, 0) AS distinct_trigrams,
       CASE WHEN COALESCE(g.n_trigrams, 0) > 0
            THEN (g.distinct_trigrams * CAST(1000000 AS BIGINT)) // g.n_trigrams
            ELSE 0 END AS trigram_diversity_ppm,
       CASE WHEN p.n_tokens > 0
            THEN (p.tot_bytes * CAST(1000000 AS BIGINT)) // p.n_tokens
            ELSE 0 END AS bytes_per_token_micro
FROM per_key p LEFT JOIN gs g ON p.source = g.source
""",
        "corpus_split": """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         (CAST(CAST('0x' || substr(md5('split:42' || ':' || source), 1, 8) AS UBIGINT) AS BIGINT)
          * CAST(1000000 AS BIGINT)) // 4294967296 AS split_u_ppm
  FROM documents
)
SELECT doc_id, source, split_u_ppm,
       CASE WHEN split_u_ppm < 150000 THEN 'test'
            WHEN split_u_ppm < 300000 THEN 'val'
            ELSE 'train' END AS split
FROM d
""",
        "embedding_neardup": """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id < 20
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM aug
), dims AS (
  SELECT max(len(v)) AS dim FROM e
), planes AS (
  SELECT p, list_transform(range(0, dims.dim), c ->
    CAST(CAST('0x' || substr(md5('42:' || CAST(p AS VARCHAR) || ':' || CAST(c // 4 AS VARCHAR)), (c % 4) * 8 + 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0
  ) AS plane
  FROM (SELECT unnest(range(0, 8)) AS p), dims
), bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_reduce(list_transform(list_zip(e.v, pl.plane), z -> z[1] * z[2]), (a, b) -> a + b) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM e, planes pl
), esig AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig FROM bits GROUP BY vec_id
), ev AS (
  SELECT e.vec_id, e.v, s.sig FROM e JOIN esig s ON e.vec_id = s.vec_id
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.v, t2 -> t2 * t2), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.v, t2 -> t2 * t2), (x, y) -> x + y))), 6) AS cosine
  FROM ev a JOIN ev b ON a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.95
""",
        "fingerprint_dedupe": """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(regexp_replace(lower(trim(text)), '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM fp GROUP BY fingerprint
""",
        "dedupe_recall": f"""
WITH {_LSH_CTES},
allpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
  WHERE len(a.sh) > 0 AND len(b.sh) > 0
),
truth AS (SELECT id_a, id_b FROM allpairs WHERE jaccard >= 0.5),
banded8 AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b+1:b+1], ',')) AS bkey
  FROM sigs, (SELECT unnest(range(0, 8)) AS b)
),
cands8 AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded8 a JOIN banded8 b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
),
stats AS (
  SELECT 'lsh_b4' AS method,
         CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
         CAST((SELECT COUNT(*) FROM truth t
               JOIN cands c ON t.id_a = c.id_a AND t.id_b = c.id_b) AS BIGINT) AS n_found
  UNION ALL
  SELECT 'lsh_b8',
         CAST((SELECT COUNT(*) FROM truth) AS BIGINT),
         CAST((SELECT COUNT(*) FROM truth t
               JOIN cands8 c ON t.id_a = c.id_a AND t.id_b = c.id_b) AS BIGINT)
)
SELECT method, n_true, n_found,
       CAST(FLOOR(n_found * 1000000 / n_true) AS BIGINT) AS recall_micro
FROM stats
""",
        "jaccard_pairs": f"""
WITH {_LSH_CTES}
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.5
""",
        "containment_pairs": f"""
WITH {_LSH_CTES},
contained AS (
  SELECT c.id_a, c.id_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS cont_a_in_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6) AS cont_b_in_a
  FROM cands c
  JOIN shingled a ON a.doc_id = c.id_a
  JOIN shingled b ON b.doc_id = c.id_b
  WHERE len(a.sh) > 0 AND len(b.sh) > 0
)
SELECT id_a, id_b, cont_a_in_b, cont_b_in_a FROM contained
WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.9
""",
        "gopher_repetition": f"""
WITH {_STRUCT_DOCS_CTE.strip()},
lines AS (
  SELECT doc_id, trim(rawline) AS line FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS rawline FROM struct_docs
  ) WHERE trim(rawline) <> ''
),
per_line AS (
  SELECT doc_id, line, COUNT(*) AS cnt, length(line) AS len
  FROM lines GROUP BY doc_id, line
),
linestats AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_lines,
         round(CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_line_frac,
         round(CAST(SUM((cnt - 1) * len) AS DOUBLE) / CAST(SUM(cnt * len) AS DOUBLE), 6) AS dup_line_char_frac
  FROM per_line GROUP BY doc_id
),
toks AS (
  SELECT doc_id, length(text) AS nchar,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM struct_docs
),
g2 AS (
  SELECT doc_id, nchar, gram, COUNT(*) AS cnt FROM (
    SELECT doc_id, nchar,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                 i -> array_to_string(toks[i:i+1], ' '))) AS gram
    FROM toks WHERE len(toks) >= 2
  ) GROUP BY doc_id, nchar, gram
),
top2 AS (
  SELECT doc_id, gram AS top_gram,
         round(CAST(cnt * length(gram) AS DOUBLE) / CAST(nchar AS DOUBLE), 6) AS top_2gram_char_frac
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rk FROM g2)
  WHERE rk = 1
),
g5 AS (
  SELECT doc_id, nw, gram, COUNT(*) AS cnt FROM (
    SELECT doc_id, len(toks) AS nw,
           unnest(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                                 i -> array_to_string(toks[i:i+4], ' '))) AS gram
    FROM toks WHERE len(toks) >= 5
  ) GROUP BY doc_id, nw, gram
),
dup5 AS (
  SELECT doc_id,
         round(least(CAST(SUM(cnt - 1) * 5 AS DOUBLE) / CAST(nw AS DOUBLE), 1.0), 6) AS dup_5gram_word_frac
  FROM g5 GROUP BY doc_id, nw
)
SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
       t.top_gram, t.top_2gram_char_frac, d.dup_5gram_word_frac
FROM linestats l
JOIN top2 t ON t.doc_id = l.doc_id
JOIN dup5 d ON d.doc_id = l.doc_id
""",
        "paragraph_dedupe": f"""
WITH {_STRUCT_DOCS_CTE.strip()},
p0 AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS para,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM struct_docs
),
p AS (
  SELECT doc_id, trim(para) AS para, pos FROM p0 WHERE trim(para) <> ''
),
k AS (
  SELECT doc_id, para, pos,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rk
  FROM p
),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM p GROUP BY doc_id),
keptagg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(para, chr(10) ORDER BY pos) AS text_deduped
  FROM k WHERE rk = 1 GROUP BY doc_id
)
SELECT t.doc_id, t.n_paras,
       coalesce(ka.n_kept, 0) AS n_kept,
       coalesce(ka.text_deduped, '') AS text_deduped
FROM tot t LEFT JOIN keptagg ka ON ka.doc_id = t.doc_id
""",
        "pii_scrub": """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.org or +14155550'
                   || CAST(100 + doc_id % 900 AS VARCHAR)
                   || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\\+[0-9]{7,14}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INT) AS n_ipv4,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+[0-9]{7,14}', '<PHONE>', 'g'),
           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
       ) AS redacted_md5
FROM planted
""",
        "warc_roundtrip": """
WITH crlf AS (SELECT chr(13) || chr(10) AS c),
rec AS (
  SELECT doc_id, doc_id % 8 AS file_id,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'HTTP/1.1 200 OK' || c || 'Content-Type: text/html' || c
           || 'Content-Length: ' || CAST(strlen(text) AS VARCHAR) || c || c || text AS http,
         text
  FROM documents, crlf WHERE doc_id < 200
),
rec2 AS (
  SELECT doc_id, file_id, url, http,
         'WARC/1.0' || c || 'WARC-Type: response' || c
           || 'WARC-Target-URI: ' || url || c
           || 'WARC-Date: 2020-01-01T00:00:00Z' || c
           || 'WARC-Record-ID: <urn:md5:' || md5(url || ' 2020-01-01T00:00:00Z') || '>' || c
           || 'Content-Type: application/http; msgtype=response' || c
           || 'Content-Length: ' || CAST(strlen(http) AS VARCHAR) || c || c AS head,
         md5(text) AS payload_md5
  FROM rec, crlf
),
sized AS (
  SELECT doc_id, file_id, url, payload_md5,
         strlen(http) AS rec_content_length,
         strlen(head) + strlen(http) + 4 AS rec_size
  FROM rec2
)
SELECT 'warc/part-' || CAST(file_id AS VARCHAR) || '.warc' AS path,
       CAST(coalesce(SUM(rec_size) OVER (PARTITION BY file_id ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset,
       url AS target_uri,
       '2020-01-01T00:00:00Z' AS warc_date,
       CAST(200 AS INT) AS http_status,
       'text/html' AS mime,
       CAST(rec_content_length AS BIGINT) AS rec_content_length,
       payload_md5
FROM sized
""",
        "warc_fetch_join": """
WITH crlf AS (SELECT chr(13) || chr(10) AS c),
rec AS (
  SELECT doc_id, doc_id % 8 AS file_id,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'HTTP/1.1 200 OK' || c || 'Content-Type: text/html' || c
           || 'Content-Length: ' || CAST(strlen(text) AS VARCHAR) || c || c || text AS http,
         text
  FROM documents, crlf WHERE doc_id < 200
),
rec2 AS (
  SELECT doc_id, file_id, url, http,
         'WARC/1.0' || c || 'WARC-Type: response' || c
           || 'WARC-Target-URI: ' || url || c
           || 'WARC-Date: 2020-01-01T00:00:00Z' || c
           || 'WARC-Record-ID: <urn:md5:' || md5(url || ' 2020-01-01T00:00:00Z') || '>' || c
           || 'Content-Type: application/http; msgtype=response' || c
           || 'Content-Length: ' || CAST(strlen(http) AS VARCHAR) || c || c AS head
  FROM rec, crlf
)
SELECT url,
       'warc/part-' || CAST(file_id AS VARCHAR) || '.warc' AS path,
       CAST(coalesce(SUM(strlen(head) + strlen(http) + 4) OVER (PARTITION BY file_id
              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
       true AS digest_ok,
       CAST(200 AS INT) AS http_status,
       'text/html' AS mime
FROM rec2
""",
        "corpus_sample": """
WITH rates AS (
  SELECT lang, least(1.0, 20.0 / COUNT(*)) AS rate FROM documents GROUP BY lang
),
draws AS (
  SELECT d.doc_id, d.lang, r.rate,
         CAST(CAST('0x' || substr(md5('sample:42:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE) / 4294967296.0 AS u
  FROM documents d JOIN rates r ON r.lang = d.lang
)
SELECT doc_id, lang, round(rate, 6) AS rate, round(u, 6) AS u, u < rate AS kept
FROM draws
""",
        "benchmark_decontaminate": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
                                      i -> array_to_string(toks[i:i+7], ' '))) AS sh
  FROM toks
),
bset AS (SELECT DISTINCT unnest(sh) AS g FROM grams WHERE doc_id < 5),
hits AS (
  SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(sh) AS g FROM grams) e
  JOIN bset ON bset.g = e.g
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       coalesce(h.n, 0) AS n_contaminated_ngrams,
       coalesce(h.n, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
        "neardup_dedupe": f"""
WITH RECURSIVE {_LSH_CTES},
pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION
  SELECT id_b AS s, id_a AS t FROM pairs
),
reach AS (
  SELECT s, t FROM edges
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.t), d.doc_id)) AS rep_id,
       d.doc_id = least(d.doc_id, coalesce(min(r.t), d.doc_id)) AS is_rep
FROM aug_docs d LEFT JOIN reach r ON r.s = d.doc_id
GROUP BY d.doc_id
""",
        # the neardup CC twin plus one cluster-size agg: SoftDeDup
        # sampling weights = 1e6 div |cluster| ppm, singletons 1e6
        "soft_dedupe_weights": f"""
WITH RECURSIVE {_LSH_CTES},
pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION
  SELECT id_b AS s, id_a AS t FROM pairs
),
reach AS (
  SELECT s, t FROM edges
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
),
sdw_labels AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.t), d.doc_id)) AS rep_id
  FROM aug_docs d LEFT JOIN reach r ON r.s = d.doc_id
  GROUP BY d.doc_id
),
sdw_sizes AS (
  SELECT rep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM sdw_labels GROUP BY rep_id
)
SELECT l.doc_id, l.rep_id, s.cluster_size,
       CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
FROM sdw_labels l JOIN sdw_sizes s USING (rep_id)
""",
        "minhash_lsh": f"""
WITH {_LSH_CTES}
SELECT id_a, id_b FROM cands
""",
        # derived twin: the md5 bit-vote behind simhash64_udf replayed in
        # SQL (get_bit over unhex'd md5 digests + HUGEINT shifts); the
        # pigeonhole blocking makes the blocked join == brute force, so
        # the oracle verifies against the brute-force pair set
        "simhash_pairs": f"""
WITH {_AUG_DOCS_CTE.strip()},
toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS tok
  FROM aug_docs
),
votes AS (
  SELECT doc_id, i, SUM(CASE WHEN get_bit(unhex(md5(tok))::BIT, CAST(i AS INT)) = 1 THEN 1 ELSE -1 END) AS v
  FROM toks, (SELECT unnest(range(0, 64)) AS i) GROUP BY doc_id, i
),
sigs0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 AND i = 0 THEN -(1::HUGEINT << 63)
                       WHEN v > 0 THEN (1::HUGEINT << (63 - CAST(i AS INT)))
                       ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
sigs AS (SELECT d.doc_id, COALESCE(s.sig, 0) AS sig FROM aug_docs d LEFT JOIN sigs0 s ON d.doc_id = s.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 7
""",
        "cosine_knn": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3
), sims AS (
  SELECT q.q_id, e.vec_id,
         round(list_reduce(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(e.v, x -> x*x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(q.qv, x -> x*x), (x, y) -> x + y))), 4) AS cosine
  FROM e, q
)
SELECT q_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= 5
""",
        "ann_lsh_multiprobe": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), dims AS (
  SELECT max(len(v)) AS dim FROM e
), planes AS (
  SELECT p, list_transform(range(0, dims.dim), c ->
    CAST(CAST('0x' || substr(md5('42:' || CAST(p AS VARCHAR) || ':' || CAST(c // 4 AS VARCHAR)), (c % 4) * 8 + 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0
  ) AS plane
  FROM (SELECT unnest(range(0, 4)) AS p), dims
), bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_reduce(list_transform(list_zip(e.v, pl.plane), z -> z[1] * z[2]), (a, b) -> a + b) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM e, planes pl
), esig AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig FROM bits GROUP BY vec_id
), ev AS (
  SELECT e.vec_id, e.v, s.sig FROM e JOIN esig s ON e.vec_id = s.vec_id
), qs AS (
  SELECT vec_id AS q_id, v AS qv, sig FROM ev WHERE vec_id < 5
), qprobe AS (
  SELECT q_id, qv, sig FROM qs
  UNION ALL
  SELECT q_id, qv,
         substr(sig, 1, CAST(i AS INT)) ||
         (CASE WHEN substr(sig, CAST(i AS INT) + 1, 1) = '1' THEN '0' ELSE '1' END) ||
         substr(sig, CAST(i AS INT) + 2) AS sig
  FROM qs, (SELECT unnest(range(0, 4)) AS i)
), cand AS (
  SELECT DISTINCT p.q_id, x.vec_id,
         round(list_reduce(list_transform(list_zip(x.v, p.qv), z -> z[1] * z[2]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(x.v, t2 -> t2 * t2), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(p.qv, t2 -> t2 * t2), (a, b) -> a + b))), 6) AS cosine
  FROM qprobe p JOIN ev x ON x.sig = p.sig
)
SELECT q_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rn FROM cand
) WHERE rn <= 3
""",
        "ann_ivf": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cents AS (
  -- capped cell stride: max(centroid_mod, ceil(n / max_cells)) — the
  -- ivf_topk bounded-broadcast contract (pq.py coarse_stride)
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id % (SELECT GREATEST(25, CAST(ceil(COUNT(*) / 4096.0) AS BIGINT)) FROM e) = 0
), assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             round(list_reduce(list_transform(list_zip(e.v, c.cv), z -> z[1] * z[2]), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(e.v, t2 -> t2 * t2), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(c.cv, t2 -> t2 * t2), (x, y) -> x + y))), 6) DESC,
             c.cent_id ASC) AS rn
    FROM e, cents c
  ) WHERE rn = 1
), probes AS (
  SELECT q_id, qv, cent_id FROM (
    SELECT q.vec_id AS q_id, q.v AS qv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_reduce(list_transform(list_zip(q.v, c.cv), z -> z[1] * z[2]), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(q.v, t2 -> t2 * t2), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(c.cv, t2 -> t2 * t2), (x, y) -> x + y))), 6) DESC,
             c.cent_id ASC) AS rn
    FROM e q, cents c WHERE q.vec_id < 5
  ) WHERE rn <= 2
), cand AS (
  SELECT p.q_id, a.vec_id,
         round(list_reduce(list_transform(list_zip(a.v, p.qv), z -> z[1] * z[2]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.v, t2 -> t2 * t2), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(p.qv, t2 -> t2 * t2), (x, y) -> x + y))), 6) AS cosine
  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
)
SELECT q_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rn FROM cand
) WHERE rn <= 3
""",
        # derived twin: rebuild the seeded md5 hyperplanes (hex->uint32 ->
        # [-1,1)) and replay sign-bit bucketing + in-bucket cosine top-3;
        # FP ops replay in the same order, so doubles match exactly
        "ann_lsh": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), dims AS (
  SELECT max(len(v)) AS dim FROM e
), planes AS (
  SELECT p, list_transform(range(0, dims.dim), c ->
    CAST(CAST('0x' || substr(md5('42:' || CAST(p AS VARCHAR) || ':' || CAST(c // 4 AS VARCHAR)), (c % 4) * 8 + 1, 8) AS UBIGINT) AS DOUBLE) / 2147483648.0 - 1.0
  ) AS plane
  FROM (SELECT unnest(range(0, 4)) AS p), dims
), bits AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_reduce(list_transform(list_zip(e.v, pl.plane), z -> z[1] * z[2]), (a, b) -> a + b) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM e, planes pl
), esig AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig FROM bits GROUP BY vec_id
), ev AS (
  SELECT e.vec_id, e.v, s.sig FROM e JOIN esig s ON e.vec_id = s.vec_id
), j AS (
  SELECT q.vec_id AS q_id, x.vec_id,
         round(list_reduce(list_transform(list_zip(x.v, q.v), z -> z[1] * z[2]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(x.v, t -> t * t), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(q.v, t -> t * t), (a, b) -> a + b))), 6) AS cosine
  FROM ev x JOIN ev q ON x.sig = q.sig AND q.vec_id < 5
)
SELECT q_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rn FROM j
) WHERE rn <= 3
""",
        "slug_self_join": """
WITH k AS (
  SELECT p_partkey AS id, p_name AS title,
         regexp_replace(lower(p_name), '[\\s!"#$%&''()*+,\\-./:;<=>?@\\[\\]\\\\^_`{|}~’‘“”«»„–—‒]', '', 'g') AS slug
  FROM part WHERE p_partkey < 500
), s AS (
  SELECT * FROM k WHERE length(slug) >= 8
    AND slug NOT IN ('abstract','abstracts','archive','archives','article','articles','book','books','bookreview','bookreviews','conclusion','conclusions','contents','discussion','editorial','editorials','frontmatter','index','introduction','introductions','none','preface','references','results','review','reviews','summary','title','untitled')
)
SELECT a.slug, a.id AS id_a, b.id AS id_b,
       CAST(CASE WHEN greatest(length(a.title), length(b.title)) = 0 THEN 1000
                 ELSE FLOOR((greatest(length(a.title), length(b.title)) - levenshtein(a.title, b.title)) * 1000.0
                            / greatest(length(a.title), length(b.title))) END AS INT) AS score
FROM s a JOIN s b ON a.slug = b.slug
WHERE a.id < b.id
""",
        "score_insertable": """
WITH g0 AS (
  SELECT md5(p_name || '|g') AS sha1hex, p_name AS title,
         CASE WHEN p_partkey % 11 = 0 THEN 500 ELSE 200 END AS status_code
  FROM part WHERE p_partkey < 500
), c0 AS (
  SELECT p_partkey AS id, p_name AS title,
         CASE WHEN p_partkey % 7 = 0 THEN 'component' ELSE 'journal-article' END AS release_type
  FROM part WHERE p_partkey < 500
), slugged_g AS (
  SELECT sha1hex, title,
         regexp_replace(lower(title), '[\\s!"#$%&''()*+,\\-./:;<=>?@\\[\\]\\\\^_`{|}~’‘“”«»„–—‒]', '', 'g') AS slug
  FROM g0 WHERE status_code = 200 AND title IS NOT NULL AND length(title) BETWEEN 1 AND 1023
), slugged_c AS (
  SELECT id, title,
         regexp_replace(lower(title), '[\\s!"#$%&''()*+,\\-./:;<=>?@\\[\\]\\\\^_`{|}~’‘“”«»„–—‒]', '', 'g') AS slug
  FROM c0 WHERE release_type IN ('book','book-chapter','dataset','dissertation','journal-article','letter','monograph','posted-content','pre-print','proceedings-article','report','working-paper')
    AND title IS NOT NULL AND length(title) BETWEEN 1 AND 1023
), gs AS (
  SELECT * FROM slugged_g WHERE length(slug) >= 8
    AND slug NOT IN ('abstract','abstracts','archive','archives','article','articles','book','books','bookreview','bookreviews','conclusion','conclusions','contents','discussion','editorial','editorials','frontmatter','index','introduction','introductions','none','preface','references','results','review','reviews','summary','title','untitled')
), cs AS (
  SELECT * FROM slugged_c WHERE length(slug) >= 8
    AND slug NOT IN ('abstract','abstracts','archive','archives','article','articles','book','books','bookreview','bookreviews','conclusion','conclusions','contents','discussion','editorial','editorials','frontmatter','index','introduction','introductions','none','preface','references','results','review','reviews','summary','title','untitled')
), scored AS (
  SELECT a.sha1hex, b.id AS crossref_id, a.slug,
         CAST(CASE WHEN greatest(length(a.title), length(b.title)) = 0 THEN 1000
                   ELSE FLOOR((greatest(length(a.title), length(b.title)) - levenshtein(a.title, b.title)) * 1000.0
                              / greatest(length(a.title), length(b.title))) END AS INT) AS score
  FROM gs a JOIN cs b ON a.slug = b.slug
), cdx AS (
  SELECT DISTINCT md5(p_name || '|g') AS sha1hex, 'application/pdf' AS mimetype,
         CAST(p_partkey % 1000 AS BIGINT) AS warc_csize
  FROM part WHERE p_partkey < 500
)
SELECT s.sha1hex, s.crossref_id, s.slug, s.score, x.mimetype, x.warc_csize
FROM scored s JOIN cdx x ON s.sha1hex = x.sha1hex
""",
        "batch_dedupe_latest": """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y%m%d') AS order_day FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS _drn
  FROM orders
) WHERE _drn = 1
""",
        "recrawl_frontier": f"""
WITH {_URLS_CTE.strip()},
reqs AS (
  SELECT url AS base_url, priority, o_orderkey FROM urls
),
results AS (
  SELECT url AS base_url,
         CASE WHEN o_orderstatus = 'F' THEN 'success'
              WHEN o_orderstatus = 'O' THEN 'no-capture'
              ELSE 'terminal-bad-status' END AS status,
         o_orderdate AS updated
  FROM urls WHERE o_orderkey % 2 = 0
),
joined AS (
  SELECT r.base_url, r.priority, res.status AS prev_status, res.updated AS prev_updated
  FROM reqs r LEFT JOIN results res ON r.base_url = res.base_url
),
kept AS (
  SELECT * FROM joined
  WHERE prev_status IS NULL
     OR (prev_status IN ('no-capture','cdx-error','wayback-error','petabox-error','spn2-cdx-lookup-failure','gateway-timeout','terminal-bad-status')
         AND prev_updated < TIMESTAMP '1998-01-01 00:00:00' - INTERVAL 24 HOURS
         AND prev_updated > TIMESTAMP '1998-01-01 00:00:00' - INTERVAL 1000 DAYS)
)
SELECT k.base_url,
       CAST(k.priority * 10 - CASE WHEN k.prev_status IS NOT NULL THEN 5 ELSE 0 END AS INT) AS priority,
       CAST(CASE WHEN k.prev_status IS NOT NULL THEN 1 ELSE 0 END AS INT) AS retry,
       'com,example,site' || CAST(u.site_id AS VARCHAR) || ')/order/' || CAST(u.o_orderkey AS VARCHAR) AS surt,
       u.host
FROM kept k JOIN urls u ON k.base_url = u.url
""",
        "html_biblio": """
SELECT p_partkey AS partkey,
       p_name AS title,
       CASE WHEN p_partkey % 3 IN (0, 1) THEN '10.1234/p' || CAST(p_partkey AS VARCHAR) END AS doi,
       CAST(CASE WHEN p_partkey % 3 = 0 THEN 2 WHEN p_partkey % 3 = 1 THEN 1 ELSE 0 END AS INT) AS n_authors,
       CASE WHEN p_partkey % 3 IN (0, 1)
            THEN strftime(DATE '2020-01-01' + CAST(p_partkey % 28 AS INT), '%Y-%m-%d') END AS release_date,
       CASE WHEN p_partkey % 2 = 0
            THEN 'https://pub' || CAST(p_partkey % 10 AS VARCHAR) || '.example.org/files/' || CAST(p_partkey AS VARCHAR) || '.pdf' END AS pdf_url
FROM part
""",
        "sub_resources": """
SELECT rtype, CAST(COUNT(*) AS BIGINT) AS n, COUNT(DISTINCT url) AS n_urls FROM (
  SELECT 'stylesheet' AS rtype,
         'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/css/' || CAST(doc_id AS VARCHAR) || '.css' AS url
  FROM documents
  UNION ALL
  SELECT 'script', 'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/js/app.js' FROM documents
  UNION ALL
  SELECT 'image', 'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/img/' || CAST(doc_id AS VARCHAR) || '.png'
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'subdocument', 'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/inner.html'
  FROM documents WHERE doc_id % 3 = 0
) GROUP BY rtype
""",
        "sha1_digest_join": f"""
WITH {_CAPTURES_CTE.strip()},
digests AS (SELECT DISTINCT sha1hex FROM captures WHERE event_id % 5 = 0)
SELECT c.sha1hex, c.url, c.datetime
FROM captures c JOIN digests d ON c.sha1hex = d.sha1hex
""",
        "surt_seed_join": f"""
WITH {_URLS_CTE.strip()}
SELECT 'com,example,site' || CAST(site_id AS VARCHAR) || ')/order/' || CAST(o_orderkey AS VARCHAR) AS surt,
       url,
       'HTTP://WWW.site' || CAST(site_id AS VARCHAR) || '.Example.com/order/' || CAST(o_orderkey AS VARCHAR) AS seed_url
FROM urls WHERE o_orderkey % 7 = 0
""",
        "union_lanes": """
SELECT o_orderstatus, lane, COUNT(*) AS n FROM (
  SELECT o_orderstatus, 'bulk' AS lane FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderstatus, 'priority' AS lane FROM orders WHERE o_totalprice > 150000.0
) GROUP BY o_orderstatus, lane
""",
        # true twin: the stub decode's status depends only on body
        # emptiness, and sha1hex distinctness == content distinctness,
        # so DuckDB can recompute the rollup without computing sha1
        "multimodal_meta": """
SELECT CASE WHEN text IS NULL OR length(text) = 0 THEN 'null-body' ELSE 'success-stub' END AS status,
       'image' AS media_type,
       COUNT(*) AS n,
       COUNT(DISTINCT CASE WHEN text IS NOT NULL AND length(text) > 0 THEN text END) AS n_distinct
FROM documents
GROUP BY 1, 2
""",
        "ann_recall": _ann_recall_oracle(),
        "pq_codes": _pq_oracle("codes", m=_PQ_M, n_iters=_PQ_ITERS,
                               ksub=_PQ_KSUB, sample_cap=_PQ_CAP),
        "ann_pq": _pq_oracle("ann", m=_PQ_M, n_iters=_PQ_ITERS,
                             ksub=_PQ_KSUB, sample_cap=_PQ_CAP, n_q=5, k=5),
        "ann_ivfpq": _pq_oracle("ivfpq", m=_PQ_M, n_iters=_PQ_ITERS,
                                ksub=_PQ_KSUB, sample_cap=_PQ_CAP,
                                n_q=5, k=5, coarse_mod=25, max_cells=4096, nprobe=2),
        "pq_recall": _pq_oracle("recall", m=_PQ_M, n_iters=_PQ_ITERS,
                                ksub=_PQ_KSUB, sample_cap=_PQ_CAP, n_q=20, k=5),
        "pq_codebook": _pq_oracle("book", m=_PQ_M, n_iters=_PQ_ITERS,
                                  ksub=_PQ_KSUB, sample_cap=_PQ_CAP),
        "ivf_cell_profile": _IVF_CELL_PROFILE_ORACLE,
        # corpus twins: independent DuckDB recomputation over the same
        # persisted seed=42 parquet fixture both engines read
        "fetch_statuses": _fetch_statuses_oracle(max_hops=4),
        "extraction_roundtrip": _extraction_roundtrip_oracle(),
        "grobid_hook": _grobid_hook_oracle(),
        "revisit_resolution": _revisit_resolution_oracle(),
        "recrawl_rates": """
WITH caps AS (
  SELECT 'https://stream.example.org/u/' || CAST(user_id AS VARCHAR) AS url,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         md5(CAST(user_id AS VARCHAR) || ':' || CAST(event_id % 3 AS VARCHAR)) AS dg
  FROM events
), flagged AS (
  SELECT url, ep, dg,
         LAG(dg) OVER (PARTITION BY url ORDER BY ep, dg) AS prev
  FROM caps
), agg AS (
  SELECT url,
         CAST(COUNT(*) AS BIGINT) AS n_caps,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> dg THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         CAST(MAX(ep) - MIN(ep) AS BIGINT) AS span_s
  FROM flagged GROUP BY url
)
SELECT url, n_caps, n_changes, span_s,
       CAST(CASE WHEN span_s > 0
                 THEN round(1000000.0 * 86400.0 * n_changes / span_s)
                 ELSE 0 END AS BIGINT) AS rate_micro_per_day,
       CAST(CASE WHEN n_changes = 0 THEN 64
                 ELSE greatest(1, least(64, round((span_s / 86400.0) / n_changes)))
            END AS BIGINT) AS interval_days
FROM agg
""",
        "adaptive_delay": """
WITH results AS (
  SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
         CASE WHEN event_id % 97 = 0 THEN 429
              WHEN event_id % 89 = 0 THEN 503
              WHEN event_id % 11 = 0 THEN 404
              ELSE 200 END AS status_code
  FROM events
),
current AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host,
         CAST(250 * (1 + hid % 8) AS BIGINT) AS crawl_delay_ms
  FROM (SELECT DISTINCT user_id % 40 AS hid FROM events)
),
obs AS (
  SELECT host,
         CAST(SUM(CASE WHEN status_code IN (429, 503) THEN 1 ELSE 0 END) AS BIGINT) AS n_throttle,
         CAST(SUM(CASE WHEN status_code >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail
  FROM results GROUP BY host
)
SELECT c.host,
       CAST(greatest(250, least(64000,
            CASE WHEN o.n_throttle > 0 THEN c.crawl_delay_ms * 2
                 WHEN o.n_fail = 0 THEN c.crawl_delay_ms - 250
                 ELSE c.crawl_delay_ms END)) AS BIGINT) AS crawl_delay_ms
FROM current c LEFT JOIN obs o ON c.host = o.host
""",
        "shard_assign": f"""
WITH {_URLS_CTE.strip()},
hosts AS (SELECT DISTINCT host FROM urls),
w AS (
  SELECT host, CAST(t.i AS INT) AS shard,
         md5(host || ':' || CAST(t.i AS VARCHAR)) AS wgt
  FROM hosts CROSS JOIN range(0, 8) t(i)
)
SELECT host, shard FROM (
  SELECT host, shard,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY wgt DESC, shard DESC) AS rn
  FROM w
) WHERE rn = 1
""",
        "mime_sniff": _mime_sniff_oracle(),
        "tag_density": f"""
WITH {_corpus_oracle_tables()},
tdh AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         decode(html) AS s, text
  FROM c_pages WHERE substring(upper(hex(html)), 1, 2) = '3C'
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(length(s)) AS BIGINT) AS html_chars,
       CAST(SUM(length(text)) AS BIGINT) AS text_chars,
       CAST(SUM(length(s) - length(replace(s, '<', ''))) AS BIGINT) AS n_tags,
       CAST(SUM((length(s) - length(replace(s, '<p>', ''))) // 3) AS BIGINT) AS n_para,
       CAST(SUM((length(s) - length(replace(s, '<a ', ''))) // 3) AS BIGINT) AS n_anchor,
       CAST(SUM((length(s) - length(replace(s, '<meta ', ''))) // 6) AS BIGINT) AS n_meta,
       CAST((1000 * CAST(SUM(length(text)) AS BIGINT))
            // greatest(CAST(1 AS BIGINT), CAST(SUM(length(s)) AS BIGINT)) AS BIGINT) AS text_permille
FROM tdh GROUP BY host
""",
        "title_dupes": f"""
WITH {_corpus_oracle_tables()},
tth AS (
  -- CASE-guarded decode: DuckDB may evaluate projections before the
  -- WHERE filter, and decode() hard-errors on non-UTF8 (pdf/gzip) rows
  SELECT url, regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_extract(CASE WHEN substring(upper(hex(html)), 1, 2) = '3C'
                             THEN decode(html) ELSE '' END,
                        '<title>([^<]*)</title>', 1) AS title
  FROM c_pages WHERE substring(upper(hex(html)), 1, 2) = '3C'
)
SELECT title,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       MIN(url) AS exemplar_url
FROM tth WHERE title <> '' GROUP BY title HAVING COUNT(*) >= 2
""",
        "meta_tags": f"""
WITH {_corpus_oracle_tables()},
mth AS (
  SELECT url, decode(html) AS s FROM c_pages
  WHERE substring(upper(hex(html)), 1, 2) = '3C'
),
mtx AS (
  SELECT url, UNNEST(regexp_extract_all(s, '<meta name="([a-z_]+)"', 1)) AS meta_name
  FROM mth
)
SELECT meta_name, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_pages
FROM mtx GROUP BY meta_name
""",
        "postings_compression": r"""
WITH pct AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
  FROM documents
),
pcd AS (SELECT DISTINCT term, doc_id FROM pct),
pcterm AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id
  FROM pcd GROUP BY term
),
pcg AS (
  SELECT term, n_docs,
         CASE WHEN n_docs > 1 THEN (max_id - min_id) // (n_docs - 1) ELSE max_id END AS mean_gap
  FROM pcterm
),
pcv AS (
  SELECT n_docs,
         CAST(CASE WHEN mean_gap < 128 THEN 1 WHEN mean_gap < 16384 THEN 2
                   WHEN mean_gap < 2097152 THEN 3 WHEN mean_gap < 268435456 THEN 4
                   ELSE 5 END AS INT) AS varint_bytes,
         CASE WHEN n_docs = 1 THEN '1' WHEN n_docs < 10 THEN '2-9'
              WHEN n_docs < 100 THEN '10-99' WHEN n_docs < 1000 THEN '100-999'
              ELSE '1000+' END AS df_class
  FROM pcg
)
SELECT df_class, varint_bytes, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(n_docs) AS BIGINT) AS n_postings,
       CAST(SUM(n_docs * varint_bytes) AS BIGINT) AS est_bytes
FROM pcv GROUP BY df_class, varint_bytes
""",
        "frontier_merge": f"""
WITH {_URLS_CTE.strip()},
fmall AS (
  SELECT url, host, priority, o_orderdate AS discovered_ts,
         'fatcat-ingest' AS source
  FROM urls WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT url, host, CAST(least(5, priority + 1) AS INT) AS priority,
         o_orderdate + INTERVAL 1 DAY AS discovered_ts, 'savepapernow' AS source
  FROM urls WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT url, host, CAST(1 AS INT) AS priority,
         o_orderdate + INTERVAL 7 DAY AS discovered_ts, 'bulk-backfill' AS source
  FROM urls WHERE o_orderkey % 5 = 0
),
fmagg AS (
  SELECT url, MAX(host) AS host, CAST(MAX(priority) AS INT) AS priority,
         MIN(discovered_ts) AS discovered_ts,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM fmall GROUP BY url
),
fmbest AS (
  SELECT url, source AS best_source FROM (
    SELECT url, source,
           ROW_NUMBER() OVER (PARTITION BY url ORDER BY priority DESC, source ASC) AS rn
    FROM fmall
  ) WHERE rn = 1
)
SELECT a.url, a.host, a.priority, a.discovered_ts, a.n_sources, b.best_source
FROM fmagg a JOIN fmbest b USING (url)
""",
        "circuit_breaker": """
WITH cblog AS (
  SELECT 'site' || CAST(user_id % 499 AS VARCHAR) || '.example.com' AS host,
         ts, event_type <> 'error' AS success
  FROM events
),
cbagg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_attempts,
         CAST(SUM(CASE WHEN NOT success THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
         MAX(ts) AS last_attempt,
         MAX(CASE WHEN success THEN ts END) AS last_success
  FROM cblog GROUP BY host
),
cbtrail AS (
  SELECT l.host, CAST(COUNT(*) AS BIGINT) AS trailing_failures
  FROM cblog l JOIN cbagg a ON l.host = a.host
  WHERE a.last_success IS NULL OR l.ts > a.last_success
  GROUP BY l.host
)
SELECT a.host, a.n_attempts, a.n_fail, a.last_attempt, a.last_success,
       CAST(COALESCE(t.trailing_failures, 0) AS BIGINT) AS trailing_failures,
       CASE WHEN COALESCE(t.trailing_failures, 0) >= 2
                 AND a.last_attempt + INTERVAL 172800 SECOND <= TIMESTAMP '2024-02-01 00:00:00'
            THEN 'half_open'
            WHEN COALESCE(t.trailing_failures, 0) >= 2 THEN 'open'
            ELSE 'closed' END AS state
FROM cbagg a LEFT JOIN cbtrail t ON a.host = t.host
""",
        "wat_export": f"""
WITH {_corpus_oracle_tables()},
wath AS (
  SELECT url,
         CASE WHEN substring(upper(hex(html)), 1, 2) = '3C'
              THEN decode(html) ELSE '' END AS s
  FROM c_pages WHERE substring(upper(hex(html)), 1, 2) = '3C'
)
SELECT url, 'metadata' AS warc_type,
       regexp_extract(s, '<title>([^<]*)</title>', 1) AS title,
       CAST(len(regexp_extract_all(s, 'href="([^"]*)"', 1)) AS INT) AS n_links
FROM wath
""",
        "outlink_entropy": f"""
{link_base},
oehosts AS (
  SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
  FROM link_edges
),
oew AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS weight
  FROM oehosts WHERE src_host <> dst_host GROUP BY src_host, dst_host
),
oeagg AS (
  SELECT src_host,
         CAST(COUNT(*) AS BIGINT) AS n_targets,
         CAST(SUM(weight) AS BIGINT) AS n_outlinks,
         CAST(SUM(weight * CAST(round(ln(CAST(weight AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS swln
  FROM oew GROUP BY src_host
)
SELECT src_host, n_targets, n_outlinks,
       CAST(CAST(round(ln(CAST(n_outlinks AS DOUBLE)) * 1000000) AS BIGINT)
            - swln // n_outlinks AS BIGINT) AS entropy_micronat,
       ((CAST(round(ln(CAST(n_outlinks AS DOUBLE)) * 1000000) AS BIGINT)
         - swln // n_outlinks) < 200000 AND n_targets > 1) AS funnel
FROM oeagg
""",
        "ann_sq8": sq_oracle_sql(n_q=5, k=5),
        "seen_sizing": f"""
WITH {_URLS_CTE.strip()},
szn AS (SELECT CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls FROM urls),
szb AS (SELECT CAST(UNNEST([4, 6, 8, 10, 12, 14, 16, 20]) AS BIGINT) AS bits_per_key),
szk AS (
  SELECT n_urls, bits_per_key,
         greatest(CAST(1 AS BIGINT),
                  CAST(round(0.6931471805599453 * bits_per_key) AS BIGINT)) AS k_opt
  FROM szn CROSS JOIN szb
)
SELECT n_urls, bits_per_key,
       CAST(bits_per_key * n_urls AS BIGINT) AS m_bits,
       k_opt,
       CAST(round(pow(1.0 - exp(-CAST(k_opt AS DOUBLE) / CAST(bits_per_key AS DOUBLE)),
                      CAST(k_opt AS DOUBLE)) * 1000000) AS BIGINT) AS fpr_ppm,
       CAST(bits_per_key * n_urls // 8 // 1048576 AS BIGINT) AS mem_mb,
       CAST(bits_per_key * CAST(10000000000 AS BIGINT) // 8 // 1073741824 AS BIGINT)
         AS mem_gb_at_1e10
FROM szk
""",
        "ring_balance": ring_balance_oracle_sql(
            f"WITH {_corpus_cdx_ranked_cte()} "
            "SELECT c.url || '?cap=' || CAST(d.doc_id AS VARCHAR) AS k "
            "FROM documents d JOIN cdxr c ON d.doc_id % 256 = c.rid",
            n_shards=8,
            vnode_counts=(4, 32),
        ),
        "reshard_churn": reshard_oracle_sql(
            f"WITH {_URLS_CTE.strip()} SELECT url AS k FROM urls",
            n_from=8,
            n_to=9,
            vnodes=16,
        ),
    }
    out["keep_longest_dedupe"] = f"""
WITH klaug AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS len FROM (
    SELECT doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text || ' appended tail words' AS text
    FROM documents WHERE doc_id < 50
  )
),
klj AS (
  SELECT b.rep_id, b.doc_id, a.len
  FROM ({out["neardup_dedupe"]}) b JOIN klaug a USING (doc_id)
),
klk AS (
  SELECT rep_id, doc_id AS kept_doc_id, len AS kept_len FROM klj
  QUALIFY ROW_NUMBER() OVER (PARTITION BY rep_id ORDER BY len DESC, doc_id ASC) = 1
),
klsz AS (SELECT rep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM klj GROUP BY rep_id)
SELECT s.rep_id, s.cluster_size,
       CAST(k.kept_doc_id AS BIGINT) AS kept_doc_id,
       CAST(k.kept_len AS BIGINT) AS kept_len
FROM klsz s JOIN klk k USING (rep_id)
"""
    out["robots_delta"] = f"""
WITH {_URLS_CTE.strip()},
rdh AS (SELECT DISTINCT host, site_id FROM urls),
rdv1 AS (
  SELECT host, 'disallow' AS kind,
         UNNEST(CASE WHEN site_id % 4 = 0 THEN ['/admin', '/*.php$']
                     WHEN site_id % 4 = 1 THEN ['/fish*', '/*.htm']
                     WHEN site_id % 4 = 2 THEN ['/']
                     ELSE CAST([] AS VARCHAR[]) END) AS rule
  FROM rdh
  UNION ALL
  SELECT host, 'allow' AS kind,
         UNNEST(CASE WHEN site_id % 4 = 0 THEN ['/admin/public']
                     WHEN site_id % 4 = 1 THEN ['/docs/']
                     WHEN site_id % 4 = 2 THEN ['/order']
                     ELSE CAST([] AS VARCHAR[]) END) AS rule
  FROM rdh
),
rdv2 AS (
  SELECT host, kind, rule FROM rdv1
  UNION ALL
  SELECT host, 'disallow' AS kind, '/tmp' AS rule FROM rdh
  WHERE site_id % 5 IN (0, 2)
  UNION ALL
  SELECT host, 'allow' AS kind, '/new' AS rule FROM rdh
  WHERE site_id % 5 IN (1, 2)
),
rdj AS (
  SELECT COALESCE(a.host, b.host) AS host, COALESCE(a.kind, b.kind) AS kind,
         a.rule AS r1, b.rule AS r2
  FROM rdv1 a FULL OUTER JOIN rdv2 b
    ON a.host = b.host AND a.kind = b.kind AND a.rule = b.rule
),
rdp AS (
  SELECT host,
         CAST(SUM(CASE WHEN r2 IS NOT NULL AND r1 IS NULL AND kind = 'disallow' THEN 1 ELSE 0 END) AS BIGINT) AS dis_added,
         CAST(SUM(CASE WHEN r1 IS NOT NULL AND r2 IS NULL AND kind = 'disallow' THEN 1 ELSE 0 END) AS BIGINT) AS dis_removed,
         CAST(SUM(CASE WHEN r2 IS NOT NULL AND r1 IS NULL AND kind = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS alw_added,
         CAST(SUM(CASE WHEN r1 IS NOT NULL AND r2 IS NULL AND kind = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS alw_removed
  FROM rdj GROUP BY host
)
SELECT host, dis_added, dis_removed, alw_added, alw_removed,
       CASE WHEN (dis_added > 0 OR alw_removed > 0) AND (dis_removed > 0 OR alw_added > 0) THEN 'mixed'
            WHEN dis_added > 0 OR alw_removed > 0 THEN 'tightened'
            WHEN dis_removed > 0 OR alw_added > 0 THEN 'loosened'
            ELSE 'unchanged' END AS change
FROM rdp
"""
    out["anchor_stuffing"] = f"""
WITH {_URLS_CTE.strip()},
{_ANCHOR_EDGES_CTE.strip()},
ash AS (
  SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host, anchor_text
  FROM anchor_edges
),
aspt AS (
  SELECT src_host, anchor_text, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ash GROUP BY src_host, anchor_text
),
astop AS (
  SELECT src_host, anchor_text AS top_text, cnt AS top_n FROM aspt
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src_host ORDER BY cnt DESC, anchor_text) = 1
),
asagg AS (
  SELECT src_host, CAST(SUM(cnt) AS BIGINT) AS n_anchors,
         CAST(COUNT(*) AS BIGINT) AS n_texts
  FROM aspt GROUP BY src_host
)
SELECT a.src_host, a.n_anchors, a.n_texts, t.top_text,
       CAST(t.top_n AS BIGINT) AS top_n,
       CAST((1000000 * t.top_n) // greatest(CAST(1 AS BIGINT), a.n_anchors) AS BIGINT) AS top_share_ppm,
       ((1000000 * t.top_n) // greatest(CAST(1 AS BIGINT), a.n_anchors) >= 800000
        AND a.n_anchors >= 10) AS stuffed
FROM asagg a JOIN astop t USING (src_host)
"""
    out["capture_coverage"] = f"""
WITH {_corpus_oracle_tables()},
ccreq AS (SELECT DISTINCT base_url AS url FROM c_req),
cccap AS (
  SELECT DISTINCT url FROM c_cdx
  WHERE status_code = 200 AND mimetype <> 'warc/revisit'
),
ccj AS (
  SELECT regexp_extract(r.url, '^https?://([^/]+)', 1) AS host,
         CASE WHEN c.url IS NULL THEN 0 ELSE 1 END AS _cap
  FROM ccreq r LEFT JOIN cccap c ON r.url = c.url
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_requested,
       CAST(SUM(_cap) AS BIGINT) AS n_captured,
       CAST((1000000 * CAST(SUM(_cap) AS BIGINT)) // COUNT(*) AS BIGINT) AS coverage_ppm
FROM ccj GROUP BY host
"""
    from sandcrawler_spark.functions.mime import normalize_mime_oracle_case as _nmoc

    out["cdx_export"] = f"""
WITH {_CAPTURES_CTE.strip()},
cx AS (
  SELECT 'org,example,stream)/u/' || regexp_extract(url, '/u/(\\d+)$', 1) AS surt,
         datetime, url,
         COALESCE({_nmoc("mimetype")}, 'application/octet-stream') AS mimetype,
         CAST(status_code AS INT) AS http_status,
         translate(sha1hex, '0123456789abcdef', 'ABCDEFGHIJKLMNOP') AS sha1b32,
         CAST(warc_csize AS BIGINT) AS warc_csize,
         CAST(event_id % 100000 AS BIGINT) AS warc_offset,
         warc_path
  FROM captures
)
SELECT surt, datetime, url, mimetype, http_status, sha1b32,
       warc_csize, warc_offset, warc_path
FROM cx
"""
    from sandcrawler_spark.operators.bandit import isqrt_oracle as _isq

    out["mixture_epochs"] = f"""
WITH mep AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
mew AS (SELECT *, CAST({_isq("n_tokens")} AS BIGINT) AS w FROM mep),
met AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total, CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM mew),
mex AS (
  SELECT m.source, m.n_docs, m.n_tokens,
         CAST((1000000 * m.w) // greatest(CAST(1 AS BIGINT), t.w_total) AS BIGINT) AS weight_ppm,
         t.tok_total
  FROM mew m CROSS JOIN met t
)
SELECT source, n_docs, n_tokens, weight_ppm,
       CAST((tok_total * weight_ppm) // 1000000 AS BIGINT) AS alloc_tokens,
       CAST((1000 * ((tok_total * weight_ppm) // 1000000))
            // greatest(CAST(1 AS BIGINT), n_tokens) AS BIGINT) AS epochs_milli
FROM mex
"""
    out["dup_cluster_histogram"] = f"""
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM (
  SELECT rep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM ({out["neardup_dedupe"]}) ndbase
  GROUP BY rep_id
) ndsz
GROUP BY cluster_size
"""
    cfg_selects = []
    for bands, rows in ((2, 4), (4, 2), (8, 1)):
        cfg_selects.append(f"""
SELECT {bands} AS bands, {rows} AS rows_per_band,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN t.is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_candidates
FROM (
  SELECT DISTINCT ca.doc_id AS id_a, cb.doc_id AS id_b
  FROM (SELECT doc_id, bi, md5(array_to_string(sig[bi*{rows}+1:bi*{rows}+{rows}], ',')) AS bkey
        FROM sigs, (SELECT unnest(range(0, {bands})) AS bi)) ca
  JOIN (SELECT doc_id, bi, md5(array_to_string(sig[bi*{rows}+1:bi*{rows}+{rows}], ',')) AS bkey
        FROM sigs, (SELECT unnest(range(0, {bands})) AS bi)) cb
    ON ca.bi = cb.bi AND ca.bkey = cb.bkey
  WHERE ca.doc_id < cb.doc_id
) c JOIN lt_truth t ON t.id_a = c.id_a AND t.id_b = c.id_b
""".strip())
    cfg_union = "\nUNION ALL\n".join(cfg_selects)
    out["lsh_tuning"] = f"""
WITH {_LSH_CTES},
lt_truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         2 * len(list_intersect(a.sh, b.sh)) >= len(list_distinct(list_concat(a.sh, b.sh))) AS is_true
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
  WHERE len(a.sh) > 0 AND len(b.sh) > 0
),
lt_tp AS (
  SELECT CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs
  FROM lt_truth
),
lt_cfg AS (
{cfg_union}
)
SELECT c.bands, c.rows_per_band, c.n_candidates, c.n_true_candidates, p.n_true_pairs,
       CAST((1000000 * c.n_true_candidates)
            // greatest(CAST(1 AS BIGINT), p.n_true_pairs) AS BIGINT) AS recall_ppm,
       CAST((1000000 * c.n_true_candidates)
            // greatest(CAST(1 AS BIGINT), c.n_candidates) AS BIGINT) AS precision_ppm
FROM lt_cfg c CROSS JOIN lt_tp p
"""
    # derived rollups: wrap an existing per-row oracle in an outer
    # aggregate so the twin stays mechanically in sync with its base
    out["robots_coverage"] = f"""
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN disallowed THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST((1000000 * CAST(SUM(CASE WHEN disallowed THEN 1 ELSE 0 END) AS BIGINT))
            // COUNT(*) AS BIGINT) AS blocked_ppm
FROM ({out["robots_match"]}) rmbase
GROUP BY host
"""
    return out


if __name__ == "__main__":
    from sandcrawler_spark.session import get_spark

    s = get_spark("entry_smoke")
    df = entry(s)
    df.show(5, truncate=False)
    print("rows:", df.count())
