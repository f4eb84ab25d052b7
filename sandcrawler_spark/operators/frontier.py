"""Frontier construction: seeds ⟕ prior results -> prioritized work.

Parity targets:
  - recrawl-staleness selection (/root/reference/sql/
    dump_reingest_weekly.sql:1-96): ingest_request LEFT JOIN
    ingest_file_result, keep rows never attempted OR attempted with a
    retryable status inside an age window (older than `fresh_for`,
    younger than `give_up_after`).
  - priority lanes (kafka/topics.md:26-36 interactive-vs-bulk split;
    sandcrawler_worker.py:203-210): priority column, higher first.
  - queue cap + deterministic spread (sql/reingest_weekly.sh:20
    `shuf | head -n40000`): seeded-hash order + limit, so the cap is
    reproducible (md5-order replaces shuf — same spreading effect,
    deterministic).
  - in-batch dedupe by PK before upsert (db.py:124-128):
    row_number()==1 per canonical URL.

Everything here is pure Catalyst (joins + window + filters); at scale
the join shuffles on base_url which is near-unique → no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sandcrawler_spark.functions.urls import clean_url_udf, host_col, surt_udf

RETRYABLE_STATUSES = (
    "no-capture",
    "cdx-error",
    "wayback-error",
    "petabox-error",
    "spn2-cdx-lookup-failure",
    "gateway-timeout",
    "terminal-bad-status",
)


def build_frontier(
    ingest_request: DataFrame,
    ingest_file_result: DataFrame | None,
    now_expr: str = "timestamp'2024-02-01 00:00:00'",
    fresh_for_hours: int = 8,
    give_up_after_days: int = 8,
    cap: int | None = None,
) -> DataFrame:
    """Returns prioritized frontier rows:
    (ingest_type, base_url, url, canon_url, surt, host, priority,
     link_depth, retry) deduped by canonical URL."""
    req = ingest_request.withColumn("canon_url", clean_url_udf(F.col("base_url")))

    if ingest_file_result is not None and not ingest_file_result.isEmpty():
        res = ingest_file_result.select(
            F.col("ingest_type").alias("r_type"),
            F.col("base_url").alias("r_base"),
            F.col("status").alias("prev_status"),
            F.col("updated").alias("prev_updated"),
        )
        j = req.join(
            res,
            (req["ingest_type"] == res["r_type"]) & (req["base_url"] == res["r_base"]),
            "left",
        )
        now = F.expr(now_expr)
        age_ok = (
            (F.col("prev_updated") < now - F.expr(f"INTERVAL {fresh_for_hours} HOURS"))
            & (F.col("prev_updated") > now - F.expr(f"INTERVAL {give_up_after_days} DAYS"))
        )
        keep = (
            F.col("prev_status").isNull()
            | (F.col("prev_status").isin(*RETRYABLE_STATUSES) & age_ok)
        )
        j = j.filter(keep).withColumn("retry", F.col("prev_status").isNotNull())
        req = j.drop("r_type", "r_base", "prev_status", "prev_updated")
    else:
        req = req.withColumn("retry", F.lit(False))

    # staleness/priority boost: interactive lanes first, retries last
    prio = (
        F.coalesce(F.col("priority"), F.lit(0)) * 10
        - F.coalesce(F.col("link_depth"), F.lit(0))
        - F.when(F.col("retry"), 5).otherwise(0)
    )
    out = (
        req.withColumn("priority", prio)
        .withColumn("url", F.col("canon_url"))
        .withColumn("surt", surt_udf(F.col("canon_url")))
        .withColumn("host", host_col(F.col("canon_url")))
    )
    # dedupe by canonical URL: keep the highest-priority request
    w = Window.partitionBy("ingest_type", "canon_url").orderBy(
        F.desc("priority"), F.asc("link_source"), F.asc("link_source_id")
    )
    out = out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    if cap is not None:
        # deterministic "shuf | head -N": md5-order spreads hosts
        out = out.orderBy(F.md5(F.concat_ws("|", "ingest_type", "canon_url"))).limit(cap)
    return out


def merge_frontiers(*snapshots: DataFrame) -> DataFrame:
    """Merge frontier snapshots from independent request sources into
    one deduplicated frontier — the reference continuously folds
    fatcat-ingest, save-paper-now, and bulk-backfill request streams
    into one postgres ingest_request table keyed by (type, base_url)
    with ON CONFLICT keep-best semantics (/root/reference/sql/
    sandcrawler_schema.sql ingest_request PK + python/persist
    upserts); this is that merge as a relational operator.

    Each snapshot carries (url, host, priority, discovered_ts,
    source). Per URL across all snapshots: highest priority wins,
    earliest discovery timestamp is kept (recrawl scheduling keys off
    first-seen), and the source lineage is preserved as a distinct
    count + the lexicographically-first source tag of a
    highest-priority row (deterministic exemplar).

    Scale shape: union is free (no shuffle); ONE groupBy(url)
    aggregate with map-side partials does everything — no window, no
    join. URL keys are near-unique so the shuffle is skew-free; a
    10^10-row frontier merge is exactly one exchange.
    """
    if not snapshots:
        raise ValueError("merge_frontiers needs at least one snapshot")
    cols = ["url", "host", "priority", "discovered_ts", "source"]
    u = snapshots[0].select(*cols)
    for s in snapshots[1:]:
        u = u.unionByName(s.select(*cols))
    # min_by over a (priority desc, source asc) sort key: the exemplar
    # is the lexicographically-first source among the highest-priority
    # rows — one aggregate, no window
    return u.groupBy("url").agg(
        F.max("host").alias("host"),
        F.max(F.col("priority").cast("int")).alias("priority"),
        F.min("discovered_ts").alias("discovered_ts"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.expr("min_by(source, struct(-priority, source))").alias("best_source"),
    )
