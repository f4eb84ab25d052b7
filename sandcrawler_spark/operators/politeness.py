"""Per-host politeness scheduler with explicit skew handling.

Semantics (north rule; reference analogs: per-host backpressure
workers.py:534-554, randomized queue spreading reingest_weekly.sh:20,
deterministic re-enqueue ordering RUNBOOK.md):

  Given a frontier with (host, priority, ...) and per-host budgets
  (robots.max_parallel, crawl_delay), assign every URL a
  (crawl_round, seq_in_round) such that:
    - within a host, higher-priority URLs are scheduled first,
    - a host never gets more than its quota per round,
    - the assignment is DETERMINISTIC at any parallelism/partitioning.

The core primitive is rank-within-key over a skewed key (a hot host
can hold 10-20% of a web-scale frontier — a plain
Window.partitionBy(host) puts that host in ONE task and stalls the
stage). `ranked_within_key` is the skew-proof two-pass version:

  1. repartitionByRange(host, *order, uid) + sortWithinPartitions —
     the range partitioner SPLITS a hot host across many partitions
     while preserving global (host, order) sort order.
  2. per-(partition, host) row counts — a tiny aggregate (≤ P·H rows)
     — turned into running offsets per host.
  3. broadcast offsets back; local row_number within (partition, host)
     + offset = exact global rank within host.

This is the classic distributed-ranking (zipWithIndex) construction;
wall-clock is bounded by partition size, not hottest-host size.
`ranked_simple` (plain window) is kept as the semantic oracle; tests
assert equality on skewed inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_simple(df: DataFrame, key: str, order_cols: list) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("rank_in_key", F.row_number().over(w) - 1)


def ranked_within_key(df: DataFrame, key: str, order_cols: list, num_partitions: int | None = None) -> DataFrame:
    """Exact 0-based rank of each row within its key group under
    order_cols, skew-proof. order_cols must be a total order (include
    a unique tiebreaker)."""
    num_partitions = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    parted = (
        df.repartitionByRange(int(num_partitions), F.col(key), *order_cols)
        .sortWithinPartitions(F.col(key), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # reuse one materialization for both passes
    parted = parted.persist()
    counts = parted.groupBy("_pid", key).count()
    # offset for (pid, host) = total rows of same host in lower pids
    w = (
        Window.partitionBy(key)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn("_offset", F.coalesce(F.sum("count").over(w), F.lit(0))).drop(
        "count"
    )
    local_w = Window.partitionBy("_pid", key).orderBy(*order_cols)
    out = (
        parted.join(F.broadcast(offsets), on=["_pid", key], how="inner")
        .withColumn("rank_in_key", F.row_number().over(local_w) - 1 + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    return out


def schedule_politeness(
    frontier: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    order_cols: list | None = None,
    default_quota: int = 2,
    skew_safe: bool = True,
) -> DataFrame:
    """Assign (crawl_round, seq_in_round) per URL.

    robots: (host, max_parallel, disallow_prefixes, crawl_delay_s) —
    small dimension table, broadcast. URLs matching a disallow prefix
    are excluded with status 'skip-robots' (kept, flagged, so lineage
    accounts for every input row).
    """
    order_cols = order_cols or [F.desc("priority"), F.asc("url")]
    r = robots.select(
        F.col("host").alias(host_col),
        F.col("max_parallel"),
        F.col("disallow_prefixes"),
        F.col("crawl_delay_s"),
    )
    j = frontier.join(F.broadcast(r), on=host_col, how="left")
    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    disallowed = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    j = j.withColumn("robots_excluded", disallowed).withColumn(
        "quota", F.coalesce(F.col("max_parallel"), F.lit(default_quota))
    )
    allowed = j.filter(~F.col("robots_excluded"))
    ranker = ranked_within_key if skew_safe else ranked_simple
    ranked = ranker(allowed, host_col, order_cols)
    out = ranked.withColumn(
        "crawl_round", (F.col("rank_in_key") / F.col("quota")).cast("int")
    ).withColumn("seq_in_round", F.pmod(F.col("rank_in_key"), F.col("quota")).cast("int"))
    excluded = j.filter(F.col("robots_excluded")).withColumn(
        "rank_in_key", F.lit(None).cast("long")
    ).withColumn("crawl_round", F.lit(None).cast("int")).withColumn(
        "seq_in_round", F.lit(None).cast("int")
    )
    return out.unionByName(excluded).drop("max_parallel", "disallow_prefixes")
