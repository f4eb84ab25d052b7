"""Per-host circuit breaker from the fetch log — the operational
guard every polite crawler runs next to its retry scheduler: a host
whose recent fetches are all failing gets its lane opened (paused)
before the frontier wastes budget and the host's operator gets angry.
Reference analog: sandcrawler's workers back off per-host on repeated
SPN/wayback errors and the ingest loop skips hosts mid-batch
(/root/reference/python/sandcrawler/workers.py retry/backoff
handling); this is that policy as a relational operator with explicit
closed/open/half-open states.

Semantics (classic breaker, batch form):
- trailing_failures = attempts strictly AFTER the host's last success
  (all attempts, if it never succeeded);
- state = 'open'      if trailing_failures >= fail_threshold and the
                      last attempt is within cooloff_s of `now`;
        = 'half_open' if trailing_failures >= fail_threshold but the
                      host has cooled off (one probe fetch allowed);
        = 'closed'    otherwise.

Scale shape: two host-keyed aggregates over the fetch log (the second
pass re-joins on the SAME host hash partitioning, so AQE reuses the
exchange) — no window over per-host event sequences (a hot host's
log is ~the whole fetch history at 100 TB; the aggregate ships one
partial per partition instead). All comparisons are on event-time
values; `now` is an explicit expression, never wall-clock, so the
operator is deterministic and replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def circuit_breaker(
    fetch_log: DataFrame,
    now_expr: str = "timestamp'2024-02-01 00:00:00'",
    fail_threshold: int = 3,
    cooloff_s: int = 3600,
    host_col: str = "host",
    ts_col: str = "ts",
    success_col: str = "success",
) -> DataFrame:
    """Returns (host, n_attempts, n_fail, last_attempt, last_success,
    trailing_failures, state)."""
    log = fetch_log.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).alias("ts"),
        F.col(success_col).cast("boolean").alias("success"),
    )
    agg = log.groupBy("host").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.sum(F.when(~F.col("success"), 1).otherwise(0)).cast("long").alias("n_fail"),
        F.max("ts").alias("last_attempt"),
        F.max(F.when(F.col("success"), F.col("ts"))).alias("last_success"),
    )
    trailing = (
        log.join(agg.select("host", "last_success"), "host")
        .where(F.col("last_success").isNull() | (F.col("ts") > F.col("last_success")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("trailing_failures"))
    )
    out = (
        agg.join(trailing, "host", "left")
        .withColumn(
            "trailing_failures",
            F.coalesce("trailing_failures", F.lit(0)).cast("long"),
        )
    )
    tripped = F.col("trailing_failures") >= F.lit(fail_threshold)
    cooled = F.col("last_attempt") + F.expr(f"INTERVAL {int(cooloff_s)} SECOND") <= F.expr(
        now_expr
    )
    return out.withColumn(
        "state",
        F.when(tripped & cooled, F.lit("half_open"))
        .when(tripped, F.lit("open"))
        .otherwise(F.lit("closed")),
    ).select(
        "host", "n_attempts", "n_fail", "last_attempt", "last_success",
        "trailing_failures", "state",
    )
