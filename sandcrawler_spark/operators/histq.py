"""Mergeable decimal-HDR histogram quantiles — bounded-state
percentiles for continuous crawl monitoring (per-host fetch-latency
p99s, response-size p50s) where the exact `percentile()` rollup
(q_event_quantiles) would re-shuffle the full value stream every
round.

Design (an HDR histogram with DECIMAL buckets, so bucketing needs no
libm): a non-negative integer value v lands in bucket
(e, sub) = (digits(v) - 1, first-two-digits(v)) — i.e. two significant
decimal digits, pure string/integer arithmetic that DuckDB replays
byte-for-byte (log-based binning would hinge on cross-engine libm
ulps at bucket boundaries). Relative bucket width is <= 10% of the
value (1/first-two-digits), so any quantile estimate's lower bound is
within one bucket of the true order statistic. State is <= 90 buckets
per decade per group — a fixed few hundred rows per group at ANY
stream length, and two sketches merge by summing bucket counts
(linear), so per-round partials combine exactly like the CMS/HLL
sketches.

Everything downstream of the counts is integer: the quantile is the
lower bound of the bucket containing the 1-based rank
ceil(q * N) (clamped to >= 1), computed with a per-group running sum
over the (tiny) bucket relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decimal_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Bucket counts: group_cols + (e, sub, cnt). value_col must be a
    non-negative integral column (scale doubles to cents first, the
    cumulative_events discipline). Values 0-9 get sub = v with e = 0
    (exact singleton buckets); v >= 10 gets its first two digits."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("long")
    s = v.cast("string")
    e = (F.length(s) - 1).cast("int")
    sub = F.when(v < 10, v.cast("int")).otherwise(
        F.substring(s, 1, 2).cast("int")
    )
    return (
        df.select(*group_cols, e.alias("e"), sub.alias("sub"))
        .groupBy(*group_cols, "e", "sub")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Sum bucket counts across sketches (rounds/shards) — linear, so
    merge(shards) == sketch(union) exactly."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def bucket_low_col():
    """Lower bound of bucket (e, sub) as a long: sub followed by e-1
    zeros (== sub * 10^(e-1)) for e >= 1, sub itself for the singleton
    e = 0 buckets. String concat, not pow(): zero libm in the value
    path."""
    return F.when(F.col("e") == 0, F.col("sub").cast("long")).otherwise(
        F.concat(
            F.col("sub").cast("string"), F.expr("repeat('0', e - 1)")
        ).cast("long")
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group quantile estimates from a bucket relation:
    group_cols + (q, n, est) where est is the lower bound of the
    bucket holding the rank-ceil(q*N) value (1-based, clamped to 1).
    The per-group running sum runs over the bucket relation (a few
    hundred rows per group), never the raw values."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy("e", "sub") if group_cols else (
        Window.orderBy("e", "sub")
    )
    wn = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    cum = (
        hist.withColumn("_cum", F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .withColumn("_n", F.sum("cnt").over(wn))
        .withColumn("_low", bucket_low_col())
    )
    outs = []
    for q in qs:
        rank = F.greatest(F.ceil(F.lit(float(q)) * F.col("_n")), F.lit(1)).cast("long")
        hit = (
            cum.filter(F.col("_cum") >= rank)
            .groupBy(*group_cols)
            .agg(
                F.min(F.struct("e", "sub", "_low", "_n")).alias("_f"),
            )
            .select(
                *group_cols,
                F.lit(float(q)).alias("q"),
                F.col("_f._n").alias("n"),
                F.col("_f._low").cast("long").alias("est"),
            )
        )
        outs.append(hit)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
