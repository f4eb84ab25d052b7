"""Bucketed interval (range) joins.

The crawl/ops workload keeps needing "which points fall inside which
windows": captures inside host maintenance windows, fetches inside
politeness blackout intervals, events inside incident windows. The
naive Spark plan for `p.ts BETWEEN w.start AND w.end` is a broadcast
nested-loop / cartesian product — O(|points| * |windows|) compares,
which dies long before 100 TB.

The classic fix (used by every production range-join implementation,
e.g. Spark's own range-join hints and Flink's interval join) is
*bucketing*: quantize time into fixed-width buckets, explode each
window onto the buckets it covers, bucket each point once, equi-join
on (key, bucket), and keep a residual predicate for exactness. Cost
becomes O(|points| + sum(window_span / bucket)) shuffled rows with an
ordinary hash join — no cartesian anywhere, and the (key, bucket)
shuffle spreads hot keys across as many tasks as they have buckets.

A point lands in exactly one bucket and a window covers that bucket
at most once, so the equi-join emits each qualifying (point, window)
pair exactly once — no post-join dedupe.

Pick `bucket_seconds` near the median window span: much smaller and
the window explode fans out; much larger and the residual filter does
the work. Both degrade gracefully, neither is a cliff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    windows: DataFrame,
    key: str = "host",
    point_ts: str = "ts_sec",
    w_start: str = "start_sec",
    w_end: str = "end_sec",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join points into half-open windows [start, end) sharing
    `key`, via bucket expansion — returns all point columns plus the
    window's columns. Integer-second timestamps (epoch) on both
    sides; callers derive them with unix_timestamp (which floors,
    matching DuckDB's floor(epoch(ts)) — see BENCH notes).

    Windows with end <= start are dropped (empty half-open range).
    """
    b = int(bucket_seconds)
    if b <= 0:
        raise ValueError("bucket_seconds must be positive")

    w = (
        windows.filter(F.col(w_end) > F.col(w_start))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{w_start} div {b}"),
                    # end is exclusive: a window ending exactly on a
                    # bucket boundary does not cover that bucket
                    F.expr(f"({w_end} - 1) div {b}"),
                )
            ),
        )
    )
    p = points.withColumn("_bucket", F.expr(f"{point_ts} div {b}"))
    joined = p.join(w, on=[key, "_bucket"], how="inner").filter(
        (F.col(point_ts) >= F.col(w_start)) & (F.col(point_ts) < F.col(w_end))
    )
    return joined.drop("_bucket")
