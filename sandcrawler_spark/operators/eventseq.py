"""Event-sequence analytics: Markov transitions and rate anomalies.

The reference's crawl loop emits per-URL status streams (Kafka stage
counters, ingest result codes — sandcrawler's workers push
success/retry/error outcomes per attempt); two standard analyses over
such streams that the reference computes ad-hoc in notebooks are made
first-class here:

- `event_transitions`: the first-order Markov transition matrix of
  event types per entity stream (which status follows which — e.g.
  how often does `retry` resolve to `success` vs decay to `error`).
- `hourly_rate_anomalies`: robust per-host traffic anomaly flags via
  median + MAD (median absolute deviation) — the standard
  outlier-resistant alternative to mean/stddev for bursty crawl
  traffic, where one hot hour would inflate a stddev threshold.

Both are integer-exact cross-engine: transition probabilities are
ppm floor-divisions, and the MAD test is carried out on 2x/8x-scaled
integers so the half-integer medians of integer counts stay exactly
representable (no float comparisons at the decision boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n, p_ppm): counts and row-normalized
    probabilities of consecutive event-type pairs within each key's
    stream, ordered by (ts, tiebreak) for determinism under ts ties.

    Scale shape: the lag window partitions by `key_col` — one task
    never holds more than one entity's stream, and entity streams
    (users, hosts) are short relative to the corpus, so there is no
    single-task accumulation. The pair count is an ordinary
    map-side-combined groupBy on a bounded domain (|types|^2 cells).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(key_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("_row_total"))
    return (
        counts.join(totals, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("(n * CAST(1000000 AS BIGINT)) div _row_total")
            .cast("long")
            .alias("p_ppm"),
        )
    )


def hourly_rate_anomalies(
    events: DataFrame,
    host_col,
    ts_col: str = "ts",
    k_mad: int = 3,
) -> DataFrame:
    """Per (host, hour) request counts flagged against a per-host
    median + k*MAD threshold: is_anomaly <=> cnt > median + k*MAD.

    Integer-exact scaling: counts are integers, so their median is
    integer or half-integer; `med2` = round(2*median) is exact, the
    deviations `4*|cnt - median| = |4*cnt - 2*med2|` are integers,
    and `mad8` = round(2*median(dev4)) = 8*MAD is exact. The flag
    compares `8*cnt > 4*med2 + k*mad8` — pure int64, no float at the
    boundary, so Spark and the DuckDB twin (quantile_cont) agree
    bit-for-bit. Uses Spark's exact `percentile`, not
    percentile_approx.

    Scale shape: one groupBy to hourly counts (map-side combined),
    then two host-level exact-percentile aggs over at most
    hours-per-host rows each (bounded: 8760/host/year), joined back
    broadcast-small. No windows, no skew cliff — a hot host still
    only contributes its hour count rows.
    """
    hours = (
        events.select(host_col.alias("host"), F.date_trunc("hour", ts_col).alias("hour"))
        .groupBy("host", "hour")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    med = hours.groupBy("host").agg(
        F.expr("CAST(round(2 * percentile(cnt, 0.5)) AS BIGINT)").alias("med2")
    )
    dev = hours.join(med, "host").withColumn(
        "dev4", F.abs(F.expr("4 * cnt - 2 * med2"))
    )
    mad = dev.groupBy("host").agg(
        F.expr("CAST(round(2 * percentile(dev4, 0.5)) AS BIGINT)").alias("mad8")
    )
    return (
        dev.join(mad, "host")
        .select(
            "host",
            "hour",
            "cnt",
            "med2",
            "mad8",
            (F.expr("8 * cnt") > F.expr(f"4 * med2 + {int(k_mad)} * mad8")).alias(
                "is_anomaly"
            ),
        )
    )


def ewma_host_trend(
    events: DataFrame,
    host_col,
    ts_col: str = "ts",
    alpha_denom: int = 8,
    band_pct: int = 15,
) -> DataFrame:
    """Per-host traffic trend via an integer EWMA over the hourly
    count series: s_0 = D*x_0, s_t = s_{t-1} + (D*x_t - s_{t-1}) div D
    (alpha = 1/D, state carried in D-ths so every step is exact
    int64; `div` truncates toward zero in BOTH engines, so the fold
    replays bit-for-bit). The EWMA weights recent hours, the mean
    weights all equally — final EWMA more than band_pct% above the
    mean flags a RISING host (rate-limit risk / trap signature),
    below it a falling one. Complements hourly_rate_anomalies: MAD
    catches single-hour spikes, the EWMA catches sustained drift that
    never has an anomalous hour.

    Scale shape: one (host, hour) count shuffle (map-side combined),
    then one collect_list per host — bounded by hours-per-host
    (8760/year), never request volume; the fold is a narrow Catalyst
    higher-order function, zero Python. Returns (host, n_hours,
    sum_cnt, ewma_scaled, mean_scaled, trend).
    """
    d = int(alpha_denom)
    lo, hi = 100 - int(band_pct), 100 + int(band_pct)
    hours = (
        events.select(host_col.alias("host"), F.date_trunc("hour", ts_col).alias("hour"))
        .groupBy("host", "hour")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    arrs = hours.groupBy("host").agg(
        F.expr("transform(sort_array(collect_list(struct(hour, cnt))), e -> e.cnt)").alias("_xs"),
        F.count("*").cast("long").alias("n_hours"),
        F.sum("cnt").cast("long").alias("sum_cnt"),
    )
    return arrs.select(
        "host",
        "n_hours",
        "sum_cnt",
        F.expr(
            f"aggregate(_xs, CAST(-1 AS BIGINT), (acc, x) -> "
            f"CASE WHEN acc < 0 THEN {d} * x "
            f"ELSE acc + (({d} * x - acc) div {d}) END)"
        ).alias("ewma_scaled"),
        F.expr(f"CAST(({d} * sum_cnt) div n_hours AS BIGINT)").alias("mean_scaled"),
    ).select(
        "host",
        "n_hours",
        "sum_cnt",
        "ewma_scaled",
        "mean_scaled",
        F.expr(
            f"CASE WHEN ewma_scaled * 100 > mean_scaled * {hi} THEN 'rising' "
            f"WHEN ewma_scaled * 100 < mean_scaled * {lo} THEN 'falling' "
            f"ELSE 'flat' END"
        ).alias("trend"),
    )
