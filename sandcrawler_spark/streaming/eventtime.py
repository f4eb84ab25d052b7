"""Event-time stream analytics over the crawl: watermarked windowed
aggregations + a custom stateful per-host operator.

The reference's Kafka loop is purely arrival-ordered (no event-time
semantics to reproduce — SURVEY.md §2.8); these operators are the
Spark-native layer a production crawl adds on top: per-host fetch-rate
windows (the politeness feedback signal; the reference's equivalent is
its per-host backpressure counters, workers.py:534-554) tolerant of
late/replayed capture records, and a stateful host budget tracker.

  windowed_host_rates  — readStream -> withWatermark -> window group:
      per-host fetch counts per tumbling event-time window; late rows
      inside the watermark still land in their window, older ones are
      dropped deterministically.
  stateful_host_budget — applyInPandasWithState: per-host running
      fetch count with a processing-time idle timeout; emits a row per
      update with over_budget once a host exceeds its budget (the
      streaming twin of the politeness quota — flags hosts the static
      schedule would have throttled).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_BUDGET_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("total_fetched", T.LongType()),
        T.StructField("over_budget", T.BooleanType()),
    ]
)

HOST_BUDGET_STATE = T.StructType([T.StructField("total", T.LongType())])


def windowed_host_rates(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    host_col: str = "host",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host fetch counts per tumbling event-time window, tolerant
    of records arriving up to `watermark` late. State for closed
    windows is dropped — the aggregation holds O(hosts x open windows)
    state regardless of stream length.

    Works on batch DataFrames too (watermarks only apply to streams —
    e.g. the politeness_timing validation rolls a batch of planned
    fetch timestamps through the same window op)."""
    src = pages.withWatermark(ts_col, watermark) if pages.isStreaming else pages
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(host_col))
        .agg(F.count("*").alias("n_fetched"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            host_col,
            "n_fetched",
        )
    )


def stateful_host_budget(
    pages: DataFrame,
    budget: int,
    host_col: str = "host",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: running per-host fetched count across
    micro-batches via applyInPandasWithState. Emits one row per host
    per batch with the updated total and the over-budget flag.

    idle_timeout_ms: when set, hosts idle past the timeout have their
    state evicted (bounded state for continuous deployments). Leave
    None for Trigger.AvailableNow batch drains — a pending
    processing-time timer keeps the query alive until it fires, so the
    drain would block for the full timeout."""

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms else GroupStateTimeout.NoTimeout
    )

    def _update(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            state.remove()
            return
        prev = state.get[0] if state.exists else 0
        n = sum(len(pdf) for pdf in batches)
        total = prev + n
        state.update((total,))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"host": [host], "total_fetched": [total], "over_budget": [total > budget]}
        )

    return (
        pages.groupBy(host_col)
        .applyInPandasWithState(
            _update,
            outputStructType=HOST_BUDGET_OUTPUT,
            stateStructType=HOST_BUDGET_STATE,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def sessionize(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str | None = None,
):
    """Gap-based sessionization: consecutive events of one key closer
    than `gap` belong to one session (session end = last event + gap
    — Spark's session_window semantics). Works identically over a
    batch DataFrame and a watermarked stream (session_window is a
    native streaming-stateful operator: state per OPEN session only,
    closed sessions emit and evict — bounded state at any scale, the
    same reason the host-rate windows use withWatermark).

    Returns one row per (key, session): key, session_start,
    last_event, session_end (= last_event + gap), n_events, and
    sum_value rounded to 2 decimals when value_col is given.

    Scale shape: ONE shuffle on the key (session assembly is
    partition-local merge of sorted runs inside Spark's
    UpdatingSessionsExec); no self-join, no global sort. The DuckDB
    twin replays it as lag-gap-flag + running-sum session ids — the
    relational statement of the same semantics."""
    from pyspark.sql import functions as F

    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("last_event"),
        F.count("*").cast("long").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    g = df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
    out = g.agg(*aggs)
    return out.select(
        key_col,
        "session_start",
        "last_event",
        F.col("session_window.end").alias("session_end"),
        "n_events",
        *(["sum_value"] if value_col is not None else []),
    )
