"""Streaming deduplication: first-seen-wins over an unbounded stream.

The reference dedupes on arrival through HBase existence checks (one
row per sha1hex; `CrawlResultHBase` keyed on the hash — SURVEY.md
§2.8 "dedupe state") — an external KV store consulted per batch. The
Spark-native equivalent keeps the seen-set INSIDE the engine as
streaming state, sharded by the state-store partitioning, recovered
from the checkpoint on resume:

  stream_dedupe_watermarked — built-in dropDuplicatesWithinWatermark:
      exactly-once emission per key among records whose event times
      fall inside the watermark horizon; state for expired keys is
      dropped — bounded state, the 100 TB-correct default when dup
      arrivals cluster in time (re-crawls of the same URL land within
      days of each other).
  stream_first_seen — applyInPandasWithState: permanent first-seen
      semantics (the HBase-check twin) plus a per-key suppressed-dup
      counter the built-in cannot produce. State is one row per key —
      at crawl scale (10^10 keys) this needs the RocksDB state store
      (spark.sql.streaming.stateStore.providerClass) rather than the
      default heap HDFS store; the operator itself is provider-
      agnostic.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedupe_watermarked(
    df: DataFrame, key_cols: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Emit the first record per key among arrivals within the
    watermark horizon; duplicate arrivals later than the horizon are
    emitted again (state was reclaimed). Batch DataFrames fall back to
    plain dropDuplicates for dev parity."""
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("is_first", T.BooleanType()),
        T.StructField("n_dups_suppressed", T.LongType()),
    ]
)

FIRST_SEEN_STATE = T.StructType([T.StructField("n_seen", T.LongType())])


def stream_first_seen(df: DataFrame, key_col: str) -> DataFrame:
    """Permanent first-seen dedupe with dup accounting. For every
    micro-batch that touches a key, emits one row: is_first marks the
    batch where the key appeared for the first time ever; later
    batches report the same key with is_first=false and the updated
    suppressed-duplicate count. Downstream keeps `is_first` rows (the
    deduped lane) and can monitor dup pressure from the counters —
    the two outputs the reference derives from HBase put-vs-exists."""

    def _update(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        n = sum(len(pdf) for pdf in batches)
        if n == 0:
            return
        prev = state.get[0] if state.exists else 0
        state.update((prev + n,))
        yield pd.DataFrame(
            {
                "key": [k],
                "is_first": [prev == 0],
                "n_dups_suppressed": [prev + n - 1],
            }
        )

    keyed = df.select(df[key_col].alias("key"))
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
