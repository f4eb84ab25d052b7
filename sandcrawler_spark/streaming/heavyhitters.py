"""Streaming decayed heavy hitters: sharded Space-Saving summaries
(Metwally et al. 2005) with exponential per-batch decay, maintained
across micro-batches in a parquet-backed state store.

The crawl question this answers continuously: "which hosts dominate
the fetch stream RIGHT NOW?" — the live form of the batch
cms_heavy_hitters query. A plain counter never forgets, so a host
that flooded the frontier yesterday stays 'hot' forever; per-batch
exponential decay (count *= 9/10 per batch of age) makes dominance
recent-weighted, which is what politeness throttling and abuse
detection actually want.

Design, following the lsh_stream state pattern (foreachBatch + batch=
dirs) because decay needs the BATCH ID, which applyInPandasWithState
does not expose:
- items shard by md5(item) % n_shards; each shard keeps an m-entry
  Space-Saving table — mergeable summaries, so the global top-k at
  read time unions shard tables (classic distributed SS).
- state@b is a pure function of (state@b-1, batch b rows): replaying
  a failed batch overwrites its batch= dir with identical bytes, so
  exactly-once resume falls out of determinism. prune_hh_store keeps
  the two newest dirs (b-1 must survive for b's replay).
- all arithmetic is integer: counts are x1000 scaled, decay of age d
  applies cnt = cnt*9//10 iterated d times (capped — beyond 130
  halvings a 64-bit count is zero anyway), eviction tie-breaks are
  (count asc, item asc). Two runs over the same batches produce
  byte-identical stores regardless of partitioning.

Space-Saving guarantees survive decay: each table entry's count is an
UPPER bound on the item's decayed true count, count - err a LOWER
bound; an item whose true decayed count exceeds the shard's min
counter is always present.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HH_SCHEMA = "shard int, item string, cnt long, err long, last_batch long"
HH_SCALE = 1000
DECAY_NUM, DECAY_DEN = 9, 10
_DECAY_CAP = 700  # 0.9^700 underflows any 64-bit count to 0


def _decay(cnt: int, age: int) -> int:
    for _ in range(min(age, _DECAY_CAP)):
        if cnt == 0:
            return 0
        cnt = cnt * DECAY_NUM // DECAY_DEN
    return cnt


def _hh_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "hh")


def _batch_ids(base: str, before_batch: int | None = None) -> list[int]:
    ids = []
    if os.path.isdir(base):
        for d in os.listdir(base):
            if d.startswith("batch="):
                b = int(d.split("=", 1)[1])
                if before_batch is None or b < before_batch:
                    ids.append(b)
    return ids


def read_hh_store(
    spark: SparkSession, state_dir: str, before_batch: int | None = None
) -> tuple[pd.DataFrame, int]:
    """Latest shard tables (optionally strictly older than
    before_batch, for replay) as a pandas frame + their batch id.
    The store is n_shards*m rows — driver-sized by construction."""
    base = _hh_dir(state_dir)
    ids = _batch_ids(base, before_batch)
    if not ids:
        return pd.DataFrame(
            columns=["shard", "item", "cnt", "err", "last_batch"]
        ), -1
    latest = max(ids)
    pdf = (
        spark.read.schema(HH_SCHEMA)
        .parquet(os.path.join(base, f"batch={latest}"))
        .toPandas()
    )
    return pdf, latest


def _space_saving_merge(
    table: dict, arrivals: list[tuple[str, int]], m: int
) -> dict:
    """table: item -> [cnt, err]; arrivals pre-aggregated, applied in
    deterministic (cnt desc, item asc) order."""
    for item, c in sorted(arrivals, key=lambda t: (-t[1], t[0])):
        if item in table:
            table[item][0] += c
        elif len(table) < m:
            table[item] = [c, 0]
        else:
            evict = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
            ecnt = evict[1][0]
            del table[evict[0]]
            table[item] = [ecnt + c, ecnt]
    return table


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    item_col: str = "host",
    m: int = 8,
    n_shards: int = 4,
) -> None:
    """foreachBatch body: decay the stored tables to batch_id, fold in
    this batch's per-item counts, write the new store under
    batch=<id>. Deterministic end to end, so a replayed batch id
    rewrites identical bytes.

    Scale shape: the SS merge runs ON EXECUTORS — stored shard tables
    (last_batch >= 0) and this batch's per-item arrival counts
    (last_batch = -1 sentinel) union into one relation grouped by
    shard, and applyInPandas folds each shard independently. The
    driver never materializes the batch item histogram (unbounded
    distinct hosts per micro-batch in a real fetch stream); only the
    n_shards * m result rows are written. Per-shard arrival volume is
    what bounds executor memory — that is exactly what n_shards scales
    out. Determinism is preserved: arrivals are applied in
    (cnt desc, item asc) order inside the merge, decay is per-row, and
    each shard's output is item-sorted, so a replayed batch id still
    rewrites identical bytes."""
    arrivals = (
        batch_df.groupBy(F.col(item_col).alias("item"))
        .agg((F.count("*") * HH_SCALE).cast("long").alias("cnt"))
        .select(
            (F.conv(F.substring(F.md5("item"), 1, 6), 16, 10).cast("long")
             % n_shards).cast("int").alias("shard"),
            "item",
            "cnt",
            F.lit(0).cast("long").alias("err"),
            F.lit(-1).cast("long").alias("last_batch"),  # arrival sentinel
        )
    )
    base = _hh_dir(state_dir)
    prev_ids = _batch_ids(base, before_batch=batch_id)
    if prev_ids:
        stored = spark.read.schema(HH_SCHEMA).parquet(
            os.path.join(base, f"batch={max(prev_ids)}")
        )
    else:
        stored = spark.createDataFrame([], HH_SCHEMA)

    def _merge_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        table: dict = {}
        for _, r in pdf[pdf["last_batch"] >= 0].iterrows():
            age = batch_id - int(r["last_batch"])
            c = _decay(int(r["cnt"]), age)
            e = _decay(int(r["err"]), age)
            if c > 0:
                table[str(r["item"])] = [c, e]
        pairs = [
            (str(r["item"]), int(r["cnt"]))
            for _, r in pdf[pdf["last_batch"] < 0].iterrows()
        ]
        table = _space_saving_merge(table, pairs, m)
        rows = sorted(
            (shard, item, c, e, batch_id) for item, (c, e) in table.items()
        )
        return pd.DataFrame(
            rows, columns=["shard", "item", "cnt", "err", "last_batch"]
        )

    out = stored.unionByName(arrivals).groupBy("shard").applyInPandas(
        _merge_shard, HH_SCHEMA
    )
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, f"batch={batch_id}")
    )


def prune_hh_store(state_dir: str) -> None:
    """Keep the two newest batch= dirs (the previous one must survive
    so a replay of the newest can rebuild from it)."""
    import shutil

    base = _hh_dir(state_dir)
    if not os.path.isdir(base):
        return
    ids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("batch=")
    )
    for b in ids[:-2]:
        shutil.rmtree(os.path.join(base, f"batch={b}"))


def top_hitters(spark: SparkSession, state_dir: str, k: int = 5) -> pd.DataFrame:
    """Global decayed top-k across shards, as of the newest stored
    batch: (item, cnt, err, lower) sorted (cnt desc, item asc).
    cnt is the Space-Saving upper bound, cnt-err the lower bound."""
    stored, latest = read_hh_store(spark, state_dir)
    if latest < 0:
        return pd.DataFrame(columns=["item", "cnt", "err", "lower"])
    rows = []
    for _, r in stored.iterrows():
        rows.append((r["item"], int(r["cnt"]), int(r["err"])))
    agg: dict = {}
    for item, c, e in rows:  # same item can live in one shard only
        agg[item] = (c, e)
    out = sorted(
        ((i, c, e, c - e) for i, (c, e) in agg.items()),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    return pd.DataFrame(out, columns=["item", "cnt", "err", "lower"])
