"""Snapshot-versioned keyed tables: MERGE, time travel, lineage, metrics.

Role parity:
  - Postgres batched upserts with ON CONFLICT + insert-vs-update
    counts (/root/reference/python/sandcrawler/db.py:100-409)
  - HBase idempotent keyed puts (python_hadoop/extraction_cdx_grobid.py:
    264-285)
  - Kafka manual offset store = resumability (workers.py:558-561)

Design: each table is a directory of immutable parquet snapshots plus
an atomically-replaced manifest (_meta.json). MERGE semantics:

  merge(batch) ->
    1. in-batch dedupe by key (row_number()==1, db.py:124-128 analog)
    2. split current into matched / unmatched by key (the anti-join)
    3. new snapshot = unmatched ∪ upserted batch
    4. manifest update records (snapshot_id, parent_id, inserted,
       updated, operation, lineage) — the insert-vs-update counts the
       reference derives from xmax (db.py:157-161)

On a real cluster this layer is `MERGE INTO iceberg_table ON key` +
snapshot summary metrics, 1:1; the local implementation exists because
the Iceberg runtime jar is not part of this sandbox. The API is
format-agnostic so swapping the backend touches only this module.

Rewrite cost note (scale): local MERGE rewrites the table; Iceberg
does merge-on-read / partition-level rewrite. That is a backend
property, not a plan property — callers only express keyed upserts.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        os.makedirs(path, exist_ok=True)

    # ---- manifest -----------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"current": None, "snapshots": []}
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)  # atomic snapshot commit

    # ---- reads ---------------------------------------------------------
    def current_snapshot(self) -> dict | None:
        meta = self._read_meta()
        if meta["current"] is None:
            return None
        return next(s for s in meta["snapshots"] if s["id"] == meta["current"])

    def snapshots(self) -> list[dict]:
        return self._read_meta()["snapshots"]

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def read(self) -> DataFrame | None:
        snap = self.current_snapshot()
        if snap is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, snap["dir"]))

    def read_snapshot(self, snapshot_id: str) -> DataFrame:
        snap = next(s for s in self.snapshots() if s["id"] == snapshot_id)
        return self.spark.read.parquet(os.path.join(self.path, snap["dir"]))

    # ---- writes --------------------------------------------------------
    def _commit(self, df: DataFrame, operation: str, counts: dict, lineage: dict | None) -> dict:
        snap_id = uuid.uuid4().hex[:16]
        rel = f"snap-{snap_id}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        meta = self._read_meta()
        snap = {
            "id": snap_id,
            "dir": rel,
            "parent": meta["current"],
            "operation": operation,
            "committed_at": time.time(),
            "counts": counts,
            "lineage": lineage or {},
        }
        meta["snapshots"].append(snap)
        meta["current"] = snap_id
        self._write_meta(meta)
        return snap

    def _dedupe_batch(self, batch: DataFrame, order_by: list | None) -> DataFrame:
        order = order_by or [F.lit(1)]
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        return batch.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    def overwrite(self, df: DataFrame, lineage: dict | None = None) -> dict:
        n = df.count()
        return self._commit(df, "overwrite", {"inserted": n, "updated": 0, "total": n}, lineage)

    def append(self, df: DataFrame, lineage: dict | None = None) -> dict:
        cur = self.read()
        out = df if cur is None else cur.unionByName(df, allowMissingColumns=True)
        n_new = df.count()
        total = out.count()
        return self._commit(out, "append", {"inserted": n_new, "updated": 0, "total": total}, lineage)

    def merge(
        self,
        batch: DataFrame,
        dedupe_order: list | None = None,
        on_conflict: str = "update",
        lineage: dict | None = None,
    ) -> dict:
        """Keyed upsert. on_conflict: 'update' (last write wins) or
        'nothing' (keep existing row), mirroring the two ON CONFLICT
        modes in db.py."""
        batch = self._dedupe_batch(batch, dedupe_order)
        cur = self.read()
        if cur is None:
            n = batch.count()
            return self._commit(batch, "merge", {"inserted": n, "updated": 0, "total": n}, lineage)
        batch = batch.persist()
        keys = batch.select(*self.key_cols)
        untouched = cur.join(keys, on=self.key_cols, how="left_anti")
        if on_conflict == "update":
            updated = cur.join(keys, on=self.key_cols, how="left_semi").count()
            out = untouched.unionByName(batch, allowMissingColumns=True)
            inserted = batch.count() - updated
        else:  # 'nothing': only genuinely new keys enter
            new_rows = batch.join(cur.select(*self.key_cols), on=self.key_cols, how="left_anti")
            inserted = new_rows.count()
            updated = 0
            out = cur.unionByName(new_rows, allowMissingColumns=True)
        total = out.count()
        snap = self._commit(
            out,
            "merge",
            {"inserted": inserted, "updated": updated, "total": total},
            lineage,
        )
        batch.unpersist()
        return snap


class CrawlMetrics:
    """Spark-accumulator stage counters (reference: worker Counter
    dicts workers.py:24-46 and Kafka-stage counters), flushable to a
    JSON file / table so rounds can be compared across resumes."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._acc: dict[str, object] = {}

    def inc(self, name: str, value: int = 1) -> None:
        self.counter(name).add(value)

    def counter(self, name: str):
        if name not in self._acc:
            self._acc[name] = self.spark.sparkContext.accumulator(0)
        return self._acc[name]

    def count_df(self, name: str, df: DataFrame) -> DataFrame:
        """Attach a pass-through counting observation to a plan."""
        n = df.count()
        self.inc(name, n)
        return df

    def as_dict(self) -> dict[str, int]:
        return {k: v.value for k, v in sorted(self._acc.items())}

    def flush(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=1)
