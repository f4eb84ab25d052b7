"""Snapshot-versioned keyed tables: MERGE, time travel, lineage, metrics.

Role parity:
  - Postgres batched upserts with ON CONFLICT + insert-vs-update
    counts (/root/reference/python/sandcrawler/db.py:100-409)
  - HBase idempotent keyed puts (python_hadoop/extraction_cdx_grobid.py:
    264-285)
  - Kafka manual offset store = resumability (workers.py:558-561)

Design: a table is a set of immutable parquet snapshots plus an
atomically-replaced manifest (_meta.json). Rows are HASH-BUCKETED by
key (pmod(xxhash64(keys), n_buckets)); a snapshot's manifest maps each
bucket to the parquet directories holding its rows — directories are
shared structurally with ancestor snapshots, exactly Iceberg's
manifest-reuse model. MERGE semantics:

  merge(batch) ->
    1. in-batch dedupe by key (row_number()==1, db.py:124-128 analog)
    2. REWRITE ONLY THE BUCKETS THE BATCH TOUCHES: read those buckets,
       anti-join out matched keys, union the upserted batch, write the
       result as the new snapshot's bucket dirs. Untouched buckets are
       INHERITED by reference from the parent snapshot — a round that
       touches 1% of keys rewrites ~1% of the table, not all of it.
    3. manifest update records (snapshot_id, parent_id, inserted,
       updated, operation, lineage) — the insert-vs-update counts the
       reference derives from xmax (db.py:157-161)

  append(batch) -> O(batch): the batch's files are ADDED to the bucket
  map next to the inherited ones; nothing is rewritten.

On a real cluster this layer is `MERGE INTO iceberg_table ON key` with
partition-level rewrite + snapshot summary metrics, 1:1; the local
implementation exists because the Iceberg runtime jar is not in this
sandbox. The API is format-agnostic so swapping backends touches only
this module.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        n_buckets: int = 64,
        compact_threshold: int = 8,
    ):
        """compact_threshold: max parquet dirs per bucket an append may
        leave behind. A long append chain otherwise grows every bucket's
        dir list monotonically and reads degrade (Iceberg's small-file
        problem); appends self-compact any bucket past the threshold by
        rewriting just that bucket — O(bucket), not O(table)."""
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.default_n_buckets = n_buckets
        self.compact_threshold = compact_threshold
        os.makedirs(path, exist_ok=True)

    # ---- manifest -----------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"current": None, "snapshots": [], "n_buckets": self.default_n_buckets}
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

    def _read_dirs(self, rels: list[str], schema_json: str) -> DataFrame:
        if not rels:
            return self.spark.createDataFrame([], T.StructType.fromJson(json.loads(schema_json)))
        paths = [os.path.join(self.path, r) for r in rels]
        # mergeSchema: inherited bucket dirs may predate added columns
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def _snap_df(self, snap: dict) -> DataFrame:
        rels = [r for dirs in snap["buckets"].values() for r in dirs]
        return self._read_dirs(sorted(set(rels)), snap["schema"])

    def read(self) -> DataFrame | None:
        snap = self.current_snapshot()
        if snap is None:
            return None
        return self._snap_df(snap)

    def read_snapshot(self, snapshot_id: str) -> DataFrame:
        snap = next(s for s in self.snapshots() if s["id"] == snapshot_id)
        return self._snap_df(snap)

    # ---- writes --------------------------------------------------------
    def _bucket_expr(self, n_buckets: int):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.key_cols]), F.lit(n_buckets)).cast("int")

    def _write_bucketed(
        self, df: DataFrame, rel: str, n_buckets: int
    ) -> tuple[dict[str, list[str]], dict[str, int]]:
        """Write df under rel/ partitioned by key bucket; returns the
        {bucket: [reldir]} map of what was written plus per-bucket row
        counts (the partition-level lineage recorded in the manifest:
        every snapshot knows how many rows each bucket holds and which
        commit wrote them)."""
        out_dir = os.path.join(self.path, rel)
        bucketed = df.withColumn("_bucket", self._bucket_expr(n_buckets))
        bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        rows = {
            str(r._bucket): r.n
            for r in bucketed.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
        }
        buckets: dict[str, list[str]] = {}
        for name in os.listdir(out_dir):
            if name.startswith("_bucket="):
                buckets[name.split("=", 1)[1]] = [f"{rel}/{name}"]
        return buckets, rows

    def _commit(
        self,
        operation: str,
        counts: dict,
        lineage: dict | None,
        buckets: dict[str, list[str]],
        schema_json: str,
        bucket_rows: dict[str, int] | None = None,
    ) -> dict:
        meta = self._read_meta()
        snap_id = uuid.uuid4().hex[:16]
        snap = {
            "id": snap_id,
            "parent": meta["current"],
            "operation": operation,
            "committed_at": time.time(),
            "counts": counts,
            "lineage": lineage or {},
            "buckets": buckets,
            "bucket_rows": bucket_rows or {},
            "schema": schema_json,
        }
        meta["snapshots"].append(snap)
        meta["current"] = snap_id
        self._write_meta(meta)
        return snap

    def _dedupe_batch(self, batch: DataFrame, order_by: list | None) -> DataFrame:
        order = order_by or [F.lit(1)]
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        return batch.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    def _full_write(self, df: DataFrame, operation: str, counts: dict, lineage: dict | None) -> dict:
        nb = self._read_meta().get("n_buckets", self.default_n_buckets)
        snap_id_rel = f"snap-{uuid.uuid4().hex[:16]}"
        buckets, rows = self._write_bucketed(df, snap_id_rel, nb)
        return self._commit(operation, counts, lineage, buckets, df.schema.json(), rows)

    def overwrite(self, df: DataFrame, lineage: dict | None = None) -> dict:
        n = df.count()
        return self._full_write(df, "overwrite", {"inserted": n, "updated": 0, "total": n}, lineage)

    def append(self, df: DataFrame, lineage: dict | None = None) -> dict:
        """O(batch): the new files JOIN the bucket map; nothing is
        rewritten, inherited dirs are shared with the parent."""
        cur = self.current_snapshot()
        if cur is None:
            return self._full_write(df, "append", {"inserted": df.count(), "updated": 0,
                                                   "total": df.count()}, lineage)
        nb = self._read_meta().get("n_buckets", self.default_n_buckets)
        n_new = df.count()
        rel = f"snap-{uuid.uuid4().hex[:16]}"
        written, written_rows = self._write_bucketed(df, rel, nb)
        buckets = {b: list(dirs) for b, dirs in cur["buckets"].items()}
        for b, dirs in written.items():
            buckets.setdefault(b, []).extend(dirs)
        bucket_rows = dict(cur.get("bucket_rows", {}))
        for b, n in written_rows.items():
            bucket_rows[b] = bucket_rows.get(b, 0) + n
        buckets = self._compact_buckets(buckets, cur["schema"], nb)
        total = cur["counts"]["total"] + n_new
        return self._commit("append", {"inserted": n_new, "updated": 0, "total": total},
                            lineage, buckets, df.schema.json(), bucket_rows)

    def _compact_buckets(
        self, buckets: dict[str, list[str]], schema_json: str, nb: int
    ) -> dict[str, list[str]]:
        """Rewrite every bucket whose dir list exceeds compact_threshold
        into a single dir. Only the fat buckets are read and rewritten
        (the dirs are `_bucket=N` leaves, so each read touches exactly
        one bucket's rows); old dirs stay on disk for ancestor-snapshot
        time travel — this is Iceberg `rewrite_data_files` scoped to a
        partition."""
        fat = [b for b, dirs in buckets.items() if len(dirs) > self.compact_threshold]
        if not fat:
            return buckets
        rels = sorted({r for b in fat for r in buckets[b]})
        df = self._read_dirs(rels, schema_json)
        rel = f"snap-{uuid.uuid4().hex[:16]}-compact"
        # Re-bucketing reproduces the same bucket ids (same keys, same
        # hash, same nb), so `written` covers exactly the fat buckets.
        written, _ = self._write_bucketed(df, rel, nb)
        out = dict(buckets)
        for b in fat:
            out[b] = written.get(b, [])
        return out

    def compact(self, lineage: dict | None = None) -> dict:
        """Explicit maintenance commit: compact ALL multi-dir buckets to
        one dir each (threshold 1 for this pass), preserving rows."""
        cur = self.current_snapshot()
        if cur is None:
            raise ValueError("cannot compact an empty table")
        nb = self._read_meta().get("n_buckets", self.default_n_buckets)
        old_threshold, self.compact_threshold = self.compact_threshold, 1
        try:
            buckets = self._compact_buckets(dict(cur["buckets"]), cur["schema"], nb)
        finally:
            self.compact_threshold = old_threshold
        return self._commit(
            "compact", dict(cur["counts"]), lineage, buckets,
            cur["schema"], dict(cur.get("bucket_rows", {})),
        )

    def merge(
        self,
        batch: DataFrame,
        dedupe_order: list | None = None,
        on_conflict: str = "update",
        lineage: dict | None = None,
    ) -> dict:
        """Keyed upsert, partition-level: only buckets containing batch
        keys are rewritten. on_conflict: 'update' (last write wins) or
        'nothing' (keep existing row), mirroring the two ON CONFLICT
        modes in db.py."""
        batch = self._dedupe_batch(batch, dedupe_order)
        cur = self.current_snapshot()
        if cur is None:
            n = batch.count()
            return self._full_write(batch, "merge", {"inserted": n, "updated": 0, "total": n}, lineage)

        nb = self._read_meta().get("n_buckets", self.default_n_buckets)
        batch = batch.persist()
        touched = sorted(
            r._b for r in batch.select(self._bucket_expr(nb).alias("_b")).distinct().collect()
        )
        touched_rels = [r for b in touched for r in cur["buckets"].get(str(b), [])]
        cur_touched = self._read_dirs(touched_rels, cur["schema"])
        n_cur_touched = cur_touched.count()

        keys = batch.select(*self.key_cols)
        untouched_rows = cur_touched.join(keys, on=self.key_cols, how="left_anti")
        if on_conflict == "update":
            updated = cur_touched.join(keys, on=self.key_cols, how="left_semi").count()
            out = untouched_rows.unionByName(batch, allowMissingColumns=True)
            inserted = batch.count() - updated
        else:  # 'nothing': only genuinely new keys enter
            new_rows = batch.join(cur_touched.select(*self.key_cols), on=self.key_cols, how="left_anti")
            inserted = new_rows.count()
            updated = 0
            out = cur_touched.unionByName(new_rows, allowMissingColumns=True)
        n_out = out.count()

        rel = f"snap-{uuid.uuid4().hex[:16]}"
        written, written_rows = self._write_bucketed(out, rel, nb)
        # inherited buckets by reference; touched buckets replaced wholesale
        touched_set = set(touched)
        buckets = {b: list(dirs) for b, dirs in cur["buckets"].items() if int(b) not in touched_set}
        buckets.update(written)
        bucket_rows = {
            b: n for b, n in cur.get("bucket_rows", {}).items() if int(b) not in touched_set
        }
        bucket_rows.update(written_rows)
        total = cur["counts"]["total"] - n_cur_touched + n_out
        snap = self._commit(
            "merge", {"inserted": inserted, "updated": updated, "total": total},
            lineage, buckets, out.schema.json(), bucket_rows,
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
