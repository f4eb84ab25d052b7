"""Incremental near-duplicate detection at ingest time: as newly
crawled documents stream in, flag those that near-duplicate anything
ALREADY ACCEPTED into the corpus — so the 100 TB store stays deduped
continuously instead of via periodic full-corpus LSH sweeps.

Design (foreachBatch around the shared batch blocks):
- a persistent BAND STORE on disk: (id, band, bkey) parquet rows for
  every accepted document — the same banded-MinHash blocking relation
  `operators.dedupe.band_keys` produces (and the batch lsh_candidates
  self-joins). Appending per micro-batch keeps it incremental (at
  production scale the store would be a bucketed/partitioned table on
  (band, bkey) — plans/bucketed.py — so the candidate join co-locates
  without shuffling the store).
- per micro-batch: compute the batch's band keys (narrow), equi-join
  them against the store on (band, bkey) → "new vs old" candidates,
  plus the in-batch self-join for dups arriving together; emit
  decisions (id, is_dup_candidate, n_matches, first_match) to the
  result sink; append the band keys of ACCEPTED (non-candidate) docs
  to the store — candidates are quarantined, not admitted, so a
  burst of copies of one page yields exactly one accepted instance.
- exactly-once/resume: rides Structured Streaming's foreachBatch
  checkpointing; the store append is idempotent per batch because it
  is written under batch-id subdirectories (re-processing a batch
  overwrites its own subdir, never duplicates it).

At 10^10 docs the store is bands × 10^10 small rows — the equi-join
against each (tiny) micro-batch broadcasts the BATCH side, so the
store is only ever scanned partition-pruned by band, never shuffled.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandcrawler_spark.operators.dedupe import band_keys

# Doc ids in the store are LONGs. band_keys accepts any id column, but
# the persistent store needs one fixed schema across batches and
# compaction generations; process_batch validates (not silently casts
# — casting a string id yields NULLs and corrupts the store).
BAND_SCHEMA = "id long, band int, bkey string"
# Compacted generations additionally carry the originating batch id so
# a replayed batch stays excludable AFTER its rows were folded in
# (compaction may run while the newest batch is not yet checkpointed).
COMPACTED_SCHEMA = BAND_SCHEMA + ", batch_id long"


def _store_path(state_dir: str) -> str:
    return os.path.join(state_dir, "band_store")


def read_band_store(
    spark: SparkSession, state_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """All accepted band keys, optionally excluding one batch's own
    output — a replayed batch must not see its previous attempt's
    rows, or its docs would match themselves and the replay would
    quarantine (and drop) them. Exclusion covers both the batch's own
    subdirectory AND any compacted rows tagged with its batch_id."""
    p = _store_path(state_dir)
    try:
        names = os.listdir(p)
    except FileNotFoundError:
        names = []
    batch_dirs = sorted(
        os.path.join(p, d)
        for d in names
        if d.startswith("batch=") and d != f"batch={exclude_batch}"
    )
    comp_dirs = sorted(os.path.join(p, d) for d in names if d.startswith("compacted-"))
    parts = []
    if batch_dirs:
        parts.append(spark.read.schema(BAND_SCHEMA).parquet(*batch_dirs))
    if comp_dirs:
        comp = spark.read.schema(COMPACTED_SCHEMA).parquet(*comp_dirs)
        if exclude_batch is not None:
            comp = comp.filter(F.col("batch_id") != F.lit(exclude_batch))
        parts.append(comp.drop("batch_id"))
    if not parts:
        return spark.createDataFrame([], BAND_SCHEMA)
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """One micro-batch of the incremental detector (callable directly
    for batch-mode dev parity). Returns the decision DataFrame AFTER
    persisting it — (doc_id, is_dup_candidate, n_matches,
    first_match) — and appends accepted docs' band keys to the
    store under the batch's own subdirectory (idempotent on replay)."""
    spark = batch_df.sparkSession
    id_type = dict(batch_df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"neardup stream requires an integral {id_col!r} column "
            f"(got {id_type}): the persistent band store is schema'd "
            f"`{BAND_SCHEMA}` — map string doc ids to longs upstream "
            "(e.g. xxhash64/monotonic id) before wiring the stream"
        )
    kb = band_keys(batch_df, id_col, text_col, n_shingle, k, bands)
    if id_type != "bigint":
        kb = kb.withColumn("id", F.col("id").cast("long"))
    kb = kb.localCheckpoint(eager=True)
    store = read_band_store(spark, state_dir, exclude_batch=batch_id)
    # candidates vs the historical store: batch side broadcast — the
    # store side stays where it is (partition-pruned scan, no shuffle)
    vs_old = (
        F.broadcast(kb).alias("n")
        .join(store.alias("o"), on=["band", "bkey"], how="inner")
        .select(F.col("n.id").alias("id"), F.col("o.id").alias("match_id"))
    )
    # in-batch dups: same band key arriving twice in one batch — keep
    # the smaller id as the accepted instance
    a, b = kb.alias("a"), kb.alias("b")
    in_batch = (
        a.join(b, on=["band", "bkey"], how="inner")
        .filter(F.col("a.id") > F.col("b.id"))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("match_id"))
    )
    matches = vs_old.unionByName(in_batch).distinct()
    decisions = (
        kb.select("id").distinct()
        .join(
            matches.groupBy("id").agg(
                F.count("*").cast("long").alias("n_matches"),
                F.min("match_id").alias("first_match"),
            ),
            on="id",
            how="left",
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_matches").isNotNull().alias("is_dup_candidate"),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "first_match",
        )
        .localCheckpoint(eager=True)
    )
    accepted = decisions.filter(~F.col("is_dup_candidate")).select(
        F.col(id_col).alias("id")
    )
    out = os.path.join(_store_path(state_dir), f"batch={batch_id}")
    kb.join(accepted, on="id", how="left_semi").write.mode("overwrite").parquet(out)
    return decisions


def neardup_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    result_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kw,
):
    """Wire the detector into a streaming query: decisions append to
    result_dir parquet; the band store accumulates accepted docs.
    Returns the StreamingQuery (caller picks the trigger)."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        decisions = process_batch(
            batch_df, batch_id, state_dir, id_col, text_col, **lsh_kw
        )
        # batch-id subdir + overwrite = idempotent on replay (a plain
        # append would duplicate a replayed batch's decisions)
        decisions.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(result_dir, f"batch={batch_id}"))

    return (
        stream_df.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def compact_band_store(
    spark: SparkSession, state_dir: str, keep_if_under: int = 16
) -> int:
    """Fold the per-batch subdirectories into one consolidated dir
    when their count exceeds keep_if_under (the same bounded-file-list
    discipline as SnapshotTable's bucket compaction: an append-only
    store otherwise degrades reads monotonically). Consolidation is
    crash-safe: the merged dir is written under a fresh name first,
    old dirs are removed only after the write commits, and every
    compacted row carries its originating batch_id so a replayed
    batch stays excludable even after its dir was folded — the newest
    batch may belong to a micro-batch the stream has not yet
    checkpointed, and read_band_store(exclude_batch=...) filters its
    compacted rows exactly as it skips a live batch= dir. Returns the
    number of dirs folded (0 = nothing to do)."""
    import shutil

    p = _store_path(state_dir)
    try:
        dirs = sorted(d for d in os.listdir(p) if d.startswith("batch="))
    except FileNotFoundError:
        return 0
    if len(dirs) <= keep_if_under:
        return 0
    olds = [d for d in os.listdir(p) if d.startswith("compacted-")]
    gen = max((int(d.split("-")[1]) for d in olds), default=-1) + 1
    target = os.path.join(p, f"compacted-{gen}")
    merged = None
    for d in dirs:
        tagged = (
            spark.read.schema(BAND_SCHEMA)
            .parquet(os.path.join(p, d))
            .withColumn("batch_id", F.lit(int(d.split("=")[1])).cast("long"))
        )
        merged = tagged if merged is None else merged.unionByName(tagged)
    for d in olds:
        old = spark.read.schema(COMPACTED_SCHEMA).parquet(os.path.join(p, d))
        merged = old if merged is None else merged.unionByName(old)
    merged.coalesce(4).write.mode("overwrite").parquet(target)
    for d in dirs + olds:
        shutil.rmtree(os.path.join(p, d))
    return len(dirs)
