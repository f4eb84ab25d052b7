"""Content-addressed blob sinks + revisit resolution.

Role parity:
  - S11 S3/minio blob sink  (/root/reference/python/sandcrawler/minio.py:31-78):
    content-addressed layout `folder/ab/cd/<sha1hex>.<ext>`
  - S12 disk blob sink      (persist.py:338-368): same sha1-sharded layout
  - J9 revisit resolution   (ia.py:411-437,638-655): a `warc/revisit`
    capture's body lives at the original (url, datetime) — resolved as
    a self-join against the capture index.

Spark-first shape: the sink is a partitioned parquet write where the
2-hex-char shard prefixes are partition columns — object stores and
HDFS both get bounded directory fanout (256×256) and pruned
content-hash lookups for free; blobs stay in a `blob` binary column
rather than one object per file (small-file problem at 10^10 scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blob_sink_layout(df: DataFrame, sha1_col: str = "sha1hex", blob_col: str = "blob") -> DataFrame:
    """Append the content-addressed shard columns (minio.py:55-66
    layout: prefix_a = hex[0:2], prefix_b = hex[2:4])."""
    return df.withColumn("prefix_a", F.substring(F.col(sha1_col), 1, 2)).withColumn(
        "prefix_b", F.substring(F.col(sha1_col), 3, 2)
    )


def write_blob_store(df: DataFrame, path: str, sha1_col: str = "sha1hex", blob_col: str = "blob") -> None:
    """Write a content-addressed blob store: parquet partitioned by the
    two shard prefixes; dedupe by content hash first (idempotent puts,
    like keyed HBase/minio writes)."""
    w = Window.partitionBy(sha1_col).orderBy(F.lit(1))
    out = (
        blob_sink_layout(df, sha1_col, blob_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out.write.mode("overwrite").partitionBy("prefix_a", "prefix_b").parquet(path)


def read_blob(spark, path: str, sha1hex: str) -> DataFrame:
    """Point lookup by content hash — partition pruning on the shard
    prefixes means only one 1/65536 slice is scanned."""
    return (
        spark.read.parquet(path)
        .filter(
            (F.col("prefix_a") == sha1hex[0:2])
            & (F.col("prefix_b") == sha1hex[2:4])
            & (F.col("sha1hex") == sha1hex)
        )
    )


def resolve_revisits(cdx: DataFrame) -> DataFrame:
    """J9: for `warc/revisit` captures, attach the original capture's
    WARC location via a self-join on sha1hex, picking the earliest
    non-revisit capture of the same content (the record the revisit
    points back to). Non-revisit rows pass through unchanged."""
    # null-safe revisit test: with a raw `mimetype != 'warc/revisit'`
    # predicate a NULL mimetype row would fail BOTH branches (NULL is
    # not true) and vanish from the output entirely
    is_revisit = F.coalesce(F.col("mimetype") == "warc/revisit", F.lit(False))
    originals = (
        cdx.filter(~is_revisit)
        .select(
            F.col("sha1hex"),
            F.col("datetime").alias("orig_datetime"),
            F.col("warc_path").alias("orig_warc_path"),
            F.col("warc_offset").alias("orig_warc_offset"),
            F.col("warc_csize").alias("orig_warc_csize"),
        )
    )
    w = Window.partitionBy("sha1hex").orderBy("orig_datetime", "orig_warc_path")
    best_orig = (
        originals.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    revisits = cdx.filter(is_revisit)
    resolved = revisits.join(best_orig, on="sha1hex", how="left")
    passthrough = (
        cdx.filter(~is_revisit)
        .withColumn("orig_datetime", F.col("datetime"))
        .withColumn("orig_warc_path", F.col("warc_path"))
        .withColumn("orig_warc_offset", F.col("warc_offset"))
        .withColumn("orig_warc_csize", F.col("warc_csize"))
    )
    return passthrough.unionByName(resolved)
