"""Structured Streaming ingest: the literal analog of the reference's
Kafka consume->extract->produce loop (S4/S5, workers.py:474-568 +
241-303), for deployments that want a continuous pipeline instead of
snapshot-committed batch rounds (streaming/rounds.py — the default,
see SURVEY.md §1.3).

Shape: file-source readStream over a pages directory (swap for
`readStream.format("kafka")` on a real deployment — the transform
graph is source-agnostic) -> vectorized file_meta + text extraction ->
parquet sink with checkpointed exactly-once progress. The checkpoint
directory IS the offset store (workers.py:558-561); killing and
restarting the query resumes without reprocessing — tested with
Trigger.AvailableNow batches.

No event-time windows/watermarks on purpose: the reference has no
event-time semantics to reproduce (SURVEY.md §2.8), only at-least-once
progress + idempotent keyed writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.functions.extract_text import extract_text_udf
from sandcrawler_spark.functions.hashes import with_file_meta

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def build_stream(spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a parquet pages directory -> extraction plan."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)
    ex = with_file_meta(pages, "html").withColumn("_ex", extract_text_udf(F.col("html")))
    return ex.select(
        "url",
        "warc_ts",
        "sha1hex",
        "sha256hex",
        "md5hex",
        "size_bytes",
        "mimetype",
        F.col("_ex.text").alias("extracted_text"),
        F.col("_ex.word_count").alias("word_count"),
        F.col("_ex.extractor").alias("extractor"),
    )


def run_available_now(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Process everything currently in pages_dir exactly once
    (Trigger.AvailableNow), committing progress to the checkpoint;
    re-running after new files land processes only the delta."""
    q = (
        build_stream(spark, pages_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
