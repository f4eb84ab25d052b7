"""Zipfile blob source (S3).

Role parity: ZipfilePusher (/root/reference/python/sandcrawler/
workers.py:435-472) — stream .pdf members out of zip archives into the
extraction workers, suffix-filtered, without extracting to disk.

Spark shape: `binaryFile` scan of the archives (one row per zip, whole
file as a binary column — Spark's native format for opaque blobs), then
a mapInPandas stage opens each archive from the in-memory bytes and
emits one row per matching member. Parallelism is per-archive; for the
few-giant-zips case, repartition the paths first so each task owns one
archive. Member reads are capped so a zip-bomb member cannot OOM a
task (the reference caps at 2**32; we default lower and surface a
`truncated` flag instead of silently huge rows).
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("zip_path", T.StringType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("truncated", T.BooleanType(), False),
    ]
)


def scan_zip_members(
    spark: SparkSession,
    path_glob: str,
    suffix: str = ".pdf",
    max_member_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """One row per suffix-matching member across all zips under
    path_glob."""
    archives = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def _members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for zpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    archive = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                except zipfile.BadZipFile:
                    continue
                with archive:
                    for info in archive.infolist():
                        if not info.filename.endswith(suffix):
                            continue
                        with archive.open(info, "r") as flo:
                            data = flo.read(max_member_bytes)
                            truncated = bool(flo.read(1))
                        rows.append(
                            {
                                "zip_path": zpath,
                                "member_name": info.filename,
                                "size_bytes": info.file_size,
                                "content": data,
                                "truncated": truncated,
                            }
                        )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in ZIP_MEMBER_SCHEMA.fields])

    return archives.mapInPandas(_members, schema=ZIP_MEMBER_SCHEMA)
