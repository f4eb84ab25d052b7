"""Priority frontier as sorted, round-partitioned storage.

North-star shape: "a priority frontier queue (ingest-request priority,
link-depth, recrawl staleness) maintained as sorted Iceberg
partitions". The politeness schedule already assigns every URL a
(crawl_round, seq_in_round); this store lays that schedule out so the
fetch loop consumes it efficiently:

  - PARTITIONED BY crawl_round: popping round r is a partition-pruned
    scan (only round r's files are read — verified by plan audit, the
    scan shows a crawl_round PartitionFilter);
  - rows co-located and PRE-SORTED by (host, seq_in_round) within each
    round partition, so per-host fetch slots stream out in politeness
    order with at most a cheap nearly-sorted pass on read;
  - on Iceberg this maps to `PARTITIONED BY crawl_round` +
    `WRITE ORDERED BY host, seq_in_round` table properties, 1:1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_frontier_rounds(
    sched: DataFrame,
    path: str,
    round_col: str = "crawl_round",
    sort_cols: tuple[str, ...] = ("host", "seq_in_round"),
) -> None:
    """Persist a politeness schedule partitioned by round, sorted
    within partitions. One shuffle (co-locate rounds), one write."""
    (
        sched.repartition(F.col(round_col))
        .sortWithinPartitions(round_col, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(round_col)
        .parquet(path)
    )


def read_round(spark: SparkSession, path: str, crawl_round: int,
               round_col: str = "crawl_round") -> DataFrame:
    """Pop one round: the filter lands as a partition filter, so only
    that round's directory is scanned."""
    return spark.read.parquet(path).filter(F.col(round_col) == crawl_round)


def rounds_available(path: str, round_col: str = "crawl_round") -> list[int]:
    """Cheap driver-side listing of the rounds present (no Spark job)."""
    prefix = f"{round_col}="
    out = []
    for name in os.listdir(path):
        if name.startswith(prefix):
            try:
                out.append(int(name[len(prefix):]))
            except ValueError:
                pass
    return sorted(out)
