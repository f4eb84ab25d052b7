"""Bucketed table layout: pre-shuffle a fact table ONCE at write time
so every later equi-join / aggregation on the bucket key is
exchange-free. This is the 100 TB answer to "the CDX×digest and
score×cdx joins shuffle the big side every run": the crawl's
persistent tables (captures by sha1, scores by slug, frontier by url
hash) are written bucketed on their join key, and all downstream
plans co-locate for free — the same reason the reference pre-sorts
its Pig/Scalding outputs by join key (SURVEY.md §2.5 W3), expressed
as a Spark-native physical layout instead of a job-ordering
convention.

Mechanics: `bucketBy(n, key).sortBy(key)` + saveAsTable with an
explicit path (external table — the data lives where the caller says,
the catalog entry is just metadata). Spark's scan then reports the
hash-partitioning to Catalyst, which elides both Exchanges in a
same-key same-bucket-count join (verified by the pytest plan assert:
no `Exchange` node, sort-merge join directly over the scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write df as an external bucketed table `name` at `path`,
    bucketed (and optionally sorted) by bucket_col. Overwrites any
    existing catalog entry of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key bucketed tables — with matching bucket counts
    this plans as an exchange-free sort-merge join."""
    return spark.table(left_name).join(spark.table(right_name), on=on, how=how)


def executed_plan_string(df: DataFrame) -> str:
    """The EXECUTED physical plan (collect first): under AQE the
    pre-execution explain hides final stages, so plan asserts must run
    the df's own QueryExecution after an action."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()
