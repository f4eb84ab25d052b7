"""Slowly-changing-dimension (SCD type 2) interval build.

The crawl state the reference keeps in HBase/Postgres is
latest-value-wins (sandcrawler-db ingest tables record the current
best status per URL; /root/reference/python/sandcrawler/db.py upsert
semantics). A warehouse-grade recrawl planner needs HISTORY — "what
was this host's state between March and May" — i.e. the classic SCD2
shape: one row per (entity, value-run) with [valid_from, valid_to)
and is_current. Iceberg/Delta users build this from change streams;
here it is a first-class batch operator:

    1. order each entity's observations by (ts, tiebreak),
    2. keep only CHANGE rows (value != lag(value)) — consecutive
       duplicate observations collapse into one interval,
    3. valid_to = lead(valid_from); NULL = current; version =
       row_number per entity.

Scale shape: two window functions over the SAME (entity) partitioning
and (ts, tiebreak) ordering — Catalyst plans ONE shuffle + ONE sort
and runs both windows in a single exchange-reuse stage. Entity
histories are bounded (a URL is observed thousands of times, not
billions), so per-entity windows are safe here, unlike per-term
postings. Deterministic under any input partitioning because the
tiebreak column makes the sort total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    observations: DataFrame,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(entity, value, valid_from, valid_to, version, is_current) from
    an observation log. When tiebreak_col is given, same-(entity, ts)
    observations collapse to the greatest-tiebreak row first
    (latest-per-tick wins) — required for determinism when an entity
    can be observed twice in one tick.
    """
    obs = observations
    if tiebreak_col is not None:
        # latest-per-tick wins: collapse same-(entity, ts) observations
        # to the one with the greatest tiebreak, so valid_from is
        # unique per entity and every downstream sort is total
        wt = Window.partitionBy(entity_col, ts_col).orderBy(F.col(tiebreak_col).desc())
        obs = (
            obs.withColumn("_rn", F.row_number().over(wt))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    changed = (
        obs.withColumn("_prev", F.lag(value_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(value_col) != F.col("_prev")))
        .select(entity_col, F.col(ts_col).alias("valid_from"), value_col)
    )
    w2 = Window.partitionBy(entity_col).orderBy("valid_from")
    return changed.select(
        entity_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        (F.row_number().over(w2)).cast("int").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())
