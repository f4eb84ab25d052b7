"""Best-capture ranking + closest-timestamp (as-of) lookup.

Parity: WaybackClient.lookup_best (/root/reference/python/sandcrawler/
ia.py:243-305). The reference fetches ≤25 CDX rows per URL over HTTP
and sorts in Python; here the whole corpus ranks in one window —
partitionBy(url) is safe (captures-per-url is naturally bounded, ~25,
so no skew concern like hosts).

Sort key (descending preference), exactly the reference's tuple
(ia.py:289-304):
  1. status in (200, 226)
  2. -status  (lower codes beat higher among non-200)
  3. mimetype == best_mimetype
  4. not a revisit record
  5. has a real petabox warc_path ('/' present)
  6. most recent datetime
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def best_capture_key(best_mimetype: str | None = None) -> list[Column]:
    keys = [
        F.col("status_code").isin(200, 226).cast("int").desc(),
        (-F.coalesce(F.col("status_code"), F.lit(999))).desc(),
    ]
    if best_mimetype is not None:
        keys.append((F.col("mimetype") == best_mimetype).cast("int").desc())
    keys += [
        (F.col("mimetype") != "warc/revisit").cast("int").desc(),
        F.col("warc_path").contains("/").cast("int").desc(),
        F.col("datetime").desc(),
    ]
    return keys


def lookup_best(cdx: DataFrame, best_mimetype: str | None = None, url_col: str = "url") -> DataFrame:
    """One best capture row per url."""
    w = Window.partitionBy(url_col).orderBy(*best_capture_key(best_mimetype))
    return (
        cdx.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lookup_closest(cdx: DataFrame, targets: DataFrame, url_col: str = "url", target_dt_col: str = "target_dt") -> DataFrame:
    """As-of join: for each (url, target_dt) pick the capture with
    datetime closest to the target (reference: CDX `closest` sort,
    ia.py:281-283, used for HTML sub-resources html_ingest.py:129,164).

    Spark has no ASOF JOIN; equi-join on url + row_number over
    abs(ts - target) expresses it exactly; captures-per-url is small
    so the window is cheap."""
    j = targets.join(cdx, on=url_col, how="inner")
    dist = F.abs(
        F.unix_timestamp(F.to_timestamp(F.col("datetime"), "yyyyMMddHHmmss"))
        - F.unix_timestamp(F.col(target_dt_col))
    )
    w = Window.partitionBy(url_col, target_dt_col).orderBy(dist.asc(), F.col("datetime").asc())
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
