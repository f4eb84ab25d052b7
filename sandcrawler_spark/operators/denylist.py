"""Poison-pill content denylist (F9).

Role parity: BAD_PDF_SHA1HEX (/root/reference/python/sandcrawler/
pdfextract.py:19-146) — a ~127-entry list of content hashes known to
crash/hang the PDF tooling, checked before every extraction
(`extraction_cdx_grobid.py:41-43`). One bad document must never cost
an executor.

Spark shape: the denylist is tiny -> broadcast join. Two forms:
  - split_denylist: (kept, denied) pair, denied rows tagged with the
    reference's 'skip-denylist' status so lineage accounts for them;
  - filter_denylist: kept rows only (broadcast left-anti).
The list itself is a per-deployment artifact; callers pass their own
(tests use synthetic hashes).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deny_df(df: DataFrame, denylist: Iterable[str], sha1_col: str) -> DataFrame:
    spark = df.sparkSession
    return spark.createDataFrame(
        [(h.lower(),) for h in denylist], f"{sha1_col} string"
    ).distinct()


def filter_denylist(df: DataFrame, denylist: Iterable[str], sha1_col: str = "sha1hex") -> DataFrame:
    """Rows whose content hash is NOT denied (broadcast anti-join)."""
    deny = _deny_df(df, denylist, sha1_col)
    return df.join(F.broadcast(deny), on=sha1_col, how="left_anti")


def split_denylist(
    df: DataFrame, denylist: Iterable[str], sha1_col: str = "sha1hex", status_col: str = "status"
) -> tuple[DataFrame, DataFrame]:
    """(kept, denied) — denied rows get status='skip-denylist'
    (pdfextract.py:268-274 emits a bad-pdf status row, it does not drop
    the record silently)."""
    deny = _deny_df(df, denylist, sha1_col).withColumn("_denied", F.lit(True))
    marked = df.join(F.broadcast(deny), on=sha1_col, how="left")
    kept = marked.filter(F.col("_denied").isNull()).drop("_denied")
    denied = marked.filter(F.col("_denied")).drop("_denied").withColumn(
        status_col, F.lit("skip-denylist")
    )
    return kept, denied


def purge_propagation(
    tables: dict[str, tuple[DataFrame, str]],
    purge_keys: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Deletion-compliance receipt: propagate one purge list (takedown
    / right-to-be-forgotten / OAI-PMH deleted-record tombstones)
    across every table that carries the key — the corpus-governance
    dual of the poison-pill denylist above, but auditable: for each
    named table, how many rows the purge removes and how many remain.

      tables: {table_name: (df, its_key_column)}
      purge_keys: one-column relation of keys to purge (key_col)

    Returns (table_name, n_before, n_purged, n_after) — and the
    invariant n_before = n_purged + n_after is the receipt a
    compliance audit checks.

    Scale shape: the purge list is takedown-sized (tiny vs any
    corpus table), so each table pays ONE broadcast semi/anti join
    and count aggregates — no shuffle on the big sides; tables are
    processed as a union of 1-row count relations."""
    pk = F.broadcast(purge_keys.select(F.col(key_col).alias("_pk")).distinct())
    parts = []
    for name, (df, col) in tables.items():
        keyed = df.select(F.col(col).alias("_pk"))
        purged = keyed.join(pk, on="_pk", how="left_semi").agg(
            F.count("*").cast("long").alias("n_purged")
        )
        total = keyed.agg(F.count("*").cast("long").alias("n_before"))
        parts.append(
            total.crossJoin(purged).select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_purged",
                (F.col("n_before") - F.col("n_purged")).cast("long").alias("n_after"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
