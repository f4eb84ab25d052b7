"""Per-host boilerplate line mining + stripping.

Cross-document template removal (the CCNet / RefinedWeb cleanup the
within-doc `dedupe_lines_within_doc` cannot do): a nav bar, cookie
notice, or footer appears VERBATIM on most pages of a site — each page
contains it once, so within-doc dedup never fires, yet at corpus scale
the line is pure template noise that inflates n-gram counts and leaks
into trained models. Mine the per-host line document-frequency table,
flag lines present in >= a threshold fraction of the host's documents,
and strip them from the text.

Reference tie-in: the reference extracts one page at a time
(html_ingest.py / trafilatura) and has no cross-document view; this is
a corpus-level operator only a distributed engine can run.

Scale shape (100 TB corpus):
  - explode to (host, doc, line) then DISTINCT — one shuffle keyed by
    the tuple; map-side partial dedupe bounds the explode volume;
  - line document frequency = count per (host, line) — same key family,
    partial aggs; a line shared by 10^7 docs of one host reduces
    map-side, never materializing the doc list;
  - host doc totals = tiny (one row per host) — broadcast back;
  - the strip pass re-explodes with positions and LEFT ANTI joins the
    boilerplate table on (host, line) — boilerplate is rule-table-sized
    (lines above a 50% doc-frequency cut are few), so AQE broadcasts it;
    reassembly groups by doc (single-document state per task).

Determinism: thresholds are integer cross-multiplications
(n_docs * 100 >= pct * host_docs) — no float ratios; reassembly sorts
by original line position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_lines(df: DataFrame, host_col: str, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).where(F.trim(F.col("line")) != "")


def host_boilerplate_lines(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pct: int = 50,
    min_docs: int = 3,
) -> DataFrame:
    """(host, line, n_docs, host_docs) for every non-blank line present
    in >= min_pct percent of the host's documents (ties included), on
    hosts with >= min_docs documents. The mined site-template table."""
    lines = _doc_lines(df, host_col, id_col, text_col)
    df_line = (
        lines.select("host", "id", "line")
        .distinct()
        .groupBy("host", "line")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    host_docs = df.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).cast("long").alias("host_docs")
    )
    return (
        df_line.join(F.broadcast(host_docs), "host")
        .where(
            (F.col("host_docs") >= F.lit(min_docs))
            & (F.col("n_docs") * 100 >= F.lit(min_pct) * F.col("host_docs"))
        )
        .select("host", "line", "n_docs", "host_docs")
    )


def strip_boilerplate(
    df: DataFrame,
    boilerplate: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every mined boilerplate line from each document of its
    host (blank lines drop too — they carry no content and stripping
    them keeps the rebuild well-defined). Order-preserving reassembly.

    Returns (host, id, text, n_lines, n_removed) with n_lines the
    original non-blank line count."""
    lines = _doc_lines(df, host_col, id_col, text_col)
    kept = lines.join(
        boilerplate.select("host", "line"), ["host", "line"], "left_anti"
    )
    rebuilt = kept.groupBy("host", "id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = lines.groupBy("host", "id").agg(
        F.count("*").cast("long").alias("n_lines")
    )
    return (
        totals.join(rebuilt, ["host", "id"], "left")
        .select(
            F.col("host").alias(host_col),
            F.col("id").alias(id_col),
            F.coalesce("text", F.lit("")).alias(text_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
        )
    )
