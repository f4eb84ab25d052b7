"""OAI-PMH harvest ingestion — the scholarly-web discovery channel the
reference's ecosystem feeds from: sandcrawler's ingest requests
originate in metadata harvested over OAI-PMH (link_source values like
'doaj'/'pmc'/'arxiv' in `proposals/2019_ingest.md:81-113`; the
fatcat-side harvesters poll repository ListRecords endpoints and emit
one ingest request per new/changed record). This module gives the
engine that channel natively: parse ListRecords response XML into
record rows, and apply the protocol's selective-harvest semantics
(OAI-PMH v2.0 §3.3.1: `from`/`until` are INCLUSIVE UTC datestamp
bounds; §2.5.1: a `<header status="deleted">` is a tombstone the
harvester must propagate, not skip).

Same engineering stance as sitemaps.py / feeds.py: OAI-PMH responses
are flat, schema'd XML, so a pure Catalyst codegen'd regexp scan is
the right 100 TB shape (one pass over the blob, no Python crossing,
file = unit of parallelism); patterns stay inside the RE2/Java shared
subset so the DuckDB oracle replays them verbatim.

Scale shape: parse is narrow (posexplode of per-blob matches); the
selective-harvest window is a pushed-down string-range predicate on
the datestamp column (ISO dates compare lexicographically), so at
100 TB the scan prunes on the harvest window before anything
shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block capture includes the full <record> element; non-greedy, (?s)
# for pretty-printed responses, no backreferences (RE2-safe).
_RECORD_PAT = r"(?s)(<record>.*?</record>)"
# status="deleted" sits on the header OPENING tag only (§2.5.1); a
# metadata payload merely containing the string must not flip it.
_HEADER_OPEN_PAT = r'<header[^>]*status="deleted"'
_IDENTIFIER_PAT = r"(?s)<identifier>\s*([^<\s][^<]*?)\s*</identifier>"
_DATESTAMP_PAT = r"(?s)<datestamp>\s*([^<\s][^<]*?)\s*</datestamp>"
# A record may carry several <setSpec> elements; keep them all,
# joined — set membership tests use array_contains on the split.
_SETSPEC_PAT = r"(?s)<setSpec>\s*([^<\s][^<]*?)\s*</setSpec>"
_TITLE_PAT = r"(?s)<dc:title>\s*([^<]*?)\s*</dc:title>"


def parse_oai_records(
    df: DataFrame, xml_col: str = "xml", keep_cols: list[str] | None = None
) -> DataFrame:
    """One row per <record>: keep_cols + (seq, identifier, datestamp,
    setspecs, deleted, title). Records without an identifier are
    dropped (protocol violation — nothing to key a harvest on);
    deleted tombstones are KEPT with deleted=true and a null title
    (§2.5.1 requires propagating them so downstream purges the item).
    setspecs is the comma-joined list of <setSpec> values ('' when
    none); title is the oai_dc payload title when present."""
    keep_cols = keep_cols or []
    blocks = df.select(
        *keep_cols,
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_RECORD_PAT), F.lit(1))
        ).alias("seq", "_blk"),
    )
    ident = F.regexp_extract(F.col("_blk"), _IDENTIFIER_PAT, 1)
    datestamp = F.regexp_extract(F.col("_blk"), _DATESTAMP_PAT, 1)
    setspecs = F.array_join(
        F.regexp_extract_all(F.col("_blk"), F.lit(_SETSPEC_PAT), F.lit(1)), ","
    )
    title = F.regexp_extract(F.col("_blk"), _TITLE_PAT, 1)
    deleted = F.col("_blk").rlike(_HEADER_OPEN_PAT)
    return (
        blocks.select(
            *keep_cols,
            F.col("seq").cast("int").alias("seq"),
            ident.alias("identifier"),
            F.when(datestamp != "", datestamp).alias("datestamp"),
            setspecs.alias("setspecs"),
            deleted.alias("deleted"),
            F.when((title != "") & ~deleted, title).alias("title"),
        )
        .filter(F.col("identifier") != "")
    )


def harvest_window(
    records: DataFrame,
    from_date: str | None = None,
    until_date: str | None = None,
    set_spec: str | None = None,
) -> DataFrame:
    """OAI-PMH selective harvest (§3.3.1): keep records whose
    datestamp lies in [from_date, until_date] — both bounds INCLUSIVE
    — and, when set_spec is given, whose setspecs list contains it.
    Date-granularity repositories compare plain ISO dates; because
    ISO-8601 strings order lexicographically the bounds are plain
    string comparisons (pushdown-friendly — no date parsing in the
    scan). Records with a null datestamp never match a bounded
    window (the protocol requires a datestamp; defensive here)."""
    out = records
    if from_date is not None:
        out = out.filter(F.col("datestamp") >= from_date)
    if until_date is not None:
        out = out.filter(F.col("datestamp") <= until_date)
    if set_spec is not None:
        out = out.filter(
            F.array_contains(F.split(F.col("setspecs"), ","), set_spec)
        )
    return out


def build_oai_record_xml(
    identifier: Column,
    datestamp: Column,
    setspec: Column | None = None,
    deleted: Column | None = None,
    title: Column | None = None,
) -> Column:
    """Catalyst builder for one <record> block (the write side of the
    roundtrip tests and the simulated-repository fixtures). Deleted
    records get status="deleted" on the header and NO metadata part,
    exactly as §2.5.1 mandates."""
    status = (
        F.when(deleted, F.lit(' status="deleted"')).otherwise(F.lit(""))
        if deleted is not None
        else F.lit("")
    )
    header = F.concat(
        F.lit("<header"),
        status,
        F.lit("><identifier>"),
        identifier,
        F.lit("</identifier><datestamp>"),
        datestamp,
        F.lit("</datestamp>"),
        (
            F.when(
                setspec.isNotNull() & (setspec != ""),
                F.concat(F.lit("<setSpec>"), setspec, F.lit("</setSpec>")),
            ).otherwise(F.lit(""))
            if setspec is not None
            else F.lit("")
        ),
        F.lit("</header>"),
    )
    meta = (
        F.when(
            (F.lit(False) if deleted is None else deleted)
            | title.isNull()
            | (title == ""),
            F.lit(""),
        ).otherwise(
            F.concat(
                F.lit("<metadata><oai_dc:dc><dc:title>"),
                title,
                F.lit("</dc:title></oai_dc:dc></metadata>"),
            )
        )
        if title is not None
        else F.lit("")
    )
    return F.concat(F.lit("<record>"), header, meta, F.lit("</record>"))
