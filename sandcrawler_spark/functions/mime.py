"""Mimetype normalization — behavior parity with the reference's
`normalize_mime` (/root/reference/python/sandcrawler/misc.py:84-117,
golden values misc.py:120-130), expressed two ways:

  normalize_mime_py  — pure Python (fixture generation / oracles)
  normalize_mime_col — a single Catalyst when/otherwise chain, fully
                       JVM-side (no UDF) so it rides whole-stage
                       codegen on 10^10-row CDX scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIX_CANON = (
    "application/pdf",
    "application/postscript",
    "text/html",
    "text/xml",
    "application/octet-stream",
)

_OCTET_ALIASES = (
    "application/download",
    "binary/octet-stream",
    "unk",
    "application/x-download",
    "application/octetstream",
    "application/force-download",
    "application/unknown",
)


def normalize_mime_py(raw: str | None) -> str | None:
    if raw is None:
        return None
    raw = raw.lower().strip()
    for norm in PREFIX_CANON:
        if raw.startswith(norm):
            return norm
    if raw.startswith("application/xml"):
        return "text/xml"
    if raw.startswith("application/x-pdf"):
        return "application/pdf"
    if raw == ".pdf":
        return "application/pdf"
    if raw in _OCTET_ALIASES:
        return "application/octet-stream"
    return None


def normalize_mime_col(raw: Column) -> Column:
    r = F.lower(F.trim(raw))
    expr = F.lit(None).cast("string")
    # build the chain in reverse so earlier rules win
    expr = F.when(r.isin(*_OCTET_ALIASES), F.lit("application/octet-stream")).otherwise(expr)
    expr = F.when(r == ".pdf", F.lit("application/pdf")).otherwise(expr)
    expr = F.when(r.startswith("application/x-pdf"), F.lit("application/pdf")).otherwise(expr)
    expr = F.when(r.startswith("application/xml"), F.lit("text/xml")).otherwise(expr)
    for norm in reversed(PREFIX_CANON):
        expr = F.when(r.startswith(norm), F.lit(norm)).otherwise(expr)
    return expr
