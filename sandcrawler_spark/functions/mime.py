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


# Magic-byte signature table: (hex prefix of the raw leading bytes,
# sniffed mime). Order matters — first match wins. The HTML entries
# cover the case variants real servers emit; leading ASCII whitespace
# and a UTF-8 BOM are stripped (in hex space) before matching, the
# same tolerance browsers' sniffers apply (WHATWG MIME Sniffing §7).
_MAGIC_SIGS: tuple[tuple[str, str], ...] = (
    ("25504446", "application/pdf"),          # %PDF
    ("1F8B", "application/gzip"),             # gzip member
    ("504B0304", "application/zip"),          # PK..
    ("D0CF11E0", "application/msword"),       # OLE compound
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("3C3F786D6C", "text/xml"),               # <?xml
    ("3C21444F43545950", "text/html"),        # <!DOCTYP
    ("3C21646F63747970", "text/html"),        # <!doctyp
    ("3C68746D6C", "text/html"),              # <html
    ("3C48544D4C", "text/html"),              # <HTML
    ("3C68656164", "text/html"),              # <head
    ("3C626F6479", "text/html"),              # <body
)

_WS_BOM_HEX = "^(EFBBBF)?((20|09|0A|0D))*"

# every byte of printable-ASCII text, in hex-pair space: TAB/LF/CR plus
# 0x20-0x7E (0x7F DEL excluded)
_PRINTABLE_HEX = "^((09|0A|0D|2[0-9A-F]|[3-6][0-9A-F]|7[0-9ABCDE]))+$"


def sniff_mime_col(body: Column, n_bytes: int = 32) -> Column:
    """Content-type sniffing from the leading bytes of a binary body —
    byte-space only (no decode: Spark 4's decode() throws on the very
    malformed bodies a sniffer exists to catch). The first n_bytes are
    hex-encoded, BOM/whitespace-stripped via one regexp, matched
    against the signature table, then classified text/plain if every
    remaining byte is printable ASCII (WHATWG MIME Sniffing §7's
    tolerance order); everything else is 'application/octet-stream',
    the conservative verdict the reference's libmagic path also lands
    on (/root/reference/python/sandcrawler/misc.py gen_file_metadata).
    Pure Catalyst: hex + regexp + a when-chain, whole-stage-codegen on
    a 10^10-row page scan. NULL body -> NULL, empty -> x-empty (parity
    with sniff_mimetype_py in functions/hashes.py).
    """
    h = F.upper(F.hex(F.substring(body, 1, n_bytes)))
    hs = F.regexp_replace(h, _WS_BOM_HEX, "")
    expr = F.when(
        (hs == "") | hs.rlike(_PRINTABLE_HEX), F.lit("text/plain")
    ).otherwise(F.lit("application/octet-stream"))
    for sig, mime in reversed(_MAGIC_SIGS):
        expr = F.when(hs.startswith(sig), F.lit(mime)).otherwise(expr)
    expr = F.when(h == "", F.lit("application/x-empty")).otherwise(expr)
    return F.when(body.isNull(), F.lit(None).cast("string")).otherwise(expr)


def sniff_mime_oracle_case(hex_expr: str) -> str:
    """DuckDB CASE twin of sniff_mime_col over `hex_expr` (an already
    hex-encoded, uppercased byte prefix, e.g.
    substring(upper(hex(body)), 1, 64) for a 32-byte window)."""
    stripped = (
        f"regexp_replace({hex_expr}, '^(EFBBBF)?((20|09|0A|0D))*', '')"
    )
    arms = "\n".join(
        f"  WHEN {stripped} LIKE '{sig}%' THEN '{mime}'"
        for sig, mime in _MAGIC_SIGS
    )
    return f"""CASE
  WHEN {hex_expr} IS NULL THEN NULL
  WHEN {hex_expr} = '' THEN 'application/x-empty'
{arms}
  WHEN {stripped} = ''
       OR regexp_matches({stripped}, '{_PRINTABLE_HEX}') THEN 'text/plain'
  ELSE 'application/octet-stream'
END"""


def normalize_mime_oracle_case(expr: str) -> str:
    """DuckDB CASE twin of normalize_mime_col over `expr` (a raw
    mimetype string column) — same rule order as normalize_mime_py."""
    r = f"lower(trim({expr}))"
    canon_arms = "\n".join(
        f"  WHEN {r} LIKE '{norm}%' THEN '{norm}'" for norm in PREFIX_CANON
    )
    aliases = ", ".join(f"'{a}'" for a in _OCTET_ALIASES)
    return f"""CASE
{canon_arms}
  WHEN {r} LIKE 'application/xml%' THEN 'text/xml'
  WHEN {r} LIKE 'application/x-pdf%' THEN 'application/pdf'
  WHEN {r} = '.pdf' THEN 'application/pdf'
  WHEN {r} IN ({aliases}) THEN 'application/octet-stream'
  ELSE NULL
END"""
