"""Charset declaration QA: BOM vs <meta charset> vs HTTP header.

The reference decodes HTML with a fixed assumption and fixes fallout
after the fact (html_ingest transfer-encoding repair; our
functions/encoding.py mojibake tier). The earlier QA question — which
pages DECLARE conflicting charsets — is the mime_sniff analog for the
encoding axis: servers lie in Content-Type, pages lie in <meta>, and
the BOM outranks both (WHATWG encoding sniffing order: BOM > transport
layer > in-page meta). A 10^10-page corpus wants the conflict taxonomy
BEFORE choosing decoders.

Pure Catalyst: BOM from hex(substring(body, 1, 3)), meta charset from
one delimiter-tolerant regexp over the decoded head (both the
charset= attribute and the http-equiv content= forms), header charset
from the Content-Type parameter; a small alias CASE (utf8 -> utf-8,
latin-1 -> iso-8859-1, cp1252 -> windows-1252) before comparing.
Zero shuffle, zero Python; html bytes never leave the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

META_CS_PAT = r"(?i)<meta[^>]*charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)"
HEADER_CS_PAT = r"(?i)charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)"


def _norm_cs(c: Column) -> Column:
    low = F.lower(c)
    return (
        F.when(low.isin("utf8", "utf-8"), F.lit("utf-8"))
        .when(low.isin("latin1", "latin-1", "iso-8859-1", "iso8859-1"), F.lit("iso-8859-1"))
        .when(low.isin("cp1252", "windows-1252"), F.lit("windows-1252"))
        .when(low == "", F.lit(None).cast("string"))
        .otherwise(low)
    )


def charset_cols(body: Column, content_type: Column, head_bytes: int = 1024) -> list[Column]:
    """[bom_cs, meta_cs, header_cs, effective_cs, verdict] from an html
    binary column + the transport Content-Type string.

    effective_cs follows the WHATWG precedence BOM > header > meta,
    defaulting to windows-1252 (the HTML5 fallback for en locales) when
    nothing declares. verdict: bom_header_conflict / meta_header_conflict
    / undeclared / consistent.
    """
    h3 = F.hex(F.substring(body, 1, 3))
    h2 = F.hex(F.substring(body, 1, 2))
    bom = (
        F.when(h3 == "EFBBBF", F.lit("utf-8"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
    )
    # try_validate_utf8, not strict decode: a UTF-16 BOM'd (or binary)
    # head is invalid UTF-8 and must yield meta_cs NULL, not throw
    head = F.try_validate_utf8(F.substring(body, 1, head_bytes))
    meta = _norm_cs(F.regexp_extract(head, META_CS_PAT, 1))
    header = _norm_cs(F.regexp_extract(content_type, HEADER_CS_PAT, 1))
    effective = F.coalesce(bom, header, meta, F.lit("windows-1252"))
    verdict = (
        F.when(bom.isNotNull() & header.isNotNull() & (bom != header), F.lit("bom_header_conflict"))
        .when(meta.isNotNull() & header.isNotNull() & (meta != header), F.lit("meta_header_conflict"))
        .when(bom.isNull() & header.isNull() & meta.isNull(), F.lit("undeclared"))
        .otherwise(F.lit("consistent"))
    )
    return [
        bom.alias("bom_cs"),
        meta.alias("meta_cs"),
        header.alias("header_cs"),
        effective.alias("effective_cs"),
        verdict.alias("verdict"),
    ]
