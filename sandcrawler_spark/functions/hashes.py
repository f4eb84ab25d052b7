"""Content hashing + file metadata.

Parity targets in the reference:
  - b32_hex        (/root/reference/python/sandcrawler/misc.py:69-82)
  - gen_file_metadata (misc.py:38-67) — sha1/sha256/md5 + mimetype
    sniff; the reference uses libmagic, we implement a deterministic
    magic-byte sniffer (pinned SNIFF_VERSION) with the same outcomes
    on the content classes the pipeline cares about (pdf/html/xml/
    xhtml/jats/gzip/plain/binary).

Spark tier: sha1/sha2/md5/length are built-ins (JVM, codegen) — the
struct assembly is pure Catalyst; only the mimetype sniff is a pandas
UDF over the first 1 KiB (substr pushes the byte-slice JVM-side so
Arrow only ships 1 KiB per row, not whole bodies).
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SNIFF_VERSION = "sc-sniff-1.0.0"


def b32_hex_py(s: str) -> str:
    """base32-encoded SHA-1 -> hex; 40-char hex passes through."""
    s = s.strip().split()[0].lower()
    if s.startswith("sha1:"):
        s = s[5:]
    if len(s) == 40:
        return s
    if len(s) != 32:
        raise ValueError(f"not a base-32 encoded SHA-1 hash: {s}")
    return base64.b32decode(s.upper()).hex()


@F.pandas_udf(T.StringType())
def b32_hex_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    def conv(x):
        if x is None:
            return None
        try:
            return b32_hex_py(x)
        except ValueError:
            return None

    return s.map(conv)


def sniff_mimetype_py(head: bytes) -> str:
    """Deterministic magic-byte mimetype sniff over the first 1 KiB.

    Outcome-compatible with the reference's libmagic+XML-refinement on
    the classes this pipeline routes on (misc.py:44-52)."""
    if not head:
        return "application/x-empty"
    if head.startswith(b"%PDF"):
        return "application/pdf"
    if head.startswith(b"\x1f\x8b"):
        return "application/gzip"
    if head.startswith(b"%!PS"):
        return "application/postscript"
    if head.startswith(b"PK\x03\x04"):
        return "application/zip"
    low = head[:1024].lower()
    if low.lstrip().startswith(b"<?xml") or low.lstrip().startswith(b"<!doctype article") or (
        low.lstrip().startswith(b"<article")
    ):
        # XML family: refine XHTML / JATS exactly like the reference
        if b"<htm" in head[:1024] and b'xmlns="http://www.w3.org/1999/xhtml"' in head[:1024]:
            return "application/xhtml+xml"
        if b"<article " in head[:1024] and b"<html" not in head[:1024]:
            return "application/jats+xml"
        return "text/xml"
    if b"<html" in low or b"<!doctype html" in low or b"<head" in low or b"<body" in low:
        return "text/html"
    try:
        head.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError:
        return "application/octet-stream"


@F.pandas_udf(T.StringType())
def sniff_mimetype_udf(head: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return head.map(lambda b: sniff_mimetype_py(bytes(b)) if b is not None else None)


def gen_file_metadata_py(blob: bytes) -> dict:
    """Oracle-tier file_meta (misc.py:38-67 semantics)."""
    assert blob is not None
    return {
        "size_bytes": len(blob),
        "sha1hex": hashlib.sha1(blob).hexdigest(),
        "sha256hex": hashlib.sha256(blob).hexdigest(),
        "md5hex": hashlib.md5(blob).hexdigest(),
        "mimetype": sniff_mimetype_py(blob[:1024]),
    }


def with_file_meta(df: DataFrame, blob_col: str = "html") -> DataFrame:
    """Append file_meta columns. Hashes/length are JVM built-ins (the
    body bytes never cross into Python); only the 1 KiB head crosses
    Arrow for the sniff UDF."""
    b = F.col(blob_col)
    return (
        df.withColumn("sha1hex", F.sha1(b))
        .withColumn("sha256hex", F.sha2(b, 256))
        .withColumn("md5hex", F.md5(b))
        .withColumn("size_bytes", F.length(b).cast("long"))
        .withColumn("mimetype", sniff_mimetype_udf(F.substring(b, 1, 1024)))
    )


def sha1b32_col(sha1hex: Column) -> Column:
    """hex SHA-1 -> base32 (CDX-style), pure Catalyst: unhex -> base32
    is not built-in, so route through a tiny pandas UDF only when
    needed; most pipelines carry hex end-to-end."""
    return hex_to_b32_udf(sha1hex)


@F.pandas_udf(T.StringType())
def hex_to_b32_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return s.map(
        lambda x: base64.b32encode(bytes.fromhex(x)).decode("ascii") if x is not None else None
    )
