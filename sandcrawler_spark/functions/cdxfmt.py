"""CDX line parsing + 14-digit datetime codec.

Parity targets: parse_cdx_line (/root/reference/python/sandcrawler/
misc.py:133-180; golden row in tests/test_misc.py:40-60),
parse_cdx_datetime / datetime_to_cdx (misc.py:182-203).

Spark tier: the whole parse is a declarative projection+filter over
`split(value, '\\s+')` — no Python in the row path except the 32-char
base32->hex conversion (vectorized pandas UDF). Catalyst pushes the
validity filters into the scan stage; malformed/filedesc/whois rows
are dropped exactly like the reference (and countable via a
subtraction, mirroring the pusher counters workers.py:388-432).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.hashes import b32_hex_py, b32_hex_udf
from sandcrawler_spark.functions.mime import normalize_mime_col, normalize_mime_py

CDX_SCHEMA_FIELDS = [
    "surt",
    "datetime",
    "url",
    "mimetype",
    "http_status",
    "sha1b32",
    "sha1hex",
    "warc_csize",
    "warc_offset",
    "warc_path",
]


def parse_cdx_line_py(raw: str, normalize: bool = True) -> dict | None:
    """Pure-Python oracle; drops malformed / non-HTTP rows."""
    cols = raw.split()
    if len(cols) < 11:
        return None
    surt, dt, url, mime_raw, status, sha1b32 = cols[0], cols[1], cols[2], cols[3], cols[4], cols[5]
    c_size, offset, warc = cols[8], cols[9], cols[10]
    if not (sha1b32.isalnum() and c_size.isdigit() and offset.isdigit() and len(sha1b32) == 32 and dt.isdigit()):
        return None
    if "-" in (surt, dt, url, status, sha1b32, c_size, offset, warc):
        return None
    mime = normalize_mime_py(mime_raw)
    if mime is None or mime == "-":
        mime = "application/octet-stream"
    if normalize:
        mime = normalize_mime_py(mime)
    return dict(
        surt=surt,
        datetime=dt,
        url=url,
        mimetype=mime,
        http_status=int(status),
        sha1b32=sha1b32,
        sha1hex=b32_hex_py(sha1b32),
        warc_csize=int(c_size),
        warc_offset=int(offset),
        warc_path=warc,
    )


def parse_cdx_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """DataFrame of raw CDX text lines -> typed capture rows.

    Input: one string column (e.g. from spark.read.text). All filters
    are Catalyst expressions; only b32->hex crosses into Python.
    """
    c = F.split(F.trim(F.col(value_col)), r"\s+")
    df = lines.select(
        c.getItem(0).alias("surt"),
        c.getItem(1).alias("datetime"),
        c.getItem(2).alias("url"),
        c.getItem(3).alias("mime_raw"),
        c.getItem(4).alias("status_raw"),
        c.getItem(5).alias("sha1b32"),
        c.getItem(8).alias("csize_raw"),
        c.getItem(9).alias("offset_raw"),
        c.getItem(10).alias("warc_path"),
        F.size(c).alias("n_fields"),
    )
    df = df.filter(
        (F.col("n_fields") >= 11)
        & F.col("sha1b32").rlike(r"^[A-Za-z0-9]{32}$")
        & F.col("csize_raw").rlike(r"^[0-9]+$")
        & F.col("offset_raw").rlike(r"^[0-9]+$")
        & F.col("datetime").rlike(r"^[0-9]+$")
        & (F.col("surt") != "-")
        & (F.col("url") != "-")
        & (F.col("status_raw") != "-")
        & (F.col("warc_path") != "-")
    )
    mime = normalize_mime_col(F.col("mime_raw"))
    mime = F.coalesce(mime, F.lit("application/octet-stream"))
    return df.select(
        "surt",
        "datetime",
        "url",
        mime.alias("mimetype"),
        F.col("status_raw").cast("int").alias("http_status"),
        "sha1b32",
        b32_hex_udf(F.col("sha1b32")).alias("sha1hex"),
        F.col("csize_raw").cast("long").alias("warc_csize"),
        F.col("offset_raw").cast("long").alias("warc_offset"),
        "warc_path",
    )


def parse_cdx_datetime_py(dt_str: str) -> datetime.datetime | None:
    if not dt_str:
        return None
    try:
        return datetime.datetime.strptime(dt_str, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def datetime_to_cdx_py(dt: datetime.datetime) -> str:
    return dt.strftime("%Y%m%d%H%M%S")


def cdx_dt_col(ts: Column) -> Column:
    """timestamp -> 14-digit CDX string, JVM-side."""
    return F.date_format(ts, "yyyyMMddHHmmss")


def ts_from_cdx_col(dt_str: Column) -> Column:
    """14-digit CDX string -> timestamp, JVM-side."""
    return F.to_timestamp(dt_str, "yyyyMMddHHmmss")


# ---------------------------------------------------------------------------
# CDXJ — the JSON-block CDX variant pywb/OutbackCDX index with
# (SURT, 14-digit timestamp, one JSON object per line). The classic
# 11-field lines above are what Hadoop-era jobs read; CDXJ is what a
# modern replay stack serves, so the engine speaks both. Field order
# in the JSON block follows pywb's writer (url, mime, status, digest,
# length, offset, filename) — byte-stable output for the roundtrip.
# Parsing stays in the shared Java/RE2 regexp subset; values are
# URL/metadata strings that never contain raw '"' (URLs percent-encode
# them), which is what makes per-key regexp extraction exact here.
# ---------------------------------------------------------------------------


def build_cdxj_line(
    surt: Column, dt: Column, url: Column, mime: Column, status: Column,
    digest: Column, length: Column, offset: Column, filename: Column,
) -> Column:
    return F.concat(
        surt, F.lit(" "), dt, F.lit(' {"url": "'), url,
        F.lit('", "mime": "'), mime,
        F.lit('", "status": "'), status.cast("string"),
        F.lit('", "digest": "'), digest,
        F.lit('", "length": "'), length.cast("string"),
        F.lit('", "offset": "'), offset.cast("string"),
        F.lit('", "filename": "'), filename, F.lit('"}'),
    )


_CDXJ_HEAD_PAT = r"^(\S+) (\d{14}) (\{.*\})$"


def _cdxj_field(block: Column, key: str) -> Column:
    return F.regexp_extract(block, f'"{key}": "([^"]*)"', 1)


def parse_cdxj_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw CDXJ text lines -> typed capture rows (surt, datetime, url,
    mimetype, http_status, sha1b32, warc_csize, warc_offset,
    warc_path). Lines whose head doesn't match (surt, 14-digit ts,
    JSON block) or that lack a url are dropped, the parse_cdx_lines
    contract. Narrow codegen regexp scan — no JSON parser crossing."""
    raw = F.col(value_col)
    surt = F.regexp_extract(raw, _CDXJ_HEAD_PAT, 1)
    dt = F.regexp_extract(raw, _CDXJ_HEAD_PAT, 2)
    block = F.regexp_extract(raw, _CDXJ_HEAD_PAT, 3)
    out = lines.select(
        surt.alias("surt"),
        dt.alias("datetime"),
        _cdxj_field(block, "url").alias("url"),
        _cdxj_field(block, "mime").alias("mimetype"),
        _cdxj_field(block, "status").cast("int").alias("http_status"),
        _cdxj_field(block, "digest").alias("sha1b32"),
        _cdxj_field(block, "length").cast("long").alias("warc_csize"),
        _cdxj_field(block, "offset").cast("long").alias("warc_offset"),
        _cdxj_field(block, "filename").alias("warc_path"),
    )
    return out.filter((F.col("surt") != "") & (F.col("url") != ""))
