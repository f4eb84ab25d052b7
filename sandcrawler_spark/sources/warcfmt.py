"""WARC (ISO 28500) record codec: build + parse, Spark-distributed.

The reference consumes WARC content through wayback/petabox libraries
(/root/reference/python/sandcrawler/ia.py:330-420 fetches a single
record given (warc_path, offset, c_size); the HBase schema keys rows by
file:cdx {warc, offset, compressed_size}). This module gives the graft
an OFFLINE equivalent: parse raw WARC blobs into typed record rows
without any wayback service in the loop.

Layout handled: uncompressed WARC/1.0 — a sequence of records, each
  header block (CRLF lines, terminated by an empty line)
  content block (exactly Content-Length bytes)
  two CRLFs
For `response` records the content block is an HTTP/1.x message; the
status line, Content-Type header, and payload are split out.
(Real crawls gzip each record; petabox stores the member-gzip variant.
gzip members would decompress per-blob in the same mapInPandas pass —
zlib is stdlib — but the synthetic fixtures here are uncompressed.)

Scale shape: one WARC file = one blob row (path, content) — e.g. from
spark.read.format("binaryFile") — and parsing is mapInPandas, 1 blob
in -> N record rows out, embarrassingly parallel across files, no
shuffle. A 100 TB crawl is ~100k 1 GB WARCs: partition by file, never
split a record across tasks (records are self-delimiting only
forward, so the unit of work is the file, as in Hadoop WARC readers).

md5 (not sha1) is the digest surfaced, so the DuckDB oracle can replay
it ("warc_roundtrip" in __spark_entry__.oracle_sql()).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"


def build_warc_response(url: str, date_iso: str, payload: bytes,
                        status: int = 200, mime: str = "text/html",
                        record_id: str | None = None) -> bytes:
    """One uncompressed WARC/1.0 response record (deterministic: the
    record id defaults to a digest of the inputs, not a random UUID)."""
    rid = record_id or "urn:md5:" + hashlib.md5(
        f"{url} {date_iso}".encode()
    ).hexdigest()
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"WARC-Record-ID: <{rid}>\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + CRLF + CRLF


def build_warc_file(records: list[bytes]) -> bytes:
    return b"".join(records)


def parse_warc_blob_rows(blob: bytes, path: str = "") -> list[dict]:
    """Parse every record of an uncompressed WARC blob. Malformed
    trailing bytes end the scan (truncated uploads are routine in
    crawl output; partial records are dropped, matching Hadoop WARC
    reader behavior) — a record that parses is always complete."""
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            break
        hdr_end = blob.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = hdr_end + 4
        block_end = block_start + clen
        if block_end > n:
            break
        block = blob[block_start:block_end]
        rec = {
            "path": path,
            "rec_offset": pos,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "rec_content_length": clen,
            "http_status": None,
            "mime": None,
            "payload_md5": None,
            "payload_bytes": None,
        }
        if rec["warc_type"] in ("conversion", "metadata"):
            # WET-style conversion record (extracted text) or WAT-style
            # metadata record (JSON sidecar): the block IS the payload,
            # no HTTP envelope
            rec["payload_md5"] = hashlib.md5(block).hexdigest()
            rec["payload_bytes"] = block
        elif rec["warc_type"] == "response" and block.startswith(b"HTTP/"):
            he = block.find(CRLF + CRLF)
            if he >= 0:
                hlines = block[:he].decode("utf-8", "replace").split("\r\n")
                parts = hlines[0].split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for line in hlines[1:]:
                    k, sep, v = line.partition(":")
                    if sep and k.strip().lower() == "content-type":
                        rec["mime"] = v.strip().split(";")[0].strip()
                payload = block[he + 4:]
                rec["payload_md5"] = hashlib.md5(payload).hexdigest()
                rec["payload_bytes"] = payload
        out.append(rec)
        pos = block_end
        while blob.startswith(CRLF, pos):
            pos += 2
    return out


WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("rec_offset", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("rec_content_length", T.LongType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("mime", T.StringType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("payload_bytes", T.BinaryType()),
])


def scan_warc_blobs(blobs: DataFrame, path_col: str = "path",
                    content_col: str = "content") -> DataFrame:
    """(path, content-bytes) rows -> one row per parsed WARC record.

    mapInPandas so a multi-GB file's records stream out batch-by-batch
    instead of materializing one giant exploded array per row."""
    cols = blobs.select(F.col(path_col).alias("path"),
                        F.col(content_col).alias("content"))

    def _parse(batches):  # pragma: no cover - executed on executors
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_blob_rows(bytes(content), path=str(path)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return cols.mapInPandas(_parse, schema=WARC_RECORD_SCHEMA)


def wet_record_col(url, date_iso, text):
    """WET-style WARC/1.0 `conversion` record as a pure-Catalyst string
    column — the Common-Crawl WET export (crawl text distilled to
    extracted-text records) built JVM-side, no Python in the loop.
    Content-Length counts the payload's UTF-8 BYTES (octet_length);
    the deterministic record id digests (url, date) like
    build_warc_response does."""
    rid = F.md5(F.concat(url, F.lit(" "), date_iso))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        date_iso,
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        rid,
        F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
        F.lit("\r\n\r\n"),
    )


def wat_record_col(url, date_iso, payload_json):
    """WAT-style WARC/1.0 `metadata` record (Common-Crawl WAT sidecar:
    per-page metadata as a JSON payload — outlinks, title, headers)
    as a pure-Catalyst string column, mirroring wet_record_col.
    Content-Length counts the JSON payload's UTF-8 BYTES."""
    rid = F.md5(F.concat(url, F.lit(" "), date_iso, F.lit(" wat")))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        date_iso,
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        rid,
        F.lit(">\r\nContent-Type: application/json\r\nContent-Length: "),
        F.octet_length(payload_json).cast("string"),
        F.lit("\r\n\r\n"),
        payload_json,
        F.lit("\r\n\r\n"),
    )


def reassemble_segments(
    segments: DataFrame,
    origin_col: str = "origin_id",
    segno_col: str = "segment_number",
    payload_col: str = "payload",
    total_len_col: str = "segment_total_length",
) -> DataFrame:
    """WARC 1.1 record segmentation (ISO 28500 §5.18-5.20 /
    WARC-Segment-* headers): a payload too large for one record is
    split across a first record (WARC-Segment-Number: 1) and
    continuation records carrying WARC-Segment-Origin-ID; the LAST
    continuation declares WARC-Segment-Total-Length. This reassembles:
    per origin id, payloads concatenated in segment order, validated
    against the declared total and for 1..n contiguity.

      (origin_id, n_segments, payload, total_declared, total_actual,
       status)   status in ('complete', 'length_mismatch', 'gap')

    Scale shape: one groupBy(origin) with a sorted collect of the
    segment structs — bounded by segments-per-record (a storage
    policy constant, not corpus size), so the collect_list is
    per-group tiny; length math is exact octet counts."""
    g = segments.groupBy(F.col(origin_col).alias("origin_id")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(segno_col).alias("n"), F.col(payload_col).alias("p")))
        ).alias("_segs"),
        F.max(F.col(total_len_col)).alias("total_declared"),
        F.count("*").cast("long").alias("n_segments"),
        F.min(F.col(segno_col)).cast("long").alias("_min_n"),
        F.max(F.col(segno_col)).cast("long").alias("_max_n"),
        F.count_distinct(F.col(segno_col)).cast("long").alias("_dist_n"),
    )
    payload = F.array_join(F.transform(F.col("_segs"), lambda s: s["p"]), "")
    actual = F.octet_length(payload).cast("long")
    contiguous = (
        (F.col("_min_n") == 1)
        & (F.col("_max_n") == F.col("n_segments"))
        & (F.col("_dist_n") == F.col("n_segments"))
    )
    status = (
        F.when(~contiguous, F.lit("gap"))
        .when(F.col("total_declared") != actual, F.lit("length_mismatch"))
        .otherwise(F.lit("complete"))
    )
    return g.select(
        "origin_id",
        "n_segments",
        payload.alias("payload"),
        F.col("total_declared").cast("long").alias("total_declared"),
        actual.alias("total_actual"),
        status.alias("status"),
    )


def arc2warc_record_col(url, date14, mimetype, payload):
    """ARC -> WARC migration record as a pure-Catalyst string column
    (the classic archive-ops job: IA migrated pre-2008 ARC holdings to
    WARC; arc2warc in the warctools lineage). The legacy record's
    payload is carried verbatim as a WARC/1.0 'resource' record
    (no HTTP envelope is synthesized that the ARC never had); the
    14-digit ARC date becomes the WARC ISO form, and the record id is
    the deterministic content digest (no UUIDs — replayable).

    Mirrors wet_record_col's builder shape: Catalyst concat, lengths
    in octets, CRLF framing."""
    iso = F.concat(
        F.substring(date14, 1, 4), F.lit("-"), F.substring(date14, 5, 2),
        F.lit("-"), F.substring(date14, 7, 2), F.lit("T"),
        F.substring(date14, 9, 2), F.lit(":"), F.substring(date14, 11, 2),
        F.lit(":"), F.substring(date14, 13, 2), F.lit("Z"),
    )
    rid = F.concat(F.lit("urn:md5:"), F.md5(F.concat(url, F.lit(" "), iso)))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "), url,
        F.lit("\r\nWARC-Date: "), iso,
        F.lit("\r\nWARC-Record-ID: <"), rid,
        F.lit(">\r\nContent-Type: "), mimetype,
        F.lit("\r\nContent-Length: "), F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"),
    )
