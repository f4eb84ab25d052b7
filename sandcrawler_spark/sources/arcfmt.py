"""Legacy ARC (v1.1/v2) codec: the Internet Archive's pre-WARC
container that still backs a large share of petabox items — the
reference's wayback fetch path explicitly handles "(W)ARC record"s
and bad Alexa-era ARC files (/root/reference/python/sandcrawler/
ia.py:392,446), so an engine claiming the fetch-join surface needs to
read the old container too, not just WARC (sources/warcfmt.py).

Format (ARC_IA 1.1): each record is one space-separated header line

    URL IP-address Archive-date Content-type Archive-length

followed by exactly Archive-length bytes of payload (the raw HTTP
response), then a single separating newline. A file opens with a
filedesc:// version record whose payload carries the version banner.
Against WARC this lacks named headers, record ids, and digests —
which is exactly why the roundtrip check here carries its own payload
md5 column instead of trusting the container.

Same engine split as warcfmt: records are BUILT in pure Catalyst
(concat — the archive-writer side); a concatenated file must be
PARSED sequentially (each header's length field locates the next
record), which is the mapInPandas streaming-scanner shape, file =
unit of parallelism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARC_VERSION_BANNER = "1 1 InternetArchive"

ARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("arc_date", T.StringType()),
        T.StructField("mimetype", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def arc_record_col(url, ip, date14, mimetype, payload):
    """One ARC record as a Catalyst string column: header line +
    length-counted payload + separating newline. payload is a string
    column; Archive-length counts its UTF-8 bytes (octet_length),
    matching how the scanner walks the file."""
    return F.concat(
        url, F.lit(" "), ip, F.lit(" "), date14, F.lit(" "), mimetype,
        F.lit(" "), F.octet_length(payload).cast("string"), F.lit("\n"),
        payload, F.lit("\n"),
    )


def arc_filedesc_col(path):
    """The version record every ARC file opens with."""
    banner = F.concat(F.lit(ARC_VERSION_BANNER), F.lit("\n"))
    return F.concat(
        F.lit("filedesc://"), path,
        F.lit(" 0.0.0.0 20000101000000 text/plain "),
        F.octet_length(banner).cast("string"), F.lit("\n"),
        banner, F.lit("\n"),
    )


def parse_arc_blob_rows(blob: bytes, path: str = "") -> list[dict]:
    """Sequential record walk: header line -> length -> skip payload.
    Truncated or malformed records terminate the walk (archives are
    append-only; a short tail means a crashed writer)."""
    import hashlib

    rows: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        nl = blob.find(b"\n", pos)
        if nl < 0:
            break
        header = blob[pos:nl].decode("utf-8", errors="replace")
        parts = header.split(" ")
        if len(parts) != 5:
            break
        try:
            length = int(parts[4])
        except ValueError:
            break
        payload = blob[nl + 1:nl + 1 + length]
        if len(payload) < length:
            break  # truncated tail
        if not parts[0].startswith("filedesc://"):
            rows.append(
                {
                    "path": path,
                    "offset": pos,
                    "url": parts[0],
                    "ip": parts[1],
                    "arc_date": parts[2],
                    "mimetype": parts[3],
                    "length": length,
                    "payload_md5": hashlib.md5(payload).hexdigest(),
                }
            )
        pos = nl + 1 + length + 1  # + separating newline
    return rows


def scan_arc_blobs(
    blobs: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, content) rows -> one row per ARC response record
    (filedesc version records consumed, not emitted)."""
    cols = blobs.select(
        F.col(path_col).alias("path"), F.col(content_col).alias("content")
    )

    def _parse(batches):  # pragma: no cover - executed on executors
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_arc_blob_rows(bytes(content), path=str(path)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARC_RECORD_SCHEMA.fields]
            )

    return cols.mapInPandas(_parse, schema=ARC_RECORD_SCHEMA)
