"""Golden tests for the scalar-function tier.

The b32_hex / normalize_mime / file_meta expected values are the
reference's own test goldens (/root/reference/python/tests/test_misc.py
and inline self-tests misc.py:33-36,120-130) — pure-function contracts
we must match byte-for-byte.
"""

from __future__ import annotations

import datetime

import pytest

from sandcrawler_spark.functions.cdxfmt import (
    datetime_to_cdx_py,
    parse_cdx_datetime_py,
    parse_cdx_line_py,
)
from sandcrawler_spark.functions.extract_text import decode_body_py, extract_text_py
from sandcrawler_spark.functions.hashes import b32_hex_py, gen_file_metadata_py, sniff_mimetype_py
from sandcrawler_spark.functions.mime import normalize_mime_py
from sandcrawler_spark.functions.slug import slug_py
from sandcrawler_spark.functions.urls import (
    clean_url_py,
    host_of_py,
    surt_py,
    url_fuzzy_equal_py,
)


def test_b32_hex_golden():
    # goldens from reference python/tests/test_misc.py:21-37
    assert (
        b32_hex_py("sha1:TZCYZ2ULEHYGESS4L3RNH75I23KKFSMC")
        == "9e458cea8b21f0624a5c5ee2d3ffa8d6d4a2c982"
    )
    assert (
        b32_hex_py("TZCYZ2ULEHYGESS4L3RNH75I23KKFSMC")
        == "9e458cea8b21f0624a5c5ee2d3ffa8d6d4a2c982"
    )
    # 40-char hex passes through
    h = "9e458cea8b21f0624a5c5ee2d3ffa8d6d4a2c982"
    assert b32_hex_py(h) == h
    with pytest.raises(ValueError):
        b32_hex_py("short")


def test_normalize_mime_golden():
    # reference misc.py:120-130 inline self-test values
    assert normalize_mime_py("asdf") is None
    assert normalize_mime_py("application/pdf") == "application/pdf"
    assert normalize_mime_py("application/pdf+journal") == "application/pdf"
    assert normalize_mime_py("Application/PDF") == "application/pdf"
    assert normalize_mime_py("application/p") is None
    assert normalize_mime_py("application/xml+stuff") == "text/xml"
    assert normalize_mime_py("application/x-pdf") == "application/pdf"
    assert normalize_mime_py("application/x-html") is None
    assert normalize_mime_py("unk") == "application/octet-stream"
    assert normalize_mime_py("binary/octet-stream") == "application/octet-stream"
    assert normalize_mime_py(None) is None


def test_gen_file_metadata_pdf():
    blob = b"%PDF-1.4\nhello world pdf body\n%%EOF"
    m = gen_file_metadata_py(blob)
    assert m["mimetype"] == "application/pdf"
    assert m["size_bytes"] == len(blob)
    assert len(m["sha1hex"]) == 40
    assert len(m["sha256hex"]) == 64
    assert len(m["md5hex"]) == 32
    import hashlib

    assert m["sha1hex"] == hashlib.sha1(blob).hexdigest()


def test_sniff_mimetype_classes():
    assert sniff_mimetype_py(b"%PDF-1.7 ...") == "application/pdf"
    assert sniff_mimetype_py(b"\x1f\x8b\x08rest") == "application/gzip"
    assert sniff_mimetype_py(b"<!DOCTYPE html><html>") == "text/html"
    assert sniff_mimetype_py(b"<html><body>x</body></html>") == "text/html"
    assert sniff_mimetype_py(b'<?xml version="1.0"?><foo/>') == "text/xml"
    assert sniff_mimetype_py(b"plain old text") == "text/plain"
    assert sniff_mimetype_py(b"\x00\x01\x02\xff") == "application/octet-stream"
    assert sniff_mimetype_py(b"") == "application/x-empty"
    assert sniff_mimetype_py(b"%!PS-Adobe") == "application/postscript"
    assert sniff_mimetype_py(b"PK\x03\x04zipzip") == "application/zip"


def test_sniff_mime_col(spark):
    from pyspark.sql import functions as F

    from sandcrawler_spark.functions.mime import sniff_mime_col

    cases = [
        (b"%PDF-1.7 ...", "application/pdf"),
        (b"\x1f\x8b\x08rest", "application/gzip"),
        (b"<!DOCTYPE html><html>", "text/html"),
        (b"  \n\t<html><body>x", "text/html"),  # ws tolerance
        (b"\xef\xbb\xbf<?xml version='1.0'?>", "text/xml"),  # BOM strip
        (b"<HTML><HEAD>", "text/html"),
        (b"plain old text", "text/plain"),
        (b"   \n  ", "text/plain"),  # all-whitespace
        (b"\x00\x01\x02\xff", "application/octet-stream"),
        (b"\x89PNG\r\n\x1a\n", "image/png"),
        (b"\xff\xd8\xff\xe0jfif", "image/jpeg"),
        (b"PK\x03\x04zip", "application/zip"),
        (b"", "application/x-empty"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(cases)], "i int, body binary"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", sniff_mime_col(F.col("body")).alias("m")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_clean_url():
    # reference misc.py:33-36 behaviors: strip bare colon port, scheme default
    assert clean_url_py("http://BLAH.COM/file.pdf") == "http://blah.com/file.pdf"
    assert clean_url_py("example.com/thing") == "http://example.com/thing"
    assert clean_url_py("https://example.com:443/x") == "https://example.com/x"
    assert clean_url_py("http://example.com:80/x") == "http://example.com/x"
    assert clean_url_py("http://example.com:8080/x") == "http://example.com:8080/x"
    assert clean_url_py("  http://example.com  ") == "http://example.com/"


def test_url_fuzzy_equal():
    # reference misc.py behaviors (test_misc.py url fuzzy cases)
    assert url_fuzzy_equal_py("http://thing.core.ac.uk/thing.pdf", "https://thing.core.ac.uk/thing.pdf")
    assert url_fuzzy_equal_py("http://thing.core.ac.uk/thing.pdf", "http://www.thing.core.ac.uk/thing.pdf")
    assert url_fuzzy_equal_py("http://example.com/x", "http://example.com/x/")
    assert not url_fuzzy_equal_py("http://example.com/x", "http://example.com/y")


def test_surt():
    assert surt_py("https://www.example.com/Path/To?Q=1") == "com,example)/path/to?q=1"
    assert surt_py("http://example.com") == "com,example)/"
    assert surt_py("https://repo.univ1.edu/a/b") == "edu,univ1,repo)/a/b"
    # www2 label stripped like www
    assert surt_py("http://www2.blah.org/x") == "org,blah)/x"


def test_host_of():
    assert host_of_py("https://WWW.Example.COM:8443/x") == "www.example.com"
    assert host_of_py("example.org/path") == "example.org"


def test_cdx_datetime_roundtrip():
    d = datetime.datetime(2020, 10, 28, 23, 51, 3)
    s = datetime_to_cdx_py(d)
    assert s == "20201028235103"
    assert parse_cdx_datetime_py(s) == d
    assert parse_cdx_datetime_py("bogus") is None
    assert parse_cdx_datetime_py("") is None


def test_cdx_line_pusher_counter_parity(spark):
    """CdxLinePusher counter parity on the reference's own checked-in
    example.cdx (public test fixture, copied like the HTML goldens):
    the reference asserts total=20, skip-parse=1, pushed=19, and with
    filter_http_statuses=[200,226] + filter_mimetypes=['application/
    pdf']: skip-http_status=10, skip-mimetype=2, pushed=7
    (/root/reference/python/tests/test_pushers.py:6-27). The Spark
    scan + Catalyst validity filters + status/mimetype predicates must
    reproduce every counter by subtraction (workers.py:388-432
    counter semantics)."""
    import os

    from pyspark.sql import functions as F

    from sandcrawler_spark.functions.cdxfmt import parse_cdx_lines

    path = os.path.join(os.path.dirname(__file__), "files", "example.cdx")
    lines = spark.read.text(path)
    total = lines.count()
    parsed = parse_cdx_lines(lines).localCheckpoint()
    pushed = parsed.count()
    assert (total, pushed, total - pushed) == (20, 19, 1)
    st = parsed.filter(F.col("http_status").isin(200, 226)).localCheckpoint()
    n_status = st.count()
    n_final = st.filter(F.col("mimetype") == "application/pdf").count()
    assert pushed - n_status == 10   # skip-http_status
    assert n_status - n_final == 2   # skip-mimetype
    assert n_final == 7              # pushed under both filters


def test_parse_cdx_line_golden():
    # shaped like the reference's golden row (tests/test_misc.py:40-60)
    raw = (
        "edu,upenn,ldc)/sites/www.ldc.upenn.edu/files/medar2009-large-arabic-broadcast-collection.pdf "
        "20170828233154 https://www.ldc.upenn.edu/sites/www.ldc.upenn.edu/files/medar2009-large-arabic-broadcast-collection.pdf "
        "application/pdf 200 WL3FEA62TEU4F52Y5DOVQ62VET4QJW7G - - 210251 931661233 "
        "SEMSCHOLAR-PDF-CRAWL-2017-08-04-20170828231135742-00000-00009-wbgrp-svc284/SEMSCHOLAR-PDF-CRAWL-2017-08-04-20170828232253025-00005-3480~wbgrp-svc284.us.archive.org~8443.warc.gz"
    )
    row = parse_cdx_line_py(raw)
    assert row is not None
    assert row["datetime"] == "20170828233154"
    assert row["mimetype"] == "application/pdf"
    assert row["http_status"] == 200
    assert row["sha1b32"] == "WL3FEA62TEU4F52Y5DOVQ62VET4QJW7G"
    assert row["sha1hex"] == b32_hex_py("WL3FEA62TEU4F52Y5DOVQ62VET4QJW7G")
    assert row["warc_csize"] == 210251
    assert row["warc_offset"] == 931661233
    # malformed rows dropped
    assert parse_cdx_line_py("filedesc whatever") is None
    assert parse_cdx_line_py("a b c") is None


def test_decode_body_gzip_fix():
    import gzip

    inner = b"<html><body><p>hi</p></body></html>"
    assert decode_body_py(gzip.compress(inner)) == inner.decode()
    assert decode_body_py(inner) == inner.decode()


def test_extract_text_deterministic_blocks():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><nav>menu</nav><h1>Heading</h1><p>First  para.</p>"
        b"<p>Second para.</p><footer>foot</footer></body></html>"
    )
    t = extract_text_py(html)
    assert t == "Heading\nFirst para.\nSecond para."
    # idempotent / deterministic
    assert extract_text_py(html) == t
    assert extract_text_py(b"") == ""


def test_slug():
    # reference ScorableFeatures.scala semantics
    assert slug_py("Some Title of a Paper!") == "sometitleofapaper"
    assert slug_py("résumé naïve façade documents") == "resumenaivefacadedocuments"
    assert slug_py("short") is None  # < 8 chars
    assert slug_py("Introduction") is None  # denylist
    assert slug_py(None) is None
