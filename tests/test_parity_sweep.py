"""Parity sweep: xml_reserialize (C9), zipfile scan (S3), sha1
denylist (F9), grobid/crossref quality gates (F11/F12), 3-way score
join (J5), pdf_meta row shape, timeout guard."""

from __future__ import annotations

import io
import os
import time
import zipfile

import pytest
from pyspark.sql import functions as F


def test_xml_reserialize_roundtrip():
    from sandcrawler_spark.functions.xmlfmt import xml_reserialize_py

    raw = b"<?xml version='1.0' encoding='utf-8'?><doc a='1'><x>hi</x></doc>"
    out = xml_reserialize_py(raw)
    assert out.startswith('<?xml version="1.0" encoding="UTF-8"?>\n')
    assert '<doc a="1"><x>hi</x></doc>' in out
    # idempotent on its own output
    assert xml_reserialize_py(out.encode()) == out
    assert xml_reserialize_py(b"<broken") is None


def test_zip_member_scan(spark, tmp_path):
    from sandcrawler_spark.sources.zipscan import scan_zip_members

    zpath = os.path.join(str(tmp_path), "batch.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("a/one.pdf", b"%PDF-1.4 one")
        z.writestr("a/two.pdf", b"%PDF-1.4 two two")
        z.writestr("notes.txt", b"not a pdf")
    rows = scan_zip_members(spark, zpath, suffix=".pdf").collect()
    got = {r.member_name: r for r in rows}
    assert set(got) == {"a/one.pdf", "a/two.pdf"}
    assert bytes(got["a/one.pdf"].content) == b"%PDF-1.4 one"
    assert got["a/two.pdf"].size_bytes == 16
    assert not any(r.truncated for r in rows)
    # member cap -> truncated flag, not a huge row
    capped = scan_zip_members(spark, zpath, suffix=".pdf", max_member_bytes=4).collect()
    assert all(len(bytes(r.content)) == 4 and r.truncated for r in capped)


def test_sha1_denylist_split(spark):
    from sandcrawler_spark.operators.denylist import filter_denylist, split_denylist

    df = spark.createDataFrame(
        [("aa" * 20, 1), ("bb" * 20, 2), ("cc" * 20, 3)], ["sha1hex", "v"]
    )
    deny = ["BB" * 20]  # case-insensitive on the list side
    kept, denied = split_denylist(df.withColumn("status", F.lit(None).cast("string")), deny)
    assert {r.sha1hex for r in kept.collect()} == {"aa" * 20, "cc" * 20}
    drows = denied.collect()
    assert len(drows) == 1 and drows[0].status == "skip-denylist"
    assert filter_denylist(df, deny).count() == 2


def test_grobid_and_crossref_gates(spark):
    from sandcrawler_spark.operators.score import crossref_keep_filter, grobid_keep_filter

    g = spark.createDataFrame(
        [
            ("s1", "good title", 200),
            ("s2", None, 200),
            ("s3", "failed extract", 500),
            ("s4", "x" * 2000, 200),
        ],
        ["sha1hex", "title", "status_code"],
    )
    assert [r.sha1hex for r in grobid_keep_filter(g).collect()] == ["s1"]
    c = spark.createDataFrame(
        [
            (1, "good", "journal-article"),
            (2, "good", "component"),
            (3, None, "journal-article"),
            (4, "good", "book-chapter"),
        ],
        ["id", "title", "release_type"],
    )
    assert sorted(r.id for r in crossref_keep_filter(c).collect()) == [1, 4]


def test_score_insertable_join(spark):
    from sandcrawler_spark.operators.score import score_insertable_join

    grobid = spark.createDataFrame(
        [
            ("s1", "statistical crawling methods", 200),
            ("s2", "unmatched grobid title here", 200),
            ("s3", "broken", 500),
        ],
        ["sha1hex", "title", "status_code"],
    )
    crossref = spark.createDataFrame(
        [
            (10, "Statistical Crawling: Methods", "journal-article"),
            (11, "something else entirely okay", "journal-article"),
        ],
        ["id", "title", "release_type"],
    )
    cdx = spark.createDataFrame(
        [("s1", "application/pdf", 1234), ("s2", "application/pdf", 99)],
        ["sha1hex", "mimetype", "warc_csize"],
    )
    out = score_insertable_join(grobid, crossref, cdx).collect()
    assert len(out) == 1
    r = out[0]
    assert r.sha1hex == "s1" and r.crossref_id == 10
    assert r.mimetype == "application/pdf" and r.warc_csize == 1234
    # same title modulo case/punctuation: 4 case/colon edits over 29
    # chars -> floor((29-4)*1000/29) = 862 (Levenshtein is raw-title)
    assert r.score == 862


def test_pdf_meta_row_shape(spark):
    from sandcrawler_spark.functions.hooks import with_pdf_meta

    df = spark.createDataFrame(
        [(b"%PDF-1.5 content here",), (b"<html>nope</html>",), (None,)],
        "blob binary",
    )
    rows = with_pdf_meta(df, "blob").select("pdf_meta.*").collect()
    by_status = {r.status: r for r in rows}
    ok = by_status["success"]
    assert ok.page_count >= 1 and ok.has_page0_thumbnail
    assert ok.page0_height == 842.0 and ok.page0_width == 595.0
    assert len(ok.sha1hex) == 40 and len(bytes(ok.page0_thumbnail)) == 16
    assert ok.pdf_version.startswith("1.")
    assert by_status["not-pdf"].sha1hex is not None
    assert by_status["empty-blob"].page_count is None


def test_record_budget_guard():
    from sandcrawler_spark.functions.guard import RecordTimeout, record_budget

    with record_budget(5.0):
        pass  # plenty of budget: no-op
    with pytest.raises(RecordTimeout):
        with record_budget(0.05):
            t0 = time.time()
            while time.time() - t0 < 2.0:
                pass
