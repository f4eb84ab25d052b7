"""Extraction hooks (GROBID/pdftrio + TEI parse), content-addressed
blob sink, revisit resolution, and the Structured Streaming ingest
(checkpointed exactly-once resume).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sandcrawler_spark.functions.hooks import (
    grobid_stub_service,
    teixml_to_json_py,
    with_grobid,
    with_pdftrio,
)
from sandcrawler_spark.operators.sinks import (
    read_blob,
    resolve_revisits,
    write_blob_store,
)


def test_teixml_to_json():
    tei = grobid_stub_service(b"%PDF-1.4 test body")["tei_xml"]
    meta = teixml_to_json_py(tei)
    assert meta["status"] == "success"
    assert meta["title"].startswith("Synthetic document")
    assert meta["doi"].startswith("10.1234/")
    assert len(meta["authors"]) == 1 and meta["authors"][0].startswith("Alex")
    assert meta["body_word_count"] > 0
    assert teixml_to_json_py("<not-xml")["status"] == "invalid-teixml"


def test_teixml2json_reference_fixture_exact():
    """Full distill == the reference's own expected JSON for its small
    TEI fixture (tests/files/small.{xml,json}, from
    /root/reference/python/tests/test_grobid2json.py:8-15)."""
    import json

    import pytest

    from sandcrawler_spark.functions.hooks import teixml2json_py

    files = os.path.join(os.path.dirname(__file__), "files")
    with open(os.path.join(files, "small.xml")) as f:
        tei = f.read()
    with open(os.path.join(files, "small.json")) as f:
        expected = json.load(f)
    assert teixml2json_py(tei) == expected
    # error contract parity (test_grobid2json.py:17-22)
    import xml.etree.ElementTree as ET

    with pytest.raises(ET.ParseError):
        teixml2json_py("this is not XML")
    with pytest.raises(ValueError):
        teixml2json_py("<xml></xml>")


def test_teixml2json_real_grobid_output():
    """The reference's real GROBID TEI dump
    (23b29ea36382680716be08fc71aa81bd226e8a85.xml) distills with full
    breadth: provenance, authors, 100 citations with context."""
    from sandcrawler_spark.functions.hooks import teixml2json_py

    files = os.path.join(os.path.dirname(__file__), "files")
    with open(os.path.join(files, "23b29ea36382680716be08fc71aa81bd226e8a85.xml"), "rb") as f:
        info = teixml2json_py(f.read())
    assert info["grobid_version"] == "0.5.1-SNAPSHOT"
    assert info["grobid_timestamp"] == "2018-04-02T00:31+0000"
    assert info["title"] == "DYNAMICS OF RAILWAY FREIGHT VEHICLES"
    assert info["date"] == "2015"
    assert info["language_code"] == "en"
    assert len(info["authors"]) == 4
    assert len(info["citations"]) == 100
    c0 = info["citations"][0]
    assert c0["index"] == 0 and c0["id"] == "b0"
    assert info["body"] and len(info["body"]) > 1000


def test_grobid_struct_breadth(spark):
    """The Spark grobid struct carries the grobid2json breadth fields."""
    df = spark.createDataFrame([(1, b"%PDF-1.4 content one")], "id long, html binary")
    g = with_grobid(df).collect()[0].grobid
    assert g.journal_name.startswith("Synthetic Journal")
    assert g.volume == "7"
    assert g.release_date == "2024-01-15"
    assert g.grobid_version == "0.7.3-sandbox"
    assert g.language_code == "en"
    assert g.citations == []


def test_with_grobid_and_pdftrio(spark):
    rows = [
        (1, b"%PDF-1.4 content one"),
        (2, b"<html><body>not a pdf</body></html>"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    out = {r.id: r for r in with_pdftrio(with_grobid(df)).collect()}
    assert out[1].grobid.status == "success"
    assert out[1].grobid.title is not None
    assert out[1].pdftrio.status == "success"
    assert 0.0 <= out[1].pdftrio.ensemble_score <= 1.0
    assert out[2].grobid.status == "error"
    assert out[3].grobid.status == "error"
    # deterministic across runs
    out2 = {r.id: r for r in with_pdftrio(with_grobid(df)).collect()}
    assert out2[1].grobid.doi == out[1].grobid.doi


def test_grobid_size_cap(spark):
    from sandcrawler_spark.functions import hooks

    big = b"%PDF-1.4" + b"x" * (hooks.GROBID_MAX_BYTES + 10)
    df = spark.createDataFrame([(1, big)], "id long, html binary")
    got = with_grobid(df).collect()[0]
    assert got.grobid.status == "error-timeout"


def test_blob_store_roundtrip(spark, tmp_path):
    import hashlib

    blobs = [(f"blob content {i}".encode(),) for i in range(20)]
    df = spark.createDataFrame(blobs, "blob binary").withColumn(
        "sha1hex", F.sha1(F.col("blob"))
    )
    # duplicate rows: idempotent put keeps one per hash
    path = str(tmp_path / "blobstore")
    write_blob_store(df.union(df), path)
    stored = spark.read.parquet(path)
    assert stored.count() == 20
    target = hashlib.sha1(b"blob content 7").hexdigest()
    got = read_blob(spark, path, target).collect()
    assert len(got) == 1 and bytes(got[0].blob) == b"blob content 7"
    # layout: sharded partition dirs exist
    assert glob.glob(os.path.join(path, "prefix_a=*/prefix_b=*"))


def test_resolve_revisits(spark, corpus):
    cdx = corpus["cdx"]
    out = resolve_revisits(cdx)
    assert out.count() == cdx.count()  # nothing lost
    rev = out.filter(F.col("mimetype") == "warc/revisit")
    n_rev = rev.count()
    if n_rev:
        resolved = rev.filter(F.col("orig_warc_path").isNotNull())
        # every revisit in the synthetic corpus has an original capture
        assert resolved.count() == n_rev
        r = resolved.first()
        assert r.orig_datetime != r.datetime or r.orig_warc_path == r.warc_path


def test_streaming_ingest_resume(spark, corpus_dir, corpus_pd, tmp_path):
    from sandcrawler_spark.streaming.stream_ingest import run_available_now

    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    first, second = pages.limit(40), pages.subtract(pages.limit(40)).limit(30)
    first.write.mode("overwrite").parquet(os.path.join(pages_dir, "batch1"))
    # stream over a glob of parquet files inside the dir
    run_available_now(spark, pages_dir + "/*", out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 40

    second.write.mode("overwrite").parquet(os.path.join(pages_dir, "batch2"))
    run_available_now(spark, pages_dir + "/*", out_dir, ckpt)
    final = spark.read.parquet(out_dir)
    assert final.count() == n1 + 30  # only the delta was processed
    # extraction output byte-identical to the oracle text column
    got = final.select(
        "url", F.date_format("warc_ts", "yyyyMMddHHmmss").alias("dt"), "extracted_text"
    )
    oracle = pages.select(
        F.col("url").alias("o_url"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("o_dt"),
        F.col("text").alias("o_text"),
    )
    joined = got.join(
        oracle, (got["url"] == oracle["o_url"]) & (got["dt"] == oracle["o_dt"]), "inner"
    )
    bad = joined.filter(F.col("extracted_text") != F.col("o_text")).count()
    assert bad == 0
