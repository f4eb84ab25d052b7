"""Spark-tier parity: every *_col / *_udf must equal its *_py oracle
on the synthetic corpus — including the byte-identical text invariant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.functions.extract_text import with_extracted_text
from sandcrawler_spark.functions.hashes import gen_file_metadata_py, with_file_meta
from sandcrawler_spark.functions.mime import normalize_mime_col, normalize_mime_py
from sandcrawler_spark.functions.slug import slug_col, slug_py
from sandcrawler_spark.functions.urls import (
    clean_url_py,
    clean_url_udf,
    host_col,
    host_of_py,
    surt_py,
    surt_udf,
)


def test_extracted_text_byte_identical(spark, corpus, corpus_pd):
    """THE north-rule invariant: Spark-side extraction over Arrow ==
    the oracle text column computed at fixture-build time, for every
    url, byte for byte."""
    out = (
        with_extracted_text(corpus["pages"], "html")
        .select("url", "text", "extracted_text")
        .collect()
    )
    assert len(out) == len(corpus_pd["pages"])
    mismatches = [r.url for r in out if r.text != r.extracted_text]
    assert mismatches == []


def test_file_meta_matches_oracle(spark, corpus, corpus_pd):
    rows = (
        with_file_meta(corpus["pages"].limit(50), "html")
        .select("html", "sha1hex", "sha256hex", "md5hex", "size_bytes", "mimetype")
        .collect()
    )
    for r in rows:
        m = gen_file_metadata_py(bytes(r.html))
        assert r.sha1hex == m["sha1hex"]
        assert r.sha256hex == m["sha256hex"]
        assert r.md5hex == m["md5hex"]
        assert r.size_bytes == m["size_bytes"]
        assert r.mimetype == m["mimetype"]


def test_url_udfs_match_py(spark, corpus):
    rows = (
        corpus["cdx"]
        .select("url")
        .distinct()
        .limit(200)
        .withColumn("canon", clean_url_udf(F.col("url")))
        .withColumn("surt", surt_udf(F.col("url")))
        .withColumn("host", host_col(F.col("url")))
        .collect()
    )
    assert rows
    for r in rows:
        assert r.canon == clean_url_py(r.url)
        assert r.surt == surt_py(r.url)
        assert r.host == host_of_py(r.url)


def test_normalize_mime_col_matches_py(spark):
    vals = [
        "asdf", "application/pdf", "application/pdf+journal", "Application/PDF",
        "application/p", "application/xml+stuff", "application/x-pdf",
        "application/x-html", "unk", "binary/octet-stream", ".pdf",
        "text/html; charset=utf-8", "TEXT/HTML",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["raw"])
    rows = df.withColumn("norm", normalize_mime_col(F.col("raw"))).collect()
    for r in rows:
        assert r.norm == normalize_mime_py(r.raw), r.raw


def test_slug_col_matches_py(spark):
    vals = [
        "Some Title of a Paper!", "résumé naïve façade documents", "short",
        "Introduction", "A Tale of Two “Quoted” Strings — And More",
        "UPPER case TITLE with numbers 123",
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["title"])
    rows = df.withColumn("slug", slug_col(F.col("title"))).collect()
    for r in rows:
        assert r.slug == slug_py(r.title), r.title
