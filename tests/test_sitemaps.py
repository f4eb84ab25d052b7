"""Sitemap XML parsing + robots.txt Sitemap: pointer extraction."""

from __future__ import annotations

from pyspark.sql import functions as F


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.org/p1 </loc>
    <lastmod>2024-01-05</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.org/p2</loc></url>
  <url><lastmod>2024-01-06</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.org/sitemap-1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index(spark):
    from sandcrawler_spark.functions.sitemaps import parse_sitemap

    df = spark.createDataFrame([("u", URLSET), ("i", INDEX)], ["src", "xml"])
    rows = {
        (r.src, r.seq): r
        for r in parse_sitemap(df, keep_cols=["src"]).collect()
    }
    # whitespace-trimmed loc; optional fields nullable; loc-less entry dropped
    assert rows[("u", 0)].loc == "https://a.org/p1"
    assert rows[("u", 0)].lastmod == "2024-01-05"
    assert rows[("u", 0)].priority == "0.8"
    assert rows[("u", 0)].kind == "url"
    assert rows[("u", 1)].loc == "https://a.org/p2"
    assert rows[("u", 1)].lastmod is None and rows[("u", 1)].priority is None
    assert ("u", 2) not in rows  # no <loc> -> dropped
    # sitemapindex children are kind='index' (fetch-loop feedback)
    assert rows[("i", 0)].kind == "index"
    assert rows[("i", 0)].loc == "https://a.org/sitemap-1.xml"
    assert rows[("i", 1)].lastmod is None


def test_robots_sitemap_pointers(spark):
    from sandcrawler_spark.functions.sitemaps import robots_sitemap_urls_col

    robots = ("User-agent: *\nDisallow: /tmp\n"
              "Sitemap: https://a.org/sitemap.xml\n"
              "sitemap:https://a.org/s2.xml\n")
    df = spark.createDataFrame([(robots,), ("User-agent: *\n",)], ["body"])
    got = [r.s for r in df.select(robots_sitemap_urls_col(F.col("body")).alias("s")).collect()]
    assert got[0] == ["https://a.org/sitemap.xml", "https://a.org/s2.xml"]
    assert got[1] == []


def test_kind_is_per_block_not_per_file(spark):
    """ADVICE r3: a urlset blob that merely CONTAINS the substring
    '<sitemapindex' (comment, concatenated feed) must not flip its
    page entries to index pointers — kind comes from each entry's own
    opening tag."""
    from sandcrawler_spark.functions.sitemaps import parse_sitemap

    tricky = ("<!-- not a <sitemapindex really -->\n<urlset>"
              "<url><loc>https://a.org/page</loc></url></urlset>")
    mixed = ("<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc></sitemap>"
             "</sitemapindex><urlset><url><loc>https://a.org/p9</loc></url></urlset>")
    df = spark.createDataFrame([("t", tricky), ("m", mixed)], ["src", "xml"])
    rows = {(r.src, r.seq): r for r in parse_sitemap(df, keep_cols=["src"]).collect()}
    assert rows[("t", 0)].kind == "url"
    assert rows[("m", 0)].kind == "index" and rows[("m", 0)].loc == "https://a.org/s1.xml"
    assert rows[("m", 1)].kind == "url" and rows[("m", 1)].loc == "https://a.org/p9"
