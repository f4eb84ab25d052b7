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


# ---------------------------------------------------------------------------
# RSS/Atom feeds (functions/feeds.py) — third discovery channel
# ---------------------------------------------------------------------------

def test_feed_parse_rss_and_atom(spark):
    from sandcrawler_spark.functions.feeds import parse_feed

    rss = ("<rss><channel><title>Blog</title>"
           "<item><title>Post 1</title><link>https://a.org/p1</link>"
           "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
           '<guid isPermaLink="false">g-1</guid></item>'
           "<item><link>https://a.org/p2</link></item>"
           "</channel></rss>")
    atom = ('<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
            "<entry><title>E1</title>"
            '<link rel="alternate" href="https://b.org/e1"/>'
            "<updated>2024-01-02T00:00:00Z</updated><id>tag:b.org,e1</id></entry>"
            "</feed>")
    df = spark.createDataFrame([("r", rss), ("a", atom)], ["src", "xml"])
    rows = {(r.src, r.seq): r for r in parse_feed(df, keep_cols=["src"]).collect()}
    assert rows[("r", 0)].link == "https://a.org/p1"
    assert rows[("r", 0)].title == "Post 1"
    assert rows[("r", 0)].published == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert rows[("r", 0)].entry_id == "g-1"
    assert rows[("r", 0)].kind == "rss"
    # optional fields nullable
    assert rows[("r", 1)].title is None and rows[("r", 1)].published is None
    assert rows[("a", 0)].link == "https://b.org/e1"
    assert rows[("a", 0)].published == "2024-01-02T00:00:00Z"
    assert rows[("a", 0)].entry_id == "tag:b.org,e1"
    assert rows[("a", 0)].kind == "atom"


def test_feed_linkless_dropped_and_kind_per_entry(spark):
    from sandcrawler_spark.functions.feeds import parse_feed

    # an RSS item whose description mentions '<entry' must stay rss;
    # an item with no <link> has nothing to schedule -> dropped
    tricky = ("<rss><channel>"
              "<item><title>mentions &lt;entry and <entry here</title>"
              "<link>https://a.org/ok</link></item>"
              "<item><title>no link</title></item>"
              "</channel></rss>")
    df = spark.createDataFrame([(tricky,)], ["xml"])
    rows = parse_feed(df).collect()
    assert len(rows) == 1
    assert rows[0].link == "https://a.org/ok" and rows[0].kind == "rss"


def test_feed_roundtrip_builders(spark):
    from sandcrawler_spark.functions.feeds import (
        build_atom_entry_xml,
        build_rss_item_xml,
        parse_feed,
    )

    df = spark.createDataFrame([("https://a.org/x", "T", "D", "i-1")],
                               ["u", "t", "d", "i"])
    both = df.select(
        F.concat(
            build_rss_item_xml(F.col("u"), F.col("t"), F.col("d"), F.col("i")),
            build_atom_entry_xml(F.col("u"), F.col("t"), F.col("d"), F.col("i")),
        ).alias("xml")
    )
    rows = sorted(parse_feed(both).collect(), key=lambda r: r.seq)
    assert [r.kind for r in rows] == ["rss", "atom"]
    for r in rows:
        assert (r.link, r.title, r.published, r.entry_id) == (
            "https://a.org/x", "T", "D", "i-1")
