"""RSS/Atom feed ingestion — the crawl's third discovery channel next
to outlink extraction (operators/linkgraph.py) and sitemaps
(functions/sitemaps.py): parse RSS 2.0 <item> and Atom <entry> blocks
into frontier candidate rows. The reference crawls scholarly landing
pages whose "what's new" surface is almost always a feed; at corpus
scale feed polling is the cheap recrawl-discovery path (feeds carry
pubDate, so change detection is free vs re-fetching every page —
pairs with operators/recrawl.change_rate_schedule).

Same engineering stance as sitemaps.py: pure Catalyst codegen'd
regexp over the XML string (feeds are flat, schema'd XML; a full
parser buys nothing at 100 TB and costs a Python crossing per blob),
patterns restricted to the RE2/Java shared subset so the DuckDB
oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block capture includes the opening tag so kind is decided per entry
# (an RSS blob merely mentioning '<entry' in a description must not
# flip). Non-greedy, (?s) for pretty-printed feeds, no backreferences.
_ENTRY_PAT = r"(?s)(<item>.*?</item>|<entry>.*?</entry>)"
_RSS_LINK_PAT = r"(?s)<link>\s*([^<\s][^<]*?)\s*</link>"
_ATOM_LINK_PAT = r'<link[^>]*href="([^"]*)"'
_TITLE_PAT = r"(?s)<title>\s*([^<]*?)\s*</title>"
_RSS_DATE_PAT = r"(?s)<pubDate>\s*([^<\s][^<]*?)\s*</pubDate>"
_ATOM_DATE_PAT = r"(?s)<updated>\s*([^<\s][^<]*?)\s*</updated>"
_RSS_ID_PAT = r"(?s)<guid[^>]*>\s*([^<\s][^<]*?)\s*</guid>"
_ATOM_ID_PAT = r"(?s)<id>\s*([^<\s][^<]*?)\s*</id>"


def parse_feed(
    df: DataFrame, xml_col: str = "xml", keep_cols: list[str] | None = None
) -> DataFrame:
    """One row per <item>/<entry>: keep_cols + (seq, link, title,
    published, entry_id, kind). kind = 'rss' | 'atom' from the entry's
    own opening tag. Entries without a link are dropped (nothing to
    schedule); title/published/entry_id are nullable raw strings —
    date parsing is the caller's policy (functions/biblio), matching
    parse_sitemap's contract."""
    keep_cols = keep_cols or []
    blocks = df.select(
        *keep_cols,
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_PAT), F.lit(1))
        ).alias("seq", "_blk"),
    )
    is_rss = F.col("_blk").startswith("<item")
    link = F.when(is_rss, F.regexp_extract(F.col("_blk"), _RSS_LINK_PAT, 1)).otherwise(
        F.regexp_extract(F.col("_blk"), _ATOM_LINK_PAT, 1)
    )
    title = F.regexp_extract(F.col("_blk"), _TITLE_PAT, 1)
    published = F.when(
        is_rss, F.regexp_extract(F.col("_blk"), _RSS_DATE_PAT, 1)
    ).otherwise(F.regexp_extract(F.col("_blk"), _ATOM_DATE_PAT, 1))
    entry_id = F.when(
        is_rss, F.regexp_extract(F.col("_blk"), _RSS_ID_PAT, 1)
    ).otherwise(F.regexp_extract(F.col("_blk"), _ATOM_ID_PAT, 1))
    return (
        blocks.select(
            *keep_cols,
            F.col("seq").cast("int").alias("seq"),
            link.alias("link"),
            F.when(title != "", title).alias("title"),
            F.when(published != "", published).alias("published"),
            F.when(entry_id != "", entry_id).alias("entry_id"),
            F.when(is_rss, F.lit("rss")).otherwise(F.lit("atom")).alias("kind"),
        )
        .filter(F.col("link") != "")
    )


def build_rss_item_xml(
    link: Column,
    title: Column | None = None,
    pubdate: Column | None = None,
    guid: Column | None = None,
) -> Column:
    """One <item> block (tests/fixtures round-trip helper)."""
    parts = [F.lit("<item>")]
    if title is not None:
        parts += [F.lit("<title>"), title, F.lit("</title>")]
    parts += [F.lit("<link>"), link, F.lit("</link>")]
    if pubdate is not None:
        parts += [F.lit("<pubDate>"), pubdate, F.lit("</pubDate>")]
    if guid is not None:
        parts += [F.lit('<guid isPermaLink="false">'), guid, F.lit("</guid>")]
    parts.append(F.lit("</item>"))
    return F.concat(*parts)


def build_atom_entry_xml(
    href: Column,
    title: Column | None = None,
    updated: Column | None = None,
    entry_id: Column | None = None,
) -> Column:
    """One <entry> block (tests/fixtures round-trip helper)."""
    parts = [F.lit("<entry>")]
    if title is not None:
        parts += [F.lit("<title>"), title, F.lit("</title>")]
    parts += [F.lit('<link rel="alternate" href="'), href, F.lit('"/>')]
    if updated is not None:
        parts += [F.lit("<updated>"), updated, F.lit("</updated>")]
    if entry_id is not None:
        parts += [F.lit("<id>"), entry_id, F.lit("</id>")]
    parts.append(F.lit("</entry>"))
    return F.concat(*parts)


# ---------------------------------------------------------------------------
# Feed AUTODISCOVERY (the RSS-autodiscovery convention every browser/
# reader implements): a page advertises its feed with
#   <link rel="alternate" type="application/rss+xml|atom+xml" href=...>
# in the <head>. This is how a crawler finds the feed to poll without
# guessing paths — the discovery half of parse_feed above. Attribute
# ORDER is free in HTML, so matching is per-attribute rlike over the
# extracted <link> tag, not one positional regex.
# ---------------------------------------------------------------------------

_LINK_TAG_PAT = r"(?i)<link\b[^>]*>"
_REL_ALT_PAT = r"""(?i)rel\s*=\s*["']?alternate"""
_TYPE_FEED_PAT = r"""(?i)type\s*=\s*["']?application/(rss|atom)\+xml"""
_HREF_PAT = r"""(?i)href\s*=\s*["']([^"']*)["']"""


def discover_feeds(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per advertised feed: keep_cols + (url, feed_url, kind).
    kind = 'rss' | 'atom' from the type attribute; href is resolved
    against the page URL (functions/urlresolve — relative hrefs are
    the common case), and tags without a usable href are dropped.

    Scale shape: narrow codegen regexp scan + posexplode of the
    per-page <link> tags (bounded by head size), no shuffle."""
    from sandcrawler_spark.functions.urlresolve import resolve_url

    keep_cols = keep_cols or []
    tags = df.select(
        *keep_cols,
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_PAT), F.lit(0))
        ).alias("_tag"),
    )
    is_alt = F.col("_tag").rlike(_REL_ALT_PAT)
    kind = F.lower(F.regexp_extract(F.col("_tag"), _TYPE_FEED_PAT, 1))
    href = F.regexp_extract(F.col("_tag"), _HREF_PAT, 1)
    return (
        tags.filter(is_alt & (kind != "") & (href != ""))
        .select(
            *keep_cols,
            "url",
            resolve_url(F.col("url"), href).alias("feed_url"),
            kind.alias("kind"),
        )
        .filter(F.col("feed_url").isNotNull())
    )
