"""Sitemap ingestion — the crawl's second discovery channel next to
outlink extraction (operators/linkgraph.py): parse sitemap XML
(urlset and sitemapindex, sitemaps.org protocol) into frontier
candidate rows, and lift `Sitemap:` pointers out of robots.txt
(an extension line the RFC 9309 group parser in robots.py rightly
ignores — sitemap directives live outside user-agent groups).

Everything is pure Catalyst (codegen'd regexp over the XML string —
sitemaps are flat, schema'd XML; a full parser buys nothing at 100 TB
and costs a Python crossing per blob), with the patterns restricted
to the RE2/Java shared subset so the DuckDB oracle replays them
verbatim, like textstats.BPE_TOKEN_PATTERN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s): sitemap files are pretty-printed multi-line; non-greedy block
# capture keeps sibling entries apart. The capture INCLUDES the
# opening tag so kind is decided per block (a urlset blob that merely
# mentions '<sitemapindex' in a comment must not flip its page entries
# to index pointers). No backreference for the closing tag — the
# pattern stays inside the RE2/Java shared subset for the oracle.
_BLOCK_PAT = r"(?s)(<(?:url|sitemap)>.*?</(?:url|sitemap)>)"
_LOC_PAT = r"(?s)<loc>\s*([^<\s][^<]*?)\s*</loc>"
_LASTMOD_PAT = r"(?s)<lastmod>\s*([^<\s][^<]*?)\s*</lastmod>"
_PRIORITY_PAT = r"(?s)<priority>\s*([^<\s][^<]*?)\s*</priority>"
_ROBOTS_SITEMAP_PAT = r"(?i)sitemap:[ \t]*([^\s]+)"


def parse_sitemap(
    df: DataFrame, xml_col: str = "xml", keep_cols: list[str] | None = None
) -> DataFrame:
    """One row per <url>/<sitemap> entry: keep_cols + (seq, loc,
    lastmod, priority, kind). kind = 'url' for page entries, 'index'
    for nested-sitemap pointers (a sitemapindex file's children —
    feed those back through the fetch loop). Entries without a <loc>
    are dropped (required by the protocol); lastmod/priority are
    nullable strings — date parsing is the caller's policy
    (functions/biblio.parse_date_py)."""
    keep_cols = keep_cols or []
    blocks = df.select(
        *keep_cols,
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_PAT), F.lit(1))
        ).alias("seq", "_blk"),
    )
    # per-block, from the entry's own opening tag — never the file
    is_index = F.col("_blk").startswith("<sitemap>")
    loc = F.regexp_extract(F.col("_blk"), _LOC_PAT, 1)
    lastmod = F.regexp_extract(F.col("_blk"), _LASTMOD_PAT, 1)
    prio = F.regexp_extract(F.col("_blk"), _PRIORITY_PAT, 1)
    return (
        blocks.select(
            *keep_cols,
            F.col("seq").cast("int").alias("seq"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(prio != "", prio).alias("priority"),
            F.when(is_index, F.lit("index")).otherwise(F.lit("url")).alias("kind"),
        )
        .filter(F.col("loc") != "")
    )


def robots_sitemap_urls_col(text: Column) -> Column:
    """Array of Sitemap: URLs declared in a robots.txt body."""
    return F.regexp_extract_all(text, F.lit(_ROBOTS_SITEMAP_PAT), F.lit(1))


def build_urlset_xml(loc: Column, lastmod: Column | None = None,
                     priority: Column | None = None) -> Column:
    """One <url> block (used by tests/fixtures to round-trip)."""
    parts = [F.lit("<url><loc>"), loc, F.lit("</loc>")]
    if lastmod is not None:
        parts += [F.lit("<lastmod>"), lastmod, F.lit("</lastmod>")]
    if priority is not None:
        parts += [F.lit("<priority>"), priority, F.lit("</priority>")]
    parts.append(F.lit("</url>"))
    return F.concat(*parts)
