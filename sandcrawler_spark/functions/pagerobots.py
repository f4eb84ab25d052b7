"""Page-level robots directives — the in-page half of the politeness
contract (robots.txt is the site half, operators/politeness.py +
functions/robots*): a crawler that indexes a <meta name="robots"
content="noindex"> page or follows rel="nofollow" links violates the
published opt-out exactly like ignoring robots.txt would.

Reference tie-in: the reference obeys robots.txt via its fetch layer
but page-level meta directives don't appear in its filters
(python/sandcrawler/ingest.py wants/blocklist logic) — at corpus scale
the engine-side gate is the only place they CAN be enforced.

All extraction is codegen regexp over the decoded page — no UDF, no
shuffle; the nofollow-aware outlink variant reuses the RFC-3986
resolution subset from operators/linkgraph. Decoding uses
try_validate_utf8 (NULL on binary bodies), NOT strict decode: Catalyst
pushes these expressions through joins onto the raw page scan, where
gzip/PDF bodies would make a strict decode throw before any
url filter prunes them (the _discover_requests lesson in
streaming/rounds.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# both attribute orders; name/content values may be bare or quoted
_META_NAME_FIRST = (
    r"""<meta[^>]*name=["']?robots["']?[^>]*content=["']([^"']*)["']"""
)
_META_CONTENT_FIRST = (
    r"""<meta[^>]*content=["']([^"']*)["'][^>]*name=["']?robots["']?"""
)


def page_robots(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, robots_content, noindex, nofollow) per page. 'none' means
    noindex+nofollow per the de-facto standard; directives are matched
    as comma/space-delimited tokens, so 'nofollowme' does not trip."""
    doc = F.expr(f"try_validate_utf8({html_col})")
    content = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(doc, _META_NAME_FIRST, 1), F.lit("")),
            F.nullif(F.regexp_extract(doc, _META_CONTENT_FIRST, 1), F.lit("")),
            F.lit(""),
        )
    )
    tok = lambda d: content.rlike(rf"(^|[,\s]){d}($|[,\s])")  # noqa: E731
    return pages.select(
        F.col(url_col).alias("url"),
        content.alias("robots_content"),
        (tok("noindex") | tok("none")).alias("noindex"),
        (tok("nofollow") | tok("none")).alias("nofollow"),
    )


def outlinks_with_rel(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, nofollow) — extract_outlinks plus the
    per-anchor rel="nofollow" flag, so the frontier can keep the edge
    for graph analytics but skip it for crawl scheduling (the
    reference-grade behavior for paid/user-generated links).

    Each <a ...> opening tag is matched whole, then href and the rel
    token are derived per anchor with transform() — still one codegen
    projection."""
    from sandcrawler_spark.operators.linkgraph import _resolve_dst

    doc = F.expr(f"try_validate_utf8({html_col})")
    scheme = F.regexp_extract(F.col(url_col), r"^(https?):", 1)
    scheme_host = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    tags = F.regexp_extract_all(doc, F.lit(r"(<a\s[^>]*>)"), 1)
    exploded = pages.select(
        F.col(url_col).alias("src_url"),
        scheme.alias("_sc"),
        scheme_host.alias("_sh"),
        F.explode(tags).alias("_tag"),
    )
    href = F.regexp_extract(F.col("_tag"), r"""href=["']([^"']+)["']""", 1)
    rel_val = F.lower(
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col("_tag"), r"""rel=["']([^"']*)["']""", 1),
                F.lit(""),
            ),
            F.nullif(
                F.regexp_extract(F.col("_tag"), r"""rel=([^\s"'>]+)""", 1), F.lit("")
            ),
            F.lit(""),
        )
    )
    nofollow = rel_val.rlike(r"(^|\s)nofollow($|\s)")
    out = exploded.select(
        "src_url",
        _resolve_dst(href, F.col("_sc"), F.col("_sh")).alias("dst_url"),
        nofollow.alias("nofollow"),
    ).where(F.col("dst_url").isNotNull())
    return out.distinct()
