"""DOM-skeleton template clustering over the raw page store.

Sites render thousands of pages through one template; for training
data you want ONE copy of the boilerplate shell and the per-page text,
and for crawling you want to recognize "this host is a calendar/
listing template" (the reference's html scope heuristics single out
blog/repository platforms by URL and meta tags,
/root/reference/python/sandcrawler/html_metadata.py; this operator
adds the structural signal those heuristics can't see).

Skeleton = the page's tag-name SEQUENCE (attributes and text
stripped): two pages of the same template emit the same opening-tag
stream even when every visible string differs. The signature is
md5(join(tags)) — exact-template clustering, the structural analog of
`fingerprint_dedupe`'s text fingerprint; near-template (same skeleton
modulo a repeated <li> count) is downstream's banded-LSH problem and
deliberately not duplicated here.

Scale shape: tag extraction + md5 is whole-stage codegen per page
(html bytes never shuffle); the only shuffle is the (host, sig)
groupBy whose key cardinality is #templates, not #pages. A
pathological host with a billion one-off skeletons degrades to one
row per page — same cost as fingerprint_dedupe, no skew cliff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAG_PATTERN = r"<([a-z][a-z0-9]*)"


def page_skeleton(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, host, skeleton_sig, n_tags, n_uniq_tags) per HTML page
    (non-HTML blobs — pdf/gzip magic bytes — are filtered by the same
    '<' first-byte guard the stats operators use)."""
    s = F.lower(F.decode(F.col(html_col), "UTF-8"))
    tags = F.regexp_extract_all(s, F.lit(TAG_PATTERN), 1)
    return (
        pages.filter(F.hex(F.expr(f"substring({html_col}, 1, 1)")) == "3C")
        .select(
            F.col(url_col).alias("url"),
            F.regexp_extract(url_col, r"^https?://([^/]+)", 1).alias("host"),
            F.md5(F.concat_ws(",", tags)).alias("skeleton_sig"),
            F.size(tags).cast("int").alias("n_tags"),
            F.size(F.array_distinct(tags)).cast("int").alias("n_uniq_tags"),
        )
    )


def template_clusters(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """One row per (host, skeleton): cluster size, representative URL
    (lexicographic min — deterministic), and the tag-shape stats. A
    cluster with n_pages >> 1 is a template; its per-page text minus
    the shared shell is the boilerplate-free payload."""
    sk = page_skeleton(pages, url_col, html_col)
    return sk.groupBy("host", "skeleton_sig").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.min("url").alias("rep_url"),
        F.min("n_tags").cast("int").alias("n_tags"),
        F.min("n_uniq_tags").cast("int").alias("n_uniq_tags"),
    )
