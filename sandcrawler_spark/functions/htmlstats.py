"""HTML structure statistics over raw page bytes — all JVM-side.

Three readouts a crawl/extraction pipeline runs over its page store
(reference analog: sandcrawler's html_metadata/html_ingest stages look
at exactly these signals informally — boilerplate share, highwire
meta-tag presence, duplicated titles across captures — but never as a
corpus-wide report; see /root/reference/python/sandcrawler/
html_metadata.py:205-290 for the meta-tag pattern tables these counts
make measurable):

- `tag_density`: per-host markup-vs-text density. The text:markup
  ratio is the classic cheap boilerplate/quality signal (a host whose
  pages are 95% markup is nav-chrome or ad-shell, not content) and
  feeds the same decision the Gopher/C4 filters make per-document.
- `title_clusters`: pages sharing an identical <title> across many
  URLs/hosts — soft-404 boilerplate, cookie walls, and mirror
  detection all start from this table.
- `meta_tag_profile`: corpus-wide counts of <meta name=...> vocabulary
  — "which metadata standards does this crawl actually carry"
  (highwire citation_*, DC, OG), which is what decides whether the
  biblio extractor's pattern cascade will fire.

Scale shape: every operator here is a codegen'd string scan over the
page store followed by ONE aggregate shuffle (host-, title-, or
name-keyed) with map-side partials. The html column never shuffles:
all string math happens in the scan stage and only small (key, counts)
rows move. Non-HTML bytes (PDF, gzip) are excluded by a 1-byte magic
check on the binary column — no decode is attempted on them, so the
UTF-8 decode is safe (the scan never sees a non-'<' body).

Determinism: integer arithmetic only (counts, lengths, permille via
integer div); regexp_extract returns '' on no-match in both Spark and
DuckDB, so the twins agree on missing titles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _decoded_html(pages: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """Rows whose body is markup ('<' magic byte), with the decoded
    string and the source host. The 1-byte substring keeps the magic
    check O(1) per row regardless of body size."""
    is_markup = F.hex(F.expr(f"substring({html_col}, 1, 1)")) == "3C"
    return pages.where(is_markup).select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1).alias("host"),
        F.decode(F.col(html_col), "UTF-8").alias("s"),
        *([F.col("text").alias("text")] if "text" in pages.columns else []),
    )


def _n_occ(col: str, needle: str):
    """Occurrence count of a literal substring — pure codegen."""
    esc = needle.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(f"(length({col}) - length(replace({col}, '{esc}', ''))) div {len(needle)}")


def tag_density(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Per-host markup density over the HTML slice of the page store.

    Returns (host, n_pages, html_chars, text_chars, n_tags, n_para,
    n_anchor, n_meta, text_permille) where text_permille =
    1000 * text_chars / html_chars (integer div) — the host-level
    content-vs-chrome ratio.
    """
    h = _decoded_html(pages, url_col, html_col)
    per_page = h.select(
        "host",
        F.length("s").cast("long").alias("_html_chars"),
        (F.length("text") if "text" in h.columns else F.lit(0)).cast("long").alias("_text_chars"),
        _n_occ("s", "<").cast("long").alias("_tags"),
        _n_occ("s", "<p>").cast("long").alias("_para"),
        _n_occ("s", "<a ").cast("long").alias("_anchor"),
        _n_occ("s", "<meta ").cast("long").alias("_meta"),
    )
    return (
        per_page.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum("_html_chars").cast("long").alias("html_chars"),
            F.sum("_text_chars").cast("long").alias("text_chars"),
            F.sum("_tags").cast("long").alias("n_tags"),
            F.sum("_para").cast("long").alias("n_para"),
            F.sum("_anchor").cast("long").alias("n_anchor"),
            F.sum("_meta").cast("long").alias("n_meta"),
        )
        .withColumn(
            "text_permille",
            F.expr("CAST((1000 * text_chars) div greatest(1, html_chars) AS BIGINT)"),
        )
    )


def title_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_pages: int = 2,
) -> DataFrame:
    """Identical-<title> clusters: (title, n_pages, n_urls, n_hosts,
    exemplar_url) for titles seen on >= min_pages page rows. A title
    spread across many hosts is boilerplate (cookie wall, soft-404,
    mirror); across many URLs of one host it is template chrome."""
    h = _decoded_html(pages, url_col, html_col)
    titled = h.select(
        "url",
        "host",
        F.regexp_extract("s", r"<title>([^<]*)</title>", 1).alias("title"),
    ).where(F.col("title") != "")
    return (
        titled.groupBy("title")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.countDistinct("url").cast("long").alias("n_urls"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.min("url").alias("exemplar_url"),
        )
        .where(F.col("n_pages") >= min_pages)
    )


def meta_tag_profile(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Corpus-wide <meta name=...> vocabulary: (meta_name, n_occurrences,
    n_pages). The explode is bounded by the number of meta tags per
    page (single digits), not body length."""
    h = _decoded_html(pages, url_col, html_col)
    metas = h.select(
        "url",
        F.explode(
            F.expr(r"""regexp_extract_all(s, '<meta name="([a-z_]+)"', 1)""")
        ).alias("meta_name"),
    )
    return metas.groupBy("meta_name").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("url").cast("long").alias("n_pages"),
    )
