"""Soft-404 detection: HTTP-200 pages whose content is an error page.

A soft 404 is a page served with status 200 whose body is actually a
"not found" notice. Crawl engines must catch these or the frontier
fills with junk terminals and the corpus with boilerplate error
bodies. The reference filters hard failures by CDX status code
(`pig/filter-cdx-paper-pdfs.pig`, `python/sandcrawler/ingest.py`
status taxonomy) but trusts the 200 class; at web scale a content
detector is required (the problem class is described in Bar-Yossef et
al., "Sic Transit Gloria Telae", WWW'04).

Heuristic tiers, all pure Catalyst columns (no Python crossing on the
URL stream, whole-stage-codegen-able):
  1. status != 200 -> NULL (a hard error is already classified);
  2. error-shaped title, anchored at the start -> 'soft404:title'
     (anchoring keeps articles titled "Understanding Error 404 ...");
  3. error phrase in a TINY body -> 'soft404:tiny-error-body'
     (the size guard keeps long articles that merely DISCUSS 404s).

The regexes are module constants so the DuckDB oracle interpolates the
exact same pattern strings (Java regex and RE2 agree on this subset:
alternation, optional groups, \\s, anchors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_RX = r"^\s*(404|page not found|not found|error 404|oops)"
BODY_RX = (
    r"(page you (requested|are looking for) (was|could) not( be)? found"
    r"|no longer (available|exists)|does not exist|error 404"
    r"|404 not found|page not found)"
)
TINY_BODY_CHARS = 280


def soft404_reason_col(status: Column, title: Column, body: Column) -> Column:
    """NULL if the page looks genuine (or is a hard non-200), else the
    matching heuristic tier as a reason string."""
    t = F.lower(F.coalesce(title, F.lit("")))
    b = F.lower(F.coalesce(body, F.lit("")))
    return (
        F.when(status != 200, F.lit(None).cast("string"))
        .when(t.rlike(TITLE_RX), F.lit("soft404:title"))
        .when(
            b.rlike(BODY_RX) & (F.length(b) < TINY_BODY_CHARS),
            F.lit("soft404:tiny-error-body"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


# --- parked / for-sale domain detection (r4 session 16) --------------------

# registrar-lander phrase list — module constant so the DuckDB oracle
# interpolates the identical pattern (Java regex / RE2 shared subset)
PARKED_RX = (
    r"(this domain (is|may be) for sale|buy this domain"
    r"|domain (has|was) (recently )?(been )?registered"
    r"|parked (free )?(courtesy|by)|related searches)"
)
PARKED_MAX_OUTLINKS = 2


def parked_score_cols(body: Column) -> list[Column]:
    """Per-page parked-lander signals: registrar phrase hit, outlink
    count, visible-text length. A page is 'parked' when it carries a
    registrar phrase AND has almost no outbound links — the phrase
    alone would flag news stories ABOUT domain parking, the link
    count alone flags minimal landing pages generally.

    Parked domains are the soft-404 problem at host granularity:
    expired sites re-registered as ad landers keep their inbound
    links and their 200 status, so a crawler keeps revisiting and a
    corpus keeps ingesting registrar boilerplate. The reference
    handles specific cases via its domain blocklist
    (python/sandcrawler/ingest.py); a content detector generalizes.
    """
    lower = F.lower(body)
    # tag-level anchor count: '<a class="x" href=...' must count too,
    # not just the literal '<a href' form (Java/RE2-shared subset)
    n_out = F.regexp_count(lower, F.lit(r"<a\s[^>]*href"))
    text = F.trim(F.regexp_replace(F.regexp_replace(lower, r"<[^>]+>", " "), r"\s+", " "))
    has_phrase = lower.rlike(PARKED_RX)
    return [
        has_phrase.alias("has_parked_phrase"),
        n_out.cast("int").alias("n_outlinks"),
        F.length(text).cast("int").alias("text_chars"),
        (has_phrase & (n_out <= PARKED_MAX_OUTLINKS)).alias("is_parked"),
    ]


def parked_hosts(pages: DataFrame, host_col: str = "host") -> DataFrame:
    """Host rollup of per-page parked flags: a host is condemned when
    >= 50% of its sampled pages are parked landers (integer-exact
    2*n_parked >= n_pages form)."""
    agg = pages.groupBy(host_col).agg(
        F.count("*").cast("int").alias("n_pages"),
        F.sum(F.col("is_parked").cast("int")).cast("int").alias("n_parked"),
    )
    return agg.select(
        F.col(host_col),
        "n_pages",
        "n_parked",
        (F.col("n_parked") * 2 >= F.col("n_pages")).alias("host_parked"),
    )
