"""Crawl-trap detection: infinite URL spaces (calendars, session ids,
faceted search, printer views) generate unbounded distinct URLs from
one page template and can eat a crawler's whole budget on a single
host. The classic defense is template aggregation — normalize each
URL's path/query to a shape, count URLs per (host, shape), and cap or
ban shapes whose URL count explodes (Heritrix's path-regex "crawler
traps" rules, generalized to data-driven discovery).

Normalization is pure Catalyst regexp (RE2/Java shared subset, so the
DuckDB oracle replays it): digit runs -> N, long hex runs -> H, query
VALUES wildcarded (keys kept — the key set IS the template). One
shuffle on (host, template) with map-side partial counts; the flagged
template list is host-bucketed and small — broadcast back to tag the
frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: hex collapse BEFORE digit collapse (hex ids contain
# digits); 8+ hex chars = ids/uuids/hashes, shorter hex stays literal
_HEX_RUN = r"[0-9a-fA-F]{8,}"
_DIGIT_RUN = r"[0-9]+"
_QUERY_VALUE = r"=[^&#]*"


def url_template_col(url: Column) -> Column:
    """URL -> shape template: scheme+host kept, path/query normalized.
    Deterministic and engine-portable (regexp_replace only)."""
    t = F.lower(url)
    t = F.regexp_replace(t, _HEX_RUN, "H")
    t = F.regexp_replace(t, _DIGIT_RUN, "N")
    t = F.regexp_replace(t, _QUERY_VALUE, "=*")
    return t


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_urls_per_template: int = 1000,
) -> DataFrame:
    """Per (host, template): n_urls, min_url (a stable exemplar), and
    is_trap = n_urls > max_urls_per_template. The trap rows are the
    broadcast-side denylist for frontier admission (join frontier on
    (host, template), drop/deprioritize is_trap matches)."""
    shaped = urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        url_template_col(F.col(url_col)).alias("template"),
    )
    return (
        shaped.groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("url").alias("min_url"),
        )
        .withColumn("is_trap", F.col("n_urls") > max_urls_per_template)
    )


def tag_frontier_traps(
    frontier: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """frontier + in_trap flag (broadcast join against the flagged
    template list — the list is templates, not URLs: tiny)."""
    t = traps.filter(F.col("is_trap")).select("host", "template")
    shaped = frontier.withColumn("template", url_template_col(F.col(url_col)))
    return (
        shaped.join(
            F.broadcast(t.withColumn("_trap", F.lit(True))),
            on=[host_col, "template"],
            how="left",
        )
        .withColumn("in_trap", F.coalesce("_trap", F.lit(False)))
        .drop("_trap", "template")
    )
