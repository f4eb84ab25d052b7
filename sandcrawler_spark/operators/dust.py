"""DUST rule mining — "Different URLs with Similar Text"
(Bar-Yossef, Keidar & Schonfeld, WWW'07): learn, from a capture log
of (url, content-fingerprint) pairs, the per-host URL rewrite rules
that explain duplicate content (tracking query params, trailing
slashes, index files, www aliases, case-folded paths). A crawler that
knows these rules canonicalizes BEFORE fetching and stops wasting
budget re-downloading the same bytes under spelled-differently URLs.

Reference tie-in: the reference canonicalizes single URLs
structurally (clean_url / SURT in python/sandcrawler/misc.py and the
pig SURT scripts) but never LEARNS site-specific alias rules from
observed duplicate captures; at 10^10-capture scale the log itself is
the best teacher. This operator is the batch learner; its output
table is broadcast-joinable back onto the frontier.

Scale shape (100 TB capture log):
  - one groupBy on the content fingerprint with a min() aggregate
    (map-side partial agg — a mega-duplicate cluster still reduces to
    one row per partition before the shuffle);
  - one equi-join back on the same fingerprint key to form
    (canonical, alias) pairs — same shuffle key, AQE handles skewed
    mega-clusters;
  - rule classification is a pure-codegen CASE over string ops;
  - final (host, rule) count agg is rule-table-sized.
No window over the cluster, no collect_list (a 10^6-URL duplicate
cluster would OOM a collected list; the min+join-back shape never
materializes a cluster in one task).

Determinism: canonical = lexicographic MIN url of the cluster;
classification is a first-match CASE replayed verbatim by the DuckDB
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first-match rule taxonomy: alias -> canonical explanations, from
# most specific to least. `alias` is the lexicographically larger URL
# in the duplicate cluster, `canon` the smallest.
_RULES = "strip_query trailing_slash index_file www_alias case_fold other".split()


def _classify(canon, alias):
    noq = F.regexp_replace(alias, r"\?.*$", "")
    return (
        F.when((noq == canon) & alias.contains("?"), F.lit("strip_query"))
        .when(F.regexp_replace(alias, r"/+$", "") == canon, F.lit("trailing_slash"))
        .when(F.regexp_replace(alias, r"/index\.html$", "") == canon, F.lit("index_file"))
        .when(F.regexp_replace(alias, r"^(https?://)www\.", r"$1") == canon, F.lit("www_alias"))
        .when((F.lower(alias) == F.lower(canon)) & (alias != canon), F.lit("case_fold"))
        .otherwise(F.lit("other"))
    )


def dust_pairs(
    captures: DataFrame,
    url_col: str = "url",
    content_col: str = "fingerprint",
) -> DataFrame:
    """(canon_url, alias_url, rule) — one row per non-canonical URL in
    every duplicate-content cluster, classified against the cluster's
    lexicographic-min canonical."""
    canon = captures.groupBy(content_col).agg(F.min(url_col).alias("canon_url"))
    pairs = (
        captures.join(canon, content_col)
        .where(F.col(url_col) != F.col("canon_url"))
        .select(
            F.col("canon_url"),
            F.col(url_col).alias("alias_url"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "rule", _classify(F.col("canon_url"), F.col("alias_url"))
    )


def dust_rules(
    captures: DataFrame,
    url_col: str = "url",
    content_col: str = "fingerprint",
    min_support: int = 2,
) -> DataFrame:
    """Per-(host, rule) support table: how many duplicate captures on
    this host a rewrite rule explains. Rules with support >=
    min_support are actionable (the WWW'07 paper's support cut);
    weaker evidence stays visible with actionable = false so
    thresholds can be tuned downstream without re-mining."""
    host = F.regexp_extract(F.col("canon_url"), r"^https?://(?:www\.)?([^/]+)", 1)
    return (
        dust_pairs(captures, url_col, content_col)
        .groupBy(host.alias("host"), "rule")
        .agg(F.count("*").cast("long").alias("support"))
        .withColumn("actionable", F.col("support") >= F.lit(min_support))
    )
