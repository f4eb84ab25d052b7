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


# fixed application precedence — most-specific first, mirrors the
# _classify taxonomy so mine -> apply round-trips
_APPLY_ORDER = ["strip_query", "trailing_slash", "index_file", "www_alias"]


def apply_dust_rules(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rewrite frontier URLs using a host's ACTIONABLE mined rules
    (dust_rules output) BEFORE fetching — the payoff of DUST mining:
    a tracking-parameter alias or trailing-slash variant collapses to
    its canonical spelling and the seen-set/politeness layers treat
    it as the already-known URL instead of re-downloading.

    Rules apply in the fixed _APPLY_ORDER precedence, each gated on
    the host having that rule actionable; case_fold is deliberately
    NOT applied (paths are case-sensitive per RFC 3986 — the miner
    reports it as evidence, but a rewrite would corrupt URLs on
    case-sensitive servers; the reference's clean_url is similarly
    conservative, python/sandcrawler/misc.py).

    Scale shape: the rules table pivots to one boolean row per host
    (rule-taxonomy-sized columns) and broadcast-joins onto the
    frontier; the rewrite chain is pure codegen regexp — zero
    shuffle on the URL stream.

    Returns the frontier with (canon_url, rewritten) added.
    """
    flags = (
        rules.filter(F.col("actionable"))
        .groupBy("host")
        .agg(
            *[
                F.max(F.when(F.col("rule") == r, True).otherwise(False)).alias(f"_r_{r}")
                for r in _APPLY_ORDER
            ]
        )
    )
    host = F.regexp_extract(F.col(url_col), r"^https?://(?:www\.)?([^/]+)", 1)
    out = frontier.withColumn("_host", host).join(
        F.broadcast(flags.withColumnRenamed("host", "_host")), "_host", "left"
    )
    canon = F.col(url_col)
    rewrites = {
        "strip_query": lambda c: F.regexp_replace(c, r"\?.*$", ""),
        "trailing_slash": lambda c: F.regexp_replace(c, r"/+$", ""),
        "index_file": lambda c: F.regexp_replace(c, r"/index\.html$", ""),
        "www_alias": lambda c: F.regexp_replace(c, r"^(https?://)www\.", r"$1"),
    }
    for r in _APPLY_ORDER:
        canon = F.when(
            F.coalesce(F.col(f"_r_{r}"), F.lit(False)), rewrites[r](canon)
        ).otherwise(canon)
    return (
        out.withColumn("canon_url", canon)
        .withColumn("rewritten", F.col("canon_url") != F.col(url_col))
        .drop("_host", *[f"_r_{r}" for r in _APPLY_ORDER])
    )
