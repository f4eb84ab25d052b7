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


def pagination_gaps(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_pages: int = 3,
) -> DataFrame:
    """Pagination completeness per (host, template): URL templates
    whose single variable component is a page/id number (exactly one
    digit-run in the URL) form a numeric sequence; holes in that
    sequence are pages the crawl never saw — frontier candidates a
    sitemap or link discovery missed (the inverse of trap detection:
    instead of capping an exploding template, it back-fills a sparse
    one). Heritrix seeds these by hand; here they're mined from the
    crawl log itself.

    Per (host, template) with >= min_pages distinct observed numbers:
      n_pages     distinct page numbers seen
      min_page /
      max_page    observed numeric range (longs)
      n_missing   (max-min+1) - n_pages  = holes to back-fill
      complete    n_missing = 0

    Scale shape: pure codegen regexp to shape, ONE shuffle on
    (host, template) with map-side partial distinct-count; no window,
    no Python. Templates with >1 digit-run (dates, offsets) are
    excluded BEFORE the shuffle — the template cardinality that
    survives is bounded by site structure, not corpus size.

    The template here is over the URL's PATH+QUERY only (the host —
    which routinely carries digits: shard/cdn hostnames — stays a
    separate key column, untemplated)."""
    path = F.regexp_extract(F.lower(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1)
    shaped = urls.select(
        F.col(host_col).alias("host"),
        url_template_col(path).alias("template"),
        F.regexp_extract(path, r"([0-9]+)", 1).alias("_num"),
    ).filter(
        # exactly one digit-run in the normalized path and it parses as
        # a page number that fits a long (18 digits = BIGINT-safe)
        (F.length(F.regexp_replace("template", r"[^N]", "")) == 1)
        & (F.col("_num") != "")
        & (F.length("_num") <= 18)
    )
    g = (
        shaped.withColumn("page_n", F.col("_num").cast("long"))
        .groupBy("host", "template")
        .agg(
            F.countDistinct("page_n").cast("long").alias("n_pages"),
            F.min("page_n").alias("min_page"),
            F.max("page_n").alias("max_page"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )
    return g.select(
        "host",
        "template",
        "n_pages",
        "min_page",
        "max_page",
        (F.col("max_page") - F.col("min_page") + 1 - F.col("n_pages")).alias("n_missing"),
        (F.col("max_page") - F.col("min_page") + 1 == F.col("n_pages")).alias("complete"),
    )


def pagination_fill(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_pages: int = 3,
    max_fill: int = 200,
) -> DataFrame:
    """Frontier synthesis from pagination gaps: for each (host,
    template) sequence with holes, emit the MISSING page URLs —
    host + template with the number substituted back — as crawl
    candidates. Sequences needing more than max_fill back-fills are
    skipped whole (an unbounded range is a trap signal, not a gap;
    detect_traps owns that case), so the fan-out per template is
    bounded by construction.

    Returns (host, template, page_n, url). Scale shape: the gaps
    relation is template-cardinality (small); the only expansion is
    sequence(min, max) explode bounded by max_fill, anti-joined
    against the observed page numbers on the same (host, template,
    page_n) key."""
    gaps = pagination_gaps(urls, url_col=url_col, host_col=host_col, min_pages=min_pages)
    bounded = gaps.filter(
        (F.col("n_missing") > 0)
        & (F.col("n_missing") <= max_fill)
        & (F.col("max_page") - F.col("min_page") < 10_000)
        # templates that also collapsed a hex run can't be rebuilt into
        # a concrete URL (the H stands for an unknown id) — skip them
        & (~F.col("template").contains("H"))
    )
    # Spark sequence(a, b) DESCENDS when a > b — bounded rows always
    # have max_page > min_page (n_missing > 0 implies a hole), so the
    # ascending guard is structural here
    full = bounded.select(
        "host",
        "template",
        F.explode(F.sequence(F.col("min_page"), F.col("max_page"))).alias("page_n"),
    )
    path = F.regexp_extract(F.lower(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1)
    observed = urls.select(
        F.col(host_col).alias("host"),
        url_template_col(path).alias("template"),
        F.regexp_extract(path, r"([0-9]+)", 1).alias("_num"),
    ).filter((F.col("_num") != "") & (F.length("_num") <= 18)).select(
        "host", "template", F.col("_num").cast("long").alias("page_n")
    )
    missing = full.join(observed, ["host", "template", "page_n"], "left_anti")
    return missing.select(
        "host",
        "template",
        "page_n",
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.regexp_replace("template", "N", F.col("page_n").cast("string")),
        ).alias("url"),
    )


def host_branching(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_depth: int = 8,
) -> DataFrame:
    """URL-tree shape per host: how many distinct path nodes exist at
    each depth, and the branching factor between consecutive depths —
    the crawl-shape diagnostic behind frontier-size forecasts (a
    branching factor that never decays = an infinite URL space; cf.
    detect_traps, which catches the same pathology per template).

    Per (host, depth <= max_depth):
      n_nodes        distinct path prefixes with exactly `depth`
                     segments
      parent_nodes   distinct prefixes at depth-1 that have children
                     at this depth (0 at depth 1's virtual root -> 1)
      branching_ppm  1e6 * n_nodes div max(parent_nodes, 1)

    Scale shape: one split + bounded prefix explode per URL (<=
    max_depth rows), one (host, depth, prefix) distinct shuffle, then
    depth-keyed aggregates; no windows, no Python."""
    path = F.regexp_extract(F.lower(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://[^/]*(/[^?#]*)?", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    depth_ids = F.sequence(F.lit(1), F.least(F.size(segs), F.lit(max_depth)))
    prefixes = F.transform(depth_ids, lambda d: F.array_join(F.slice(segs, 1, d), "/"))
    ex = urls.select(
        F.col(host_col).alias("host"), F.posexplode(prefixes).alias("_i", "prefix")
    ).select("host", (F.col("_i") + 1).alias("depth"), "prefix").filter(
        F.col("prefix") != ""
    ).distinct()
    nodes = ex.groupBy("host", "depth").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    parents = (
        ex.filter(F.col("depth") > 1)
        .select(
            "host",
            F.col("depth"),
            F.expr("substring_index(prefix, '/', CAST(depth - 1 AS INT))").alias("parent"),
        )
        .distinct()
        .groupBy("host", "depth")
        .agg(F.count("*").cast("long").alias("parent_nodes"))
    )
    return (
        nodes.join(parents, ["host", "depth"], "left")
        .withColumn("parent_nodes", F.coalesce("parent_nodes", F.lit(1).cast("long")))
        .select(
            "host",
            F.col("depth").cast("long").alias("depth"),
            "n_nodes",
            "parent_nodes",
            F.expr(
                "CAST(1000000 AS BIGINT) * n_nodes div greatest(parent_nodes, CAST(1 AS BIGINT))"
            ).alias("branching_ppm"),
        )
    )


def subdomain_traps(
    df: DataFrame,
    host_col: str = "host",
    min_hosts: int = 20,
    max_template_ratio_ppm: int = 100_000,
) -> DataFrame:
    """Wildcard-DNS / subdomain-explosion trap detection per registered
    domain.

    url_template_col / detect_traps bound the URL space WITHIN a host;
    a wildcard-DNS spam farm instead mints unbounded HOSTNAMES
    ({x}.farm.example serving one template each), so the per-host view
    never sees the explosion. Signal: a registered domain with many
    distinct hostnames whose subdomain labels collapse to few shape
    templates (digit runs wildcarded, the detect_traps convention) —
    organic subdomain sets (product names, country codes) keep
    template diversity, minted ones don't.

    Output per registered domain: (registered_domain, n_hosts, n_urls,
    n_templates, is_trap) with is_trap = n_hosts >= min_hosts AND
    templates/hosts <= max_template_ratio_ppm.

    Scale shape at 10^10 URLs: first shuffle keys (domain, host) —
    cardinality = #hostnames, with map-side partial counts absorbing
    the per-host URL volume; the domain rollup then aggregates
    host-table-sized input (a mega-domain's group is its hostname
    count, not its URL count). Registered-domain extraction is the
    broadcast-dimension PSL pass (functions/psl.py) — no shuffle on
    the URL stream.
    """
    from sandcrawler_spark.functions.psl import with_registered_domain

    d0 = with_registered_domain(df, host=host_col)
    host = F.col(host_col)
    dom = F.col("registered_domain")
    label = F.when(host == dom, F.lit("")).otherwise(
        F.substring(host, F.lit(1), F.length(host) - F.length(dom) - 1)
    )
    per_host = (
        d0.filter(dom.isNotNull())
        .select(
            dom.alias("registered_domain"),
            host.alias("_host"),
            F.regexp_replace(label, r"[0-9]+", "D").alias("_template"),
        )
        .groupBy("registered_domain", "_host", "_template")
        .agg(F.count(F.lit(1)).alias("_n_urls"))
    )
    return per_host.groupBy("registered_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("_n_urls").cast("long").alias("n_urls"),
        F.countDistinct("_template").cast("long").alias("n_templates"),
        (
            (F.count(F.lit(1)) >= min_hosts)
            & (
                F.countDistinct("_template") * F.lit(1_000_000)
                <= F.count(F.lit(1)) * F.lit(max_template_ratio_ppm)
            )
        ).alias("is_trap"),
    )
