"""Public-suffix (eTLD+1) registered-domain extraction.

Crawl policy objects — politeness budgets, per-site quotas, dedupe
grouping, link-graph contraction — should key on the REGISTERED
domain, not the hostname: `a.blogspot.com` and `b.blogspot.com` are
different sites, while `www.bbc.co.uk` and `news.bbc.co.uk` are one.
The reference keys everything on the raw SURT host
(`/root/reference/pig/filter-cdx-join-urls.pig:11`,
`scalding/.../UrlDbEntry.scala` host fields) and has no eTLD+1 notion;
at web scale one is required or a single blogspot/github-pages suffix
swallows a whole politeness budget.

Semantics are the publicsuffix.org list algorithm (public spec):
  1. a rule matches when its labels equal the rightmost labels of the
     host ('*' matches exactly one label);
  2. an exception rule ('!' prefix) prevails over all others; else the
     longest (most labels) matching rule prevails; else the implicit
     rule '*' (the bare TLD is the public suffix);
  3. public suffix = the prevailing rule's labels (minus the leading
     label for an exception rule);
  4. registered domain = public suffix plus one preceding label, or
     NULL when the host IS a public suffix.

`DEFAULT_RULES` is a small curated subset of the public list (ICANN
TLDs and ccTLD second levels hit by crawls, plus the private-section
hosting suffixes that matter for politeness: github.io, blogspot.com,
*.compute.amazonaws.com, ...). The Spark tier takes any rules list —
swap in the full ~9k-rule PSL snapshot unchanged; the per-depth
dimension tables stay broadcast-sized.

Scale shape: NO shuffle and NO Python crossing. Candidate label
suffixes are computed with codegen'd array ops, then matched with one
broadcast hash join per (rule depth, wildcard tail depth) actually
present in the rules — 5 pipelined broadcast joins for the default
set, all in one stage. The alternative (explode candidates + join +
groupBy host) re-shuffles the 10^10-row stream; the multi-join keeps
it map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Subset of the publicsuffix.org list (public data). '!' = exception,
# '*.' = wildcard, as in the published format.
DEFAULT_RULES: tuple[str, ...] = (
    # generic TLDs
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "co", "ai", "dev", "app", "xyz", "site", "online",
    # ccTLDs with flat registration
    "de", "fr", "nl", "it", "es", "se", "no", "fi", "dk", "pl", "ru",
    "ch", "at", "be", "eu", "us", "ca", "mx", "ar", "cz", "gr", "pt",
    "ie", "hu", "ro", "sk", "si", "hr", "lt", "lv", "ee", "is", "li",
    # ccTLDs with second-level registration
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "br", "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "in", "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "nz", "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "za", "co.za", "net.za", "org.za", "web.za",
    "kr", "co.kr", "ne.kr", "or.kr", "ac.kr",
    "tw", "com.tw", "net.tw", "org.tw",
    "mx", "com.mx", "net.mx", "org.mx",
    "ar", "com.ar", "net.ar", "org.ar",
    "tr", "com.tr", "net.tr", "org.tr", "gov.tr",
    # the canonical wildcard + exception pair from the published list
    "ck", "*.ck", "!www.ck",
    # private-section hosting suffixes (each sub-host is its own site)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "web.app", "pages.dev",
    "vercel.app", "cloudfront.net", "s3.amazonaws.com",
    "*.compute.amazonaws.com",
)


def _parse_rules(rules):
    """-> (exact_by_depth {d: {key: is_exception}},
           wild_by_tail_depth {d: set(tail)}).

    A wildcard rule '*.t' of n labels is keyed by its (n-1)-label tail
    so it can be matched with an equi-join on the tail suffix."""
    exact: dict[int, dict[str, bool]] = {}
    wild: dict[int, set[str]] = {}
    for r in rules:
        exc = r.startswith("!")
        body = r[1:] if exc else r
        if body.startswith("*."):
            tail = body[2:]
            d = tail.count(".") + 1
            wild.setdefault(d, set()).add(tail)
        else:
            d = body.count(".") + 1
            exact.setdefault(d, {})[body] = exc or exact.get(d, {}).get(body, False)
    return exact, wild


# ---------------------------------------------------------------------------
# Python reference tier (fixtures + property-test oracle)
# ---------------------------------------------------------------------------

def public_suffix_py(host: str, rules=DEFAULT_RULES) -> str | None:
    labels = host.lower().rstrip(".").split(".")
    if "" in labels:  # leading dot / empty label: invalid host
        return None
    n = len(labels)
    exact, wild = _parse_rules(rules)
    exc_ps = None
    best = 1  # implicit '*' rule
    for i in range(1, n + 1):
        suffix = ".".join(labels[n - i:])
        is_exc = exact.get(i, {}).get(suffix)
        if is_exc:
            exc_ps = i - 1
        elif is_exc is not None:
            best = max(best, i)
        if i >= 2 and ".".join(labels[n - i + 1:]) in wild.get(i - 1, set()):
            best = max(best, i)
    ps = exc_ps if exc_ps is not None else best
    return ".".join(labels[n - ps:])


def registered_domain_py(host: str, rules=DEFAULT_RULES) -> str | None:
    labels = host.lower().rstrip(".").split(".")
    ps = public_suffix_py(host, rules)
    if ps is None:  # invalid host (empty label) — official tests: null
        return None
    k = ps.count(".") + 1
    if len(labels) <= k:
        return None
    return ".".join(labels[len(labels) - k - 1:])


# ---------------------------------------------------------------------------
# Spark column tier
# ---------------------------------------------------------------------------

def with_registered_domain(
    df: DataFrame,
    host: str | Column = "host",
    rules=DEFAULT_RULES,
    suffix_out: str = "public_suffix",
    domain_out: str = "registered_domain",
) -> DataFrame:
    """Append (public_suffix, registered_domain) columns.

    One broadcast hash join per rule depth present in `rules` (plus
    one per wildcard tail depth) — all map-side, no shuffle on `df`.
    """
    host_c = F.col(host) if isinstance(host, str) else host
    exact, wild = _parse_rules(rules)
    spark = df.sparkSession

    parts = F.split(F.lower(F.regexp_replace(host_c, r"\.$", "")), r"\.")
    out = df.withColumn("_psl_parts", parts).withColumn(
        "_psl_n", F.size("_psl_parts")
    )
    n = F.col("_psl_n")

    def suffix_col(i: int) -> Column:
        # last i labels, NULL when the host is shorter than the rule
        return F.when(
            n >= i,
            F.array_join(F.slice("_psl_parts", -i, i), "."),
        )

    exc_cands: list[Column] = []
    plain_cands: list[Column] = []
    drop_cols = ["_psl_parts", "_psl_n"]
    for d in sorted(exact):
        dim = spark.createDataFrame(
            [(k, v) for k, v in sorted(exact[d].items())],
            f"_psl_k{d} string, _psl_exc{d} boolean",
        )
        out = out.withColumn(f"_psl_s{d}", suffix_col(d)).join(
            F.broadcast(dim), F.col(f"_psl_s{d}") == F.col(f"_psl_k{d}"), "left"
        )
        exc_cands.append(
            F.when(F.col(f"_psl_exc{d}"), F.lit(d - 1)).cast("int")
        )
        plain_cands.append(
            F.when(F.col(f"_psl_exc{d}") == F.lit(False), F.lit(d)).cast("int")
        )
        drop_cols += [f"_psl_s{d}", f"_psl_k{d}", f"_psl_exc{d}"]
    for d in sorted(wild):
        dim = spark.createDataFrame(
            [(t,) for t in sorted(wild[d])], f"_psl_wk{d} string"
        )
        out = out.withColumn(f"_psl_ws{d}", suffix_col(d)).join(
            F.broadcast(dim), F.col(f"_psl_ws{d}") == F.col(f"_psl_wk{d}"), "left"
        )
        # the wildcard must consume a real label: host needs >= d+1
        plain_cands.append(
            F.when(
                F.col(f"_psl_wk{d}").isNotNull() & (n >= d + 1), F.lit(d + 1)
            ).cast("int")
        )
        drop_cols += [f"_psl_ws{d}", f"_psl_wk{d}"]

    def greatest(cands: list[Column]) -> Column:
        if not cands:
            return F.lit(None).cast("int")
        return cands[0] if len(cands) == 1 else F.greatest(*cands)

    ps_labels = F.coalesce(greatest(exc_cands), greatest(plain_cands), F.lit(1))
    out = out.withColumn("_psl_len", ps_labels)
    k = F.col("_psl_len")
    # empty label (leading dot etc.) = invalid host -> both NULL, the
    # official checkPublicSuffix semantics (same guard in the py tier)
    valid = ~F.array_contains(F.col("_psl_parts"), "")
    out = out.withColumn(
        suffix_out,
        F.when(valid, F.array_join(F.slice("_psl_parts", -k, k), ".")),
    ).withColumn(
        domain_out,
        F.when(
            valid & (n > k),
            F.array_join(F.slice("_psl_parts", -(k + 1), k + 1), "."),
        ),
    )
    return out.drop("_psl_len", *drop_cols)


def psl_rules_sql_values(rules=DEFAULT_RULES) -> str:
    """The same rule set as DuckDB VALUES rows
    (key, labels, is_wild, is_exc, tail) for relational oracle replay."""
    exact, wild = _parse_rules(rules)
    rows = []
    for d in sorted(exact):
        for key, exc in sorted(exact[d].items()):
            rows.append(f"('{key}', {d}, FALSE, {'TRUE' if exc else 'FALSE'}, NULL)")
    for d in sorted(wild):
        for tail in sorted(wild[d]):
            rows.append(f"(NULL, {d + 1}, TRUE, FALSE, '{tail}')")
    return ",\n  ".join(rows)
