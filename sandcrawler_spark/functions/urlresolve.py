"""RFC 3986 relative-reference resolution (§5.2) in pure Catalyst —
the missing half of outlink extraction.

linkgraph._resolve_dst deliberately keeps only absolute,
protocol-relative, and root-relative hrefs (documented there): that
subset needs no base-path arithmetic and covers the bulk of nav
links. But real pages link "../issue2/paper.pdf" and "./figures/f1"
constantly — a crawler that drops dot-relative hrefs silently loses
whole sections of sites with relative-path templates (the reference
follows every <a href> after urljoin; python/sandcrawler/html.py and
html_metadata.py both lean on fully-resolved URLs). This module
implements the actual algorithm: §5.2.3 merge + §5.2.4
remove_dot_segments, as a segment fold.

The fold trick: remove_dot_segments is a stack algorithm, but with a
STRING accumulator ('..' = pop via regexp tail-strip, '.'/'' = skip,
else push) it becomes a single F.aggregate over split('/') — and
DuckDB's list_reduce evaluates the identical lambda, so the oracle is
a true twin of a genuinely iterative algorithm with no Python
crossing on either side. Both folds were cross-checked on the RFC's
own §5.4 normal+abnormal example battery (tests/test_r4s16_ops.py).

Documented divergences from the letter of the RFC (each the standard
crawler choice):
- fragments are always dropped (crawl identity ignores them; the
  reference's clean_url does the same);
- empty path segments collapse ('a//b' -> 'a/b'), matching
  surt_canonical's normalization rather than §5.2.4's preservation;
- scheme-present non-hierarchical refs ('mailto:x', 'http:g') pass
  through fragment-stripped but otherwise untouched (strict-parser
  behavior for 'http:g'); hierarchical absolute refs still get their
  dot segments removed as §5.2.2 requires;
- base URLs are assumed fragment-free (crawl frontiers store them
  canonicalized already).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_AUTH = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)"


def remove_dot_segments_col(path: Column) -> Column:
    """§5.2.4 over a '/'-leading (or empty) path. Trailing '/', '/.'
    and '/..' re-assert the trailing slash after the fold, as the
    stack algorithm does."""
    folded = F.aggregate(
        F.split(path, "/"),
        F.lit(""),
        lambda acc, x: (
            F.when((x == "") | (x == "."), acc)
            .when(x == "..", F.regexp_replace(acc, "/[^/]*$", ""))
            .otherwise(F.concat(acc, F.lit("/"), x))
        ),
    )
    wants_slash = path.rlike(r"(/|/\.|/\.\.)$")
    return F.when(path == "", F.lit("")).otherwise(
        F.when(wants_slash, F.concat(folded, F.lit("/"))).otherwise(folded)
    )


def _split3(url: Column) -> tuple[Column, Column, Column]:
    """(scheme, authority, path) of an absolute hierarchical URL."""
    scheme = F.regexp_extract(url, _SCHEME_AUTH, 1)
    auth = F.regexp_extract(url, _SCHEME_AUTH, 2)
    path = F.regexp_extract(url, _SCHEME_AUTH + r"([^?#]*)", 3)
    return scheme, auth, path


def resolve_url(base: Column, href: Column) -> Column:
    """Resolved absolute URL (fragment-free), or NULL for
    non-hierarchical/unresolvable refs a crawler drops anyway
    (javascript:, mailto:, data:) — scheme-present hierarchical and
    'http:g'-style refs resolve per the module divergence notes."""
    b_scheme, b_auth, b_path = _split3(base)
    b_query = F.regexp_extract(base, r"(\?[^#]*)", 1)

    h = F.regexp_replace(href, r"#.*$", "")  # fragments never survive
    h_path = F.regexp_extract(h, r"^([^?#]*)", 1)
    h_query = F.regexp_extract(h, r"(\?[^#]*)", 1)

    origin = F.concat(b_scheme, F.lit("://"), b_auth)
    base_dir = F.when(b_path == "", F.lit("/")).otherwise(
        F.regexp_replace(b_path, r"[^/]*$", "")
    )

    # absolute hierarchical ref (its own scheme://auth)
    a_scheme, a_auth, a_path = _split3(h)
    absolute = F.concat(
        a_scheme, F.lit("://"), a_auth, remove_dot_segments_col(a_path), h_query
    )
    # protocol-relative: adopt the base scheme, then the absolute logic
    pr = F.concat(b_scheme, F.lit(":"), h)
    pr_scheme, pr_auth, pr_path = _split3(pr)
    proto_rel = F.concat(
        pr_scheme, F.lit("://"), pr_auth,
        remove_dot_segments_col(pr_path), h_query,
    )

    merged = F.concat(base_dir, h_path)

    return (
        F.when(h == "", F.concat(origin, b_path, b_query))
        .when(h.rlike("^//"), proto_rel)
        # dropped schemes BEFORE the generic '://' branch: an
        # authority-form 'javascript://...' must return NULL, not
        # resolve as a hierarchical URL
        .when(
            h.rlike("^(javascript|mailto|data|tel):"),
            F.lit(None).cast("string"),
        )
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), absolute)
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)  # http:g strict
        .when(h.startswith("/"), F.concat(origin, remove_dot_segments_col(h_path), h_query))
        .when(h.startswith("?"), F.concat(origin, b_path, h_query))
        .otherwise(F.concat(origin, remove_dot_segments_col(merged), h_query))
    )


# --- DuckDB twin ----------------------------------------------------------

def _rds_sql(p: str) -> str:
    """remove_dot_segments as a DuckDB list_reduce over the same
    lambda. list_reduce seeds the accumulator with the FIRST element,
    which for a '/'-leading path is the '' Spark seeds explicitly —
    identical folds."""
    folded = (
        f"list_reduce(string_split({p}, '/'), (acc, x) -> "
        "CASE WHEN x = '' OR x = '.' THEN acc "
        "WHEN x = '..' THEN regexp_replace(acc, '/[^/]*$', '') "
        "ELSE acc || '/' || x END)"
    )
    return (
        f"CASE WHEN {p} = '' THEN '' "
        f"WHEN regexp_matches({p}, '(/|/\\.|/\\.\\.)$') THEN {folded} || '/' "
        f"ELSE {folded} END"
    )


def resolve_url_sql(base: str, href: str) -> str:
    """SQL expression resolving href against base — the verbatim twin
    of resolve_url. base/href are SQL expressions (e.g. column names)."""
    sa = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)"
    b_scheme = f"regexp_extract({base}, '{sa}', 1)"
    b_auth = f"regexp_extract({base}, '{sa}', 2)"
    b_path = f"regexp_extract({base}, '{sa}([^?#]*)', 3)"
    b_query = f"regexp_extract({base}, '(\\?[^#]*)', 1)"
    h = f"regexp_replace({href}, '#.*$', '')"
    h_path = f"regexp_extract({h}, '^([^?#]*)', 1)"
    h_query = f"regexp_extract({h}, '(\\?[^#]*)', 1)"
    origin = f"({b_scheme} || '://' || {b_auth})"
    base_dir = (
        f"CASE WHEN {b_path} = '' THEN '/' "
        f"ELSE regexp_replace({b_path}, '[^/]*$', '') END"
    )
    a_scheme = f"regexp_extract({h}, '{sa}', 1)"
    a_auth = f"regexp_extract({h}, '{sa}', 2)"
    a_path = f"regexp_extract({h}, '{sa}([^?#]*)', 3)"
    pr = f"({b_scheme} || ':' || {h})"
    pr_scheme = f"regexp_extract({pr}, '{sa}', 1)"
    pr_auth = f"regexp_extract({pr}, '{sa}', 2)"
    pr_path = f"regexp_extract({pr}, '{sa}([^?#]*)', 3)"
    merged = f"({base_dir} || {h_path})"
    return f"""
CASE
  WHEN {h} = '' THEN {origin} || {b_path} || {b_query}
  WHEN regexp_matches({h}, '^//')
    THEN {pr_scheme} || '://' || {pr_auth} || {_rds_sql(pr_path)} || {h_query}
  WHEN regexp_matches({h}, '^(javascript|mailto|data|tel):') THEN NULL
  WHEN regexp_matches({h}, '^[A-Za-z][A-Za-z0-9+.-]*://')
    THEN {a_scheme} || '://' || {a_auth} || {_rds_sql(a_path)} || {h_query}
  WHEN regexp_matches({h}, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN {h}
  WHEN {h} LIKE '/%' THEN {origin} || {_rds_sql(h_path)} || {h_query}
  WHEN {h} LIKE '?%' THEN {origin} || {b_path} || {h_query}
  ELSE {origin} || {_rds_sql(merged)} || {h_query}
END""".strip()
