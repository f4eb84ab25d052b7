"""URL canonicalization: clean_url, fuzzy equality, SURT keys, host.

Semantics modeled on the reference's behavior (see
/root/reference/python/sandcrawler/misc.py:14-31 `clean_url` /
`url_fuzzy_equal`, and the SURT key used as CDX field 0,
misc.py:144 + pig/filter-cdx-join-urls.pig:11) — reimplemented from
scratch on the stdlib (the reference delegates to the `urlcanon`
package, which is not part of this engine's pinned dependency set;
determinism of OUR canonical form is the contract, pinned by
CANON_VERSION and golden tests).

Two tiers per function:
  *_py      — pure-Python reference implementation (used by the
              fixture generator and as the oracle in tests)
  *_col     — Spark Column expression (JVM-side, codegen'd) where the
              semantics fit built-ins; otherwise a vectorized
              pandas UDF over the _py implementation.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANON_VERSION = "sc-urlcanon-1.0.0"

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


def clean_url_py(s: str) -> str:
    """WHATWG-style URL normalization: trim, default scheme, lowercase
    scheme+host, strip default/bare port, empty path -> '/'."""
    s = s.strip()
    if "://" not in s:
        s = "http://" + s
    sp = urlsplit(s)
    scheme = sp.scheme.lower()
    host = (sp.hostname or "").rstrip(".").lower()
    try:
        port = sp.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = sp.path or "/"
    return urlunsplit((scheme, netloc, path, sp.query, sp.fragment))


def url_fuzzy_equal_py(left: str, right: str) -> bool:
    """Scheme/www/:80/trailing-slash-insensitive URL equality."""
    a = _fuzzy_key_py(left)
    b = _fuzzy_key_py(right)
    return a == b or a == b + "/" or b == a + "/"


def _fuzzy_key_py(u: str) -> str:
    c = clean_url_py(u)
    c = c.split("://", 1)[1] if "://" in c else c
    return c.replace("www.", "").replace(":80/", "/")


def host_of_py(url: str) -> str:
    s = url.strip()
    if "://" not in s:
        s = "http://" + s
    return (urlsplit(s).hostname or "").rstrip(".").lower()


def surt_py(url: str) -> str:
    """SURT canonical key: reversed-comma host + ')' + lowercased path
    [+ '?' + query]. Leading www\\d*. stripped; this is the seen-set /
    partition / crawl-order key."""
    c = clean_url_py(url)
    sp = urlsplit(c)
    host = (sp.hostname or "").rstrip(".").lower()
    # strip a single leading www / www2 / www13 label
    labels = host.split(".")
    if len(labels) > 2 and labels[0].startswith("www") and (
        labels[0] == "www" or labels[0][3:].isdigit()
    ):
        labels = labels[1:]
    key = ",".join(reversed(labels)) + ")" + (sp.path or "/").lower()
    if sp.query:
        key += "?" + sp.query.lower()
    return key


# ---------------------------------------------------------------------------
# Spark column tier
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def clean_url_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    return s.map(lambda x: clean_url_py(x) if x is not None else None)


@F.pandas_udf(T.StringType())
def surt_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    return s.map(lambda x: surt_py(x) if x is not None else None)


def host_col(url: Column) -> Column:
    """Extract lowercase host with pure Catalyst expressions (hot path:
    the politeness scheduler groups 10^10 rows by this — must stay
    JVM-side, no Python)."""
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    authority = F.split(no_scheme, "[/?#]").getItem(0)
    no_user = F.element_at(F.split(authority, "@"), -1)
    host = F.split(no_user, ":").getItem(0)
    return F.lower(F.regexp_replace(host, r"\.$", ""))


def fuzzy_key_col(url: Column) -> Column:
    """JVM-side analog of _fuzzy_key_py for equality joins."""
    no_scheme = F.regexp_replace(F.trim(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    k = F.regexp_replace(no_scheme, r"www\.", "")
    k = F.regexp_replace(k, r":80/", "/")
    return F.regexp_replace(k, r"/$", "")


def surt_host_key_col(url: Column) -> Column:
    """Pure-Catalyst reversed-host key (no path), for partitioning /
    bucketing by site without a Python crossing. Full SURT (with path)
    needs surt_udf; this cheap key covers the 90% case (politeness,
    host histograms, skew detection)."""
    host = host_col(url)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    return F.array_join(F.reverse(F.split(host, r"\.")), ",")


def pct_normalize_col(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure Catalyst:
    decode %XX escapes of UNRESERVED characters (ALPHA / DIGIT / '-' /
    '.' / '_' / '~') to the literal character, and uppercase the hex
    digits of every other valid escape ('%2f' -> '%2F'); malformed
    escapes (no two hex digits after '%') pass through unchanged.
    These are the two normalizations every conformant URL normalizer
    must apply before comparison — without them '%7Euser' and '~user'
    (or '%2f' vs '%2F') hash apart and evade the seen set, splitting
    crawl history for one resource across aliases (the DUST family's
    encoding axis; the reference's clean_url handles only whitespace
    and tag-soup artifacts, python/sandcrawler/misc.py clean_url).

    Shape: split on '%', one narrow transform over the pieces, rejoin
    — zero shuffle, zero Python, fully codegen'd; safe on arbitrary
    byte soup (no decode() call that could throw on invalid UTF-8).
    """
    parts = F.split(url, "%", -1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def _fix(p: Column) -> Column:
        hh = F.upper(F.substring(p, 1, 2))
        code = F.conv(hh, 16, 10).cast("int")
        is_hex = p.rlike("^[0-9A-Fa-f]{2}")
        unreserved = (
            code.between(48, 57)
            | code.between(65, 90)
            | code.between(97, 122)
            | code.isin(45, 46, 95, 126)
        )
        tail = F.substring(p, 3, 1 << 30)
        return (
            F.when(~is_hex, F.concat(F.lit("%"), p))
            .when(unreserved, F.concat(F.char(code), tail))
            .otherwise(F.concat(F.lit("%"), hh, tail))
        )

    return F.concat(
        F.element_at(parts, 1), F.array_join(F.transform(rest, _fix), "")
    )
