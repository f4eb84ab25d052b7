"""HTTP caching semantics: Cache-Control / Expires / validator parsing
into a revalidation plan.

The reference re-fetches unconditionally and prices nothing (its
backoff is status-driven; persist paths keep no freshness state). A
crawler at 10^10 URLs must plan conditional GETs: parse the caching
headers once at ingest and store (ttl, stale-at, validator presence)
so the recrawl scheduler (operators/recrawl.py) can split
"still fresh — skip", "revalidate with If-None-Match/Modified-Since",
and "full refetch". Semantics follow RFC 9111: no-store beats
everything; no-cache / max-age=0+must-revalidate force revalidation;
max-age wins over Expires; with neither, the §4.2.2 heuristic
freshness (10% of age since Last-Modified) applies.

Scale shape: pure Catalyst regexp/epoch arithmetic — a projection on
the fetch log, zero shuffle, zero Python. Directive tokens are
matched with delimiter guards (``(^|[,\\s])no-cache([=,\\s]|$)``) so
`no-cache` never fires inside another token, and the same regex
source strings are shared with the DuckDB twin (RE2/Java-compatible
subset).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared regex sources (Java + RE2 compatible)
MAX_AGE_PAT = r"(^|[,\s])max-age=(\d+)"
_FLAG_PAT = r"(^|[,\s]){}([,\s]|$)"


def _flag(cc: Column, token: str) -> Column:
    return cc.rlike(_FLAG_PAT.format(token))


def cache_plan_cols(
    cc: Column,
    fetched_epoch: Column,
    expires_epoch: Column,
    etag: Column,
    last_modified_epoch: Column,
) -> list[Column]:
    """Revalidation-plan columns from caching headers.

    Inputs: cc = Cache-Control header string ('' if absent), epochs as
    BIGINT seconds (NULL if header absent). Returns [ttl_s, stale_epoch,
    cond_get, verdict] where verdict is one of no_store / revalidate /
    fresh / heuristic / no_policy.
    """
    no_store = _flag(cc, "no-store")
    no_cache = _flag(cc, "no-cache")
    must_reval = _flag(cc, "must-revalidate")
    max_age = F.regexp_extract(cc, MAX_AGE_PAT, 2)
    has_max_age = max_age != ""
    max_age_s = F.when(has_max_age, max_age.cast("long"))

    explicit_ttl = F.when(has_max_age, max_age_s).otherwise(
        F.when(
            expires_epoch.isNotNull(),
            F.greatest(expires_epoch - fetched_epoch, F.lit(0).cast("long")),
        )
    )
    heuristic_ttl = F.when(
        last_modified_epoch.isNotNull(),
        F.greatest(
            (fetched_epoch - last_modified_epoch) / F.lit(10), F.lit(0)
        ).cast("long"),
    )
    cond_get = etag.isNotNull() | last_modified_epoch.isNotNull()

    forced_reval = no_cache | (must_reval & (F.coalesce(explicit_ttl, F.lit(0)) <= 0))
    ttl = (
        F.when(no_store | forced_reval, F.lit(0).cast("long"))
        .when(explicit_ttl.isNotNull(), explicit_ttl)
        .when(heuristic_ttl.isNotNull(), heuristic_ttl)
        .otherwise(F.lit(0).cast("long"))
    )
    verdict = (
        F.when(no_store, F.lit("no_store"))
        .when(forced_reval, F.lit("revalidate"))
        .when(explicit_ttl.isNotNull(), F.lit("fresh"))
        .when(heuristic_ttl.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("no_policy"))
    )
    return [
        ttl.alias("ttl_s"),
        (fetched_epoch + ttl).cast("long").alias("stale_epoch"),
        cond_get.alias("cond_get"),
        verdict.alias("verdict"),
    ]
