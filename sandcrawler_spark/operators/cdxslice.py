"""CDX slice jobs: variant content filters + deterministic crawl order.

Role parity (the reference's Pig slice family):
  - F2  filter-cdx-paper-pdfs.pig (heuristic paper-URL regex)
  - F4  filter-cdx-ps.pig (postscript mimetype),
        filter-cdx-tarball.pig (archive mimetype + .tar.gz URL),
        filter-cdx-source-code-crude.pig (text mimetype + source suffix)
  - A4  DISTINCT-by-sha1 TOP(1) representative row
  - W2  `ORDER cdx BY surt, timestamp PARALLEL 50` — the deterministic
        global crawl order every slice ends with

Spark shapes: the filters are pure Catalyst predicates (pushed to the
parquet scan); the per-hash representative is a min(struct) aggregate
on the hash (map-side partial combine — immune to one viral content
hash with millions of captures, see distinct_by_hash); the global
order is repartitionByRange on the sort key + sortWithinPartitions —
Spark's distributed total sort (range exchange ≈ Pig's PARALLEL 50
ordered store), files then read back in partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# variant -> (mimetype regex, url regex or None); filter-cdx-*.pig
SLICE_VARIANTS: dict[str, tuple[str, str | None]] = {
    "ps": (r".*postscript.*", None),
    "tarball": (r".*(octet|gzip|gtar|tgz).*", r"(?i).*\.tar\.gz.*"),
    "source": (r".*text.*", r".*\.(c|h|py|java)$"),
    "pdf": (r".*pdf.*", None),
}


def crawl_order_dump(df: DataFrame, sort_cols: list[str], n_partitions: int | None = None) -> DataFrame:
    """W2: deterministic GLOBAL ordering at scale — range-partition on
    the sort key then sort within partitions; partition i's rows all
    precede partition i+1's. A plain orderBy compiles to the same
    exchange; this form pins the partition count like PARALLEL 50."""
    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(n_partitions, *cols) if n_partitions else df.repartitionByRange(*cols)
    return out.sortWithinPartitions(*cols)


def distinct_by_hash(df: DataFrame, hash_col: str = "sha1hex", order_cols: list[str] | None = None) -> DataFrame:
    """A4: one representative capture per content hash (GROUP BY sha1
    + TOP(1)); deterministic representative via the order columns
    (ties beyond them break on the remaining columns, so the pick is
    total-order deterministic).

    min(struct(order..., rest...)) per hash, NOT a rank-1 window: the
    hash KEYS are uniform but one hash's GROUP is every capture of
    that content — a viral page mirrored 10^6 times is one window
    buffer in one task, while the aggregate form partial-combines
    map-side (same skew discipline as paragraph/span dedupe).
    Columns must be orderable (strings/numerics — true for CDX rows)."""
    order = list(order_cols or ["surt", "datetime"])
    rest = [c for c in df.columns if c not in order and c != hash_col]
    rep = (
        df.groupBy(hash_col)
        .agg(F.min(F.struct(*order, *rest)).alias("_f"))
        .select(hash_col, "_f.*")
    )
    return rep.select(*df.columns)


def cdx_variant_slice(
    cdx: DataFrame,
    variant: str,
    surt_col: str = "surt",
    dt_col: str = "datetime",
    status_col: str = "status_code",
    mime_col: str = "mimetype",
    hash_col: str = "sha1hex",
    n_partitions: int | None = None,
) -> DataFrame:
    """One Pig slice: status-200 + variant mimetype/URL filters ->
    distinct-by-hash -> global (surt, datetime) order."""
    if variant not in SLICE_VARIANTS:
        raise ValueError(f"unknown slice variant {variant!r}; one of {sorted(SLICE_VARIANTS)}")
    mime_re, url_re = SLICE_VARIANTS[variant]
    out = cdx.filter((F.col(status_col) == 200) & F.col(mime_col).rlike(mime_re))
    if url_re:
        out = out.filter(F.col(surt_col).rlike(url_re))
    out = distinct_by_hash(out, hash_col, [surt_col, dt_col])
    return crawl_order_dump(out, [surt_col, dt_col], n_partitions)


def collapse_captures(
    df: DataFrame,
    digits: int = 8,
    url_col: str = "url",
    dt_col: str = "datetime",
    payload_cols: tuple[str, ...] = ("status_code", "mimetype"),
) -> DataFrame:
    """CDX-server 'collapse=timestamp:N' semantics (the pywb/Wayback
    query feature the reference's CDX API reads through,
    `python/sandcrawler/ia.py` CdxApiClient): bucket a URL's capture
    history by the first N digits of the 14-digit CDX datetime
    (N=8 -> one row per URL-day) and keep the FIRST capture of each
    bucket, with the collapsed-away count carried as n_collapsed —
    the dedup view replay UIs and recrawl-rate estimators page
    through.

    Scale shape: ONE groupBy((url, bucket)) with min(struct) + count —
    a plain aggregate with map-side partials; no window over per-URL
    history, so a hot URL with millions of captures costs its bucket
    count, not a single-task sort. (url, datetime) must be unique
    (CDX invariant) — min(struct(datetime, payload...)) is then the
    deterministic first row of the bucket."""
    bucket = F.substring(F.col(dt_col), 1, int(digits))
    first = F.min(F.struct(F.col(dt_col), *[F.col(c) for c in payload_cols]))
    agg = (
        df.groupBy(F.col(url_col).alias("url"), bucket.alias("bucket"))
        .agg(first.alias("_f"), F.count("*").cast("long").alias("n_collapsed"))
    )
    return agg.select(
        "url",
        "bucket",
        F.col(f"_f.{dt_col}").alias(dt_col),
        *[F.col(f"_f.{c}").alias(c) for c in payload_cols],
        "n_collapsed",
    )
