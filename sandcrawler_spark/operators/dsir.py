"""DSIR-style data selection: importance weights from hashed-n-gram
bag models (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"). A small in-domain TARGET sample and the RAW
web corpus each induce a multinomial over hashed token buckets; every
raw document is scored by its log importance ratio

    log w(x) = sum_tokens [ ln p_target(bucket(tok)) - ln p_raw(bucket(tok)) ]

and selection keeps the highest-ratio documents (the resampling step
is a deterministic weight-ordered rank downstream — see
sampling.py for the md5-uniform keep machinery DSIR's Gumbel trick
would plug into).

Reference anchor: the reference's quality gating is a per-document
scorecard (GROBID quality filter, python/sandcrawler/ingest.py status
taxonomy); DSIR is the corpus-level generalization a 100 TB training
pipeline needs — select TOWARD a target distribution rather than
filtering on per-doc heuristics alone.

Scale shape (100 TB story):
  - training each hash-LM is ONE shuffle keyed by bucket id with
    map-side partial aggregation, and the result is at most
    `n_buckets` rows (constant, e.g. 2^14) — broadcastable forever;
  - scoring is explode -> per-(doc,bucket) count (shuffle keyed by
    doc — the same width as the corpus) -> broadcast-join the two
    bucket tables -> integer sum per doc. No windows, no skew: bucket
    tables are dense and tiny, the per-doc aggregation key is unique
    per document.

Determinism / oracle exactness: bucket ids are md5-derived (identical
hex in every engine); per-bucket log-ratios are rounded once to
integer MICRO-nats and multiplied by integer counts, so the per-doc
SUM is partition-order independent and replays bit-for-bit in DuckDB
(same discipline as operators/lm.py, operators/sketches.py).
Smoothing is add-1 over the bucket vocabulary: p(b) = (c_b + 1) /
(n_tokens + n_buckets) — a ratio of integers, exact-rounded IEEE
division, single libm ln() call, then micro-rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col

NAT_SCALE = 1_000_000
DEFAULT_BUCKETS = 4096


def hashed_bucket_col(tok, n_buckets: int = DEFAULT_BUCKETS):
    """Feature-hash a token to [0, n_buckets): first 15 md5 hex chars
    parsed as an integer (fits signed 64), mod the bucket count.
    Pure codegen (conv parses JVM-side); DuckDB replays it as
    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % n."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % n_buckets
    )


def train_hash_lm(
    df: DataFrame, text_col: str = "text", n_buckets: int = DEFAULT_BUCKETS
) -> tuple[DataFrame, DataFrame]:
    """(bucket_counts, totals) for a hashed-unigram bag model.
    bucket_counts: (bucket, c) — at most n_buckets rows; totals: one
    row (n_tokens). Mergeable across shards (counts SUM)."""
    toks = df.select(
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("_tok")
    ).select(hashed_bucket_col(F.col("_tok"), n_buckets).alias("bucket"))
    counts = toks.groupBy("bucket").agg(F.count("*").cast("long").alias("c"))
    totals = counts.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_tokens"))
    return counts, totals


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document log importance ratio of `raw` docs toward the
    `target` distribution, in integer micro-nats. Returns
    (id_col, n_tokens, logratio_micronat) — one row per raw doc;
    empty docs score 0 over 0 tokens. Higher = more target-like."""
    t_counts, t_totals = train_hash_lm(target, text_col, n_buckets)
    r_counts, r_totals = train_hash_lm(raw, text_col, n_buckets)

    # dense per-bucket micro-nat ratio table: <= n_buckets rows.
    # Buckets unseen in either model still get their smoothed mass —
    # the outer join keeps every bucket that occurs in EITHER count
    # table; buckets in neither can't occur in a document either.
    ratios = (
        t_counts.withColumnRenamed("c", "ct")
        .join(r_counts.withColumnRenamed("c", "cr"), on="bucket", how="full_outer")
        .crossJoin(F.broadcast(t_totals.withColumnRenamed("n_tokens", "nt")))
        .crossJoin(F.broadcast(r_totals.withColumnRenamed("n_tokens", "nr")))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1))
                        / (F.col("nt") + F.lit(n_buckets))
                    )
                    - F.log(
                        (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1))
                        / (F.col("nr") + F.lit(n_buckets))
                    )
                )
                * NAT_SCALE
            )
            .cast("long")
            .alias("micro"),
        )
    )

    doc_buckets = (
        raw.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("_tok"),
        )
        .select("_id", hashed_bucket_col(F.col("_tok"), n_buckets).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    scored = (
        doc_buckets.join(F.broadcast(ratios), on="bucket", how="inner")
        .groupBy("_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("micro")).cast("long").alias("logratio_micronat"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(scored, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("logratio_micronat", F.lit(0)).alias("logratio_micronat"),
        )
    )


def dsir_oracle_sql(
    raw_sql: str, target_sql: str, n_buckets: int = DEFAULT_BUCKETS
) -> str:
    """DuckDB twin: identical tokenization, md5 bucket hash, add-1
    smoothing, micro-nat rounding, integer per-doc SUM."""
    return f"""
WITH _ds_raw AS (SELECT doc_id, text FROM ({raw_sql})),
_ds_tgt AS (SELECT doc_id, text FROM ({target_sql})),
_ds_rtok AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(UNNEST(list_filter(
             string_split_regex(lower(text), '\\s+'), x -> x <> ''))), 1, 15)
              AS BIGINT) % {n_buckets} AS bucket
  FROM _ds_raw
),
_ds_ttok AS (
  SELECT CAST('0x' || substr(md5(UNNEST(list_filter(
             string_split_regex(lower(text), '\\s+'), x -> x <> ''))), 1, 15)
              AS BIGINT) % {n_buckets} AS bucket
  FROM _ds_tgt
),
_ds_tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM _ds_ttok GROUP BY bucket),
_ds_rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM _ds_rtok GROUP BY bucket),
_ds_tn AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS nt FROM _ds_tc),
_ds_rn AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS nr FROM _ds_rc),
_ds_ratio AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
         CAST(round((ln((COALESCE(t.ct, 0) + 1) / (tn.nt + {n_buckets}))
                     - ln((COALESCE(r.cr, 0) + 1) / (rn.nr + {n_buckets})))
                    * {NAT_SCALE}) AS BIGINT) AS micro
  FROM _ds_tc t FULL OUTER JOIN _ds_rc r ON t.bucket = r.bucket
  CROSS JOIN _ds_tn tn CROSS JOIN _ds_rn rn
),
_ds_db AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM _ds_rtok GROUP BY doc_id, bucket
),
_ds_scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(d.cnt * x.micro) AS BIGINT) AS logratio_micronat
  FROM _ds_db d JOIN _ds_ratio x USING (bucket) GROUP BY d.doc_id
)
SELECT r.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.logratio_micronat, 0) AS logratio_micronat
FROM _ds_raw r LEFT JOIN _ds_scored s ON r.doc_id = s.doc_id
""".strip()
