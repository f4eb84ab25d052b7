"""Linear (Naive-Bayes) document-quality classifier — the
"quality classifier" stage of the public web-corpus recipes: CCNet
trains a fastText linear model against Wikipedia (Wenzek et al.
2020), GPT-3 a logistic-regression classifier against WebText
(Brown et al. 2020 App. A). Both reduce to a per-token weight table
plus a per-document weighted sum — which is exactly what a
multinomial Naive-Bayes log-odds model is, and NB has closed-form
training (count ratios), so the whole train step is expressible as
Catalyst aggregations with no gradient loop.

Train (train_nb_classifier): one shuffle keyed by token with
map-side partial aggregation -> (token, c_pos, c_neg); tokens below
min_count are dropped, bounding the weight table to the effective
vocabulary (the same discipline as operators/lm.py's count tables).
Per-token weight = ln((c_pos+1)/(n_pos+V)) - ln((c_neg+1)/(n_neg+V)),
add-1 smoothing over the KEPT vocabulary (totals are computed after
the min_count cut so both engines see identical denominators).

Score (nb_score_docs): explode doc tokens, inner-join the broadcast
weight table, one per-doc integer SUM. The weight table is
vocab-sized — a few million rows at 100 TB corpus scale — so the join
never shuffles the token stream; AQE broadcasts it (and the query
wraps it in an explicit F.broadcast for determinism).

Determinism: weights are rounded to integer MICRO-nats before the
per-doc sum (round(ln-diff * 1e6) as long) — integer aggregation is
partition-order independent and replays exactly in the DuckDB twin
(nb_oracle_sql). The class-prior term ln(n_pos_docs/n_neg_docs) is a
constant shift shared by every document; it is omitted so scores are
pure token evidence (ranking unchanged).

Reference tie-in: the reference gates ingest on GROBID quality +
Crossref match score (scalding ScoreJob.scala, python/sandcrawler/
ingest.py); this operator is the corpus-scale analog for raw webtext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col

NAT_SCALE = 1_000_000


def train_nb_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Closed-form NB training. label_col must be 0/1 (int-castable).
    Returns the weight relation (w, weight_micronat) — persistable,
    broadcastable, and mergeable across shards by re-summing the
    underlying counts (retrain is two cheap aggregations, so shards
    merge at the count level, not the weight level)."""
    toks = df.select(
        F.col(label_col).cast("int").alias("_y"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w"),
    )
    counts = (
        toks.groupBy("w")
        .agg(
            F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).cast("long").alias("c_pos"),
            F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).cast("long").alias("c_neg"),
        )
        .filter((F.col("c_pos") + F.col("c_neg")) >= min_count)
    )
    totals = counts.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
        F.count("*").cast("long").alias("v"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "w",
        F.round(
            (
                F.log((F.col("c_pos") + 1) / (F.col("n_pos") + F.col("v")))
                - F.log((F.col("c_neg") + 1) / (F.col("n_neg") + F.col("v")))
            )
            * NAT_SCALE
        )
        .cast("long")
        .alias("weight_micronat"),
    )


def nb_score_docs(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document NB log-odds in integer micro-nats. Returns
    (id_col, n_scored_tokens, logodds_micronat) — one row per input
    doc; out-of-vocabulary tokens contribute nothing (inner join), a
    doc with no in-vocab tokens scores 0 over 0 tokens."""
    stream = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w"),
    )
    scored = stream.join(F.broadcast(weights), on="w", how="inner")
    agg = scored.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_scored_tokens"),
        F.sum("weight_micronat").cast("long").alias("logodds_micronat"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_scored_tokens", F.lit(0)).alias("n_scored_tokens"),
            F.coalesce("logodds_micronat", F.lit(0)).alias("logodds_micronat"),
        )
    )


def nb_oracle_sql(docs_sql: str, label_expr: str, min_count: int = 2) -> str:
    """DuckDB twin: trains on and scores the same (doc_id, text)
    relation with label label_expr — identical tokenization,
    smoothing, micro-nat rounding, integer SUM."""
    return f"""
WITH _nb_docs AS (SELECT doc_id, text, CAST(({label_expr}) AS INT) AS y FROM ({docs_sql})),
_nb_tok AS (
  SELECT doc_id, y,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _nb_docs
),
_nb_stream AS (SELECT doc_id, y, UNNEST(toks) AS w FROM _nb_tok),
_nb_counts AS (
  SELECT w,
         CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
  FROM _nb_stream GROUP BY w
  HAVING SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END)
       + SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) >= {min_count}
),
_nb_tot AS (
  SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos, CAST(SUM(c_neg) AS BIGINT) AS n_neg,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM _nb_counts
),
_nb_w AS (
  SELECT w, CAST(round((ln((c_pos + 1) / (n_pos + v)) - ln((c_neg + 1) / (n_neg + v)))
                       * {NAT_SCALE}) AS BIGINT) AS weight_micronat
  FROM _nb_counts CROSS JOIN _nb_tot
),
_nb_agg AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored_tokens,
         CAST(SUM(w.weight_micronat) AS BIGINT) AS logodds_micronat
  FROM _nb_stream s JOIN _nb_w w USING (w)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_scored_tokens, 0) AS n_scored_tokens,
       COALESCE(a.logodds_micronat, 0) AS logodds_micronat
FROM _nb_docs d LEFT JOIN _nb_agg a ON d.doc_id = a.doc_id
""".strip()
