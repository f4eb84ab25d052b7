"""N-gram language-model quality scoring: train a bigram LM on the
corpus, score every document's log-probability under it — the
perplexity-filter stage of a web-text training pipeline (CCNet-style:
documents whose text is improbable under an in-domain LM are boiler-
plate, menus, gibberish, or the wrong language; Wenzek et al. 2020).

Scale shape: training is two shuffles (bigram counts keyed by the
pair, unigram counts keyed by the word — both with map-side partial
aggregation and vocabulary-bounded output). Scoring joins the
document bigram stream against the count tables on their natural
keys; AQE broadcasts the unigram side when the vocabulary is small.
Nothing driver-side, nothing quadratic.

Determinism: per-bigram log-probabilities are rounded to integer
MICRO-nats (round(ln(p) * 1e6) as long) before the per-doc SUM —
integer aggregation is partition-order independent and replays
exactly in the DuckDB oracle. Probabilities are add-k-smoothed
ratios of integers ((c12 + k) / (c1 + k*V)): the division is an
exactly-rounded IEEE op on identical inputs in both engines; ln() is
the single libm call, which micro-rounding makes safe.

Bigrams are built with zip_with over two slices of the token array
(NOT a nested higher-order lambda over a transform result — Catalyst
inlines those and re-evaluates per element, the O(n^2) trap
documented in textstats.winnow_fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col

NAT_SCALE = 1_000_000


def _bigrams_col(text_col):
    toks = tokens_col(F.lower(text_col))
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, unigram_counts, vocab_stats): the LM's
    sufficient statistics as relations — persistable, mergeable
    (counts SUM across shards), and joinable at scoring time.
    bigram_counts: (w1, w2, c12); unigram_counts: (w1, c1);
    vocab_stats: single row (vocab_size)."""
    toks = df.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("w"))
    uni = toks.groupBy(F.col("w").alias("w1")).agg(F.count("*").cast("long").alias("c1"))
    bi = (
        df.select(F.explode(_bigrams_col(F.col(text_col))).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").cast("long").alias("c12"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "c12",
        )
    )
    vocab = uni.agg(F.count("*").cast("long").alias("vocab_size"))
    return bi, uni, vocab


def lm_score_docs(
    df: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = 1.0,
) -> DataFrame:
    """Per-document add-k-smoothed bigram log-probability in integer
    micro-nats. Returns (id_col, n_bigrams, logprob_micronat) — one
    row per input doc; docs with < 2 tokens score 0 over 0 bigrams.
    Average-per-bigram (and so perplexity) is derivable downstream;
    the integers are the engine-portable ground truth."""
    stream = df.select(
        F.col(id_col).alias("_id"), F.explode(_bigrams_col(F.col(text_col))).alias("bg")
    ).select(
        "_id",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    joined = (
        stream.join(bigram_counts, on=["w1", "w2"], how="left")
        .join(unigram_counts, on="w1", how="left")
        .crossJoin(F.broadcast(vocab_stats))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k_smooth)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k_smooth) * F.col("vocab_size")
    )
    per_bg = joined.select(
        "_id", F.round(F.log(p) * NAT_SCALE).cast("long").alias("_micro")
    )
    agg = per_bg.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("_micro").cast("long").alias("logprob_micronat"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("logprob_micronat", F.lit(0)).alias("logprob_micronat"),
        )
    )


def lm_oracle_sql(docs_sql: str, k_smooth: float = 1.0) -> str:
    """DuckDB twin: trains on and scores the same docs_sql relation
    (doc_id, text) — identical tokenization, smoothing, micro-nat
    rounding, integer SUM."""
    return f"""
WITH _lm_docs AS (SELECT doc_id, text FROM ({docs_sql})),
_lm_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _lm_docs
),
_lm_words AS (SELECT UNNEST(toks) AS w FROM _lm_tok),
_lm_uni AS (
  SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM _lm_words GROUP BY w
),
_lm_vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size FROM _lm_uni),
_lm_pos AS (
  SELECT doc_id, UNNEST(range(1, len(toks))) AS i, toks
  FROM _lm_tok WHERE len(toks) >= 2
),
_lm_stream AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM _lm_pos),
_lm_bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM _lm_stream GROUP BY w1, w2
),
_lm_scored AS (
  SELECT s.doc_id,
         CAST(round(ln((b.c12 + {k_smooth}) / (u.c1 + {k_smooth} * v.vocab_size))
                    * {NAT_SCALE}) AS BIGINT) AS micro
  FROM _lm_stream s
  JOIN _lm_bi b USING (w1, w2)
  JOIN _lm_uni u USING (w1)
  CROSS JOIN _lm_vocab v
),
_lm_agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(micro) AS BIGINT) AS logprob_micronat
  FROM _lm_scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.logprob_micronat, 0) AS logprob_micronat
FROM _lm_docs d LEFT JOIN _lm_agg a ON d.doc_id = a.doc_id
""".strip()
