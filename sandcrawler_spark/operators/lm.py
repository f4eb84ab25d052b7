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


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM (Brants et al., EMNLP'07 — "Large Language
# Models in Machine Translation"): the web-scale scoring function that
# replaced smoothed Kneser-Ney at Google-corpus sizes precisely because
# it needs NO normalization pass — relative frequencies with a constant
# backoff multiplier, computable with count tables alone. That makes it
# the natural trigram upgrade of this module's bigram filter: same two-
# relation training shape, one more count table, same micro-nat
# determinism discipline.
# ---------------------------------------------------------------------------

SB_ALPHA = 0.4


def _trigrams_col(text_col):
    toks = tokens_col(F.lower(text_col))
    n = F.size(toks)
    # zip_with over eagerly-evaluated slice operands (the inner zip_with
    # is an array OPERAND of the outer, evaluated once — not a lambda
    # body, so no Catalyst inline blow-up; cf. _bigrams_col note)
    ab = F.zip_with(
        F.slice(toks, 1, n - 2),
        F.slice(toks, 2, n - 2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(
        n >= 3,
        F.zip_with(ab, F.slice(toks, 3, n - 2), lambda xy, z: F.concat(xy, F.lit(" "), z)),
    ).otherwise(F.array().cast("array<string>"))


def train_stupid_backoff(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(trigram_counts, bigram_counts, unigram_counts, totals):
    trigram_counts (w1, w2, w3, c123); bigram_counts (w1, w2, c12);
    unigram_counts (w1, c1); totals single row (n_tokens). Three
    independent count shuffles, each with map-side partial agg and
    vocabulary-bounded output; counts SUM across shards so the tables
    merge like any other sketch."""
    bi, uni, _ = train_bigram_lm(df, text_col)
    tri = (
        df.select(F.explode(_trigrams_col(F.col(text_col))).alias("tg"))
        .groupBy("tg")
        .agg(F.count("*").cast("long").alias("c123"))
        .select(
            F.split_part(F.col("tg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("tg"), F.lit(" "), F.lit(2)).alias("w2"),
            F.split_part(F.col("tg"), F.lit(" "), F.lit(3)).alias("w3"),
            "c123",
        )
    )
    totals = uni.agg(F.sum("c1").cast("long").alias("n_tokens"))
    return tri, bi, uni, totals


def stupid_backoff_scores(
    df: DataFrame,
    trigram_counts: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = SB_ALPHA,
) -> DataFrame:
    """Per-document Stupid Backoff trigram score in integer micro-nats:
    S(w3|w1,w2) = c123/c12 if the trigram was seen, else
    alpha * c23/c2 if the (w2,w3) bigram was seen, else
    alpha^2 * c3/N, with an OOV floor of alpha^2 * 1/N (count-1 in the
    unigram back-off — S is a score, not a probability, so the floor
    is legitimate; Brants et al. section 3).

    Determinism: each branch is integer/integer double division
    (exactly rounded) optionally times a shared double constant, then
    ONE ln() micro-rounded to a long before the per-doc integer SUM —
    the lm_score_docs discipline, branch for branch replayable in the
    DuckDB twin.

    Scale shape: the doc trigram stream joins each count table on its
    natural key (five shuffle-keyed equi-joins; AQE broadcasts small
    vocabularies), then one groupBy(doc). Nothing driver-side, no
    windows.

    Returns (id_col, n_trigrams, sb_micronat); docs with < 3 tokens
    score 0 over 0 trigrams.
    """
    a2 = alpha * alpha
    stream = df.select(
        F.col(id_col).alias("_id"), F.explode(_trigrams_col(F.col(text_col))).alias("tg")
    ).select(
        "_id",
        F.split_part(F.col("tg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("tg"), F.lit(" "), F.lit(2)).alias("w2"),
        F.split_part(F.col("tg"), F.lit(" "), F.lit(3)).alias("w3"),
    )
    joined = (
        stream.join(trigram_counts, on=["w1", "w2", "w3"], how="left")
        .join(bigram_counts, on=["w1", "w2"], how="left")
        .join(
            bigram_counts.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c12").alias("c23")
            ),
            on=["w2", "w3"],
            how="left",
        )
        .join(
            unigram_counts.select(F.col("w1").alias("w2"), F.col("c1").alias("c2")),
            on="w2",
            how="left",
        )
        .join(
            unigram_counts.select(F.col("w1").alias("w3"), F.col("c1").alias("c3")),
            on="w3",
            how="left",
        )
        .crossJoin(F.broadcast(totals))
    )
    p = (
        F.when(F.col("c123").isNotNull(), F.col("c123") / F.col("c12"))
        .when(F.col("c23").isNotNull(), F.lit(alpha) * (F.col("c23") / F.col("c2")))
        .when(F.col("c3").isNotNull(), F.lit(a2) * (F.col("c3") / F.col("n_tokens")))
        .otherwise(F.lit(a2) * (F.lit(1.0) / F.col("n_tokens")))
    )
    per_tg = joined.select(
        "_id", F.round(F.log(p) * NAT_SCALE).cast("long").alias("_micro")
    )
    agg = per_tg.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum("_micro").cast("long").alias("sb_micronat"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("sb_micronat", F.lit(0)).alias("sb_micronat"),
        )
    )


def sb_oracle_sql(docs_sql: str, alpha: float = SB_ALPHA) -> str:
    """DuckDB twin of train_stupid_backoff + stupid_backoff_scores on
    the same (doc_id, text) relation: identical tokenization, branch
    order, double arithmetic (CAST-to-DOUBLE divisions times the same
    parsed double constants), micro-nat rounding, integer SUM."""
    a2 = alpha * alpha
    return f"""
WITH _sb_docs AS (SELECT doc_id, text FROM ({docs_sql})),
_sb_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _sb_docs
),
_sb_words AS (SELECT UNNEST(toks) AS w FROM _sb_tok),
_sb_uni AS (
  SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM _sb_words GROUP BY w
),
_sb_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM _sb_words),
_sb_pos2 AS (
  SELECT doc_id, UNNEST(range(1, len(toks))) AS i, toks
  FROM _sb_tok WHERE len(toks) >= 2
),
_sb_bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM _sb_pos2 GROUP BY 1, 2
),
_sb_pos3 AS (
  SELECT doc_id, UNNEST(range(1, len(toks) - 1)) AS i, toks
  FROM _sb_tok WHERE len(toks) >= 3
),
_sb_stream AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
  FROM _sb_pos3
),
_sb_tri AS (
  SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
  FROM _sb_stream GROUP BY 1, 2, 3
),
_sb_scored AS (
  SELECT s.doc_id,
         CAST(round(ln(
           CASE
             WHEN t.c123 IS NOT NULL
               THEN CAST(t.c123 AS DOUBLE) / CAST(bc.c12 AS DOUBLE)
             WHEN b23.c12 IS NOT NULL
               THEN {alpha!r} * (CAST(b23.c12 AS DOUBLE) / CAST(u2.c1 AS DOUBLE))
             WHEN u3.c1 IS NOT NULL
               THEN {a2!r} * (CAST(u3.c1 AS DOUBLE) / CAST(n.n_tokens AS DOUBLE))
             ELSE {a2!r} * (1.0 / CAST(n.n_tokens AS DOUBLE))
           END) * {NAT_SCALE}) AS BIGINT) AS micro
  FROM _sb_stream s
  LEFT JOIN _sb_tri t ON t.w1 = s.w1 AND t.w2 = s.w2 AND t.w3 = s.w3
  LEFT JOIN _sb_bi bc ON bc.w1 = s.w1 AND bc.w2 = s.w2
  LEFT JOIN _sb_bi b23 ON b23.w1 = s.w2 AND b23.w2 = s.w3
  LEFT JOIN _sb_uni u2 ON u2.w1 = s.w2
  LEFT JOIN _sb_uni u3 ON u3.w1 = s.w3
  CROSS JOIN _sb_tot n
),
_sb_agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         CAST(SUM(micro) AS BIGINT) AS sb_micronat
  FROM _sb_scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_trigrams, 0) AS n_trigrams,
       COALESCE(a.sb_micronat, 0) AS sb_micronat
FROM _sb_docs d LEFT JOIN _sb_agg a ON d.doc_id = a.doc_id
""".strip()


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
# 1999 section 4's interpolated form with the count-estimated discount
# D = N1 / (N1 + 2*N2)): the strongest classical smoother, and the one
# Stupid Backoff was benchmarked AGAINST — having both lets a corpus
# pipeline A/B the perplexity filter the way the literature does. The
# distinguishing idea is the CONTINUATION count: the lower-order
# distribution scores a word by how many distinct contexts it follows
# (N1+(.w)), not how often it occurs — "Francisco" is frequent but only
# ever follows "San", so KN correctly scores it poorly in fresh
# contexts.
#
# P_KN(w2|w1) = ( max(c12 - D, 0) * T  +  D * N1+(w1.) * N1+(.w2) )
#               / ( c_ctx(w1) * T )
# with c_ctx(w1) = total bigrams from w1, T = distinct bigram types —
# the standard interpolated formula with P_cont(w2) = N1+(.w2)/T folded
# into a single ratio so both engines evaluate the same two exactly-
# rounded IEEE products, one addition, one division, one ln().
# ---------------------------------------------------------------------------


def train_kneser_ney(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, ctx_stats, cont_stats, global_stats) — the KN
    sufficient statistics as relations. bigram_counts: (w1, w2, c12);
    ctx_stats: (w1, c_ctx, n1p_fwd) — outgoing total + distinct
    continuation types per context; cont_stats: (w2, n1p_rev) —
    distinct left-contexts per word; global_stats: one row
    (t_types, n1, n2, discount). All mergeable counts except the
    derived discount (recompute after a merge).

    Scale shape: one bigram-keyed shuffle with map-side combine, then
    two vocabulary-bounded aggregations of the count table itself —
    training cost is O(distinct bigrams), never O(corpus) past the
    first pass."""
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
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c_ctx"),
        F.count("*").cast("long").alias("n1p_fwd"),
    )
    cont = bi.groupBy("w2").agg(F.count("*").cast("long").alias("n1p_rev"))
    glob = bi.agg(
        F.count("*").cast("long").alias("t_types"),
        F.sum((F.col("c12") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c12") == 2).cast("long")).alias("n2"),
    ).select(
        "t_types",
        "n1",
        "n2",
        F.when(
            (F.col("n1") + 2 * F.col("n2")) > 0,
            F.col("n1") / (F.col("n1") + 2 * F.col("n2")),
        )
        .otherwise(F.lit(0.5))
        .alias("discount"),
    )
    return bi, ctx, cont, glob


def kn_score_docs(
    df: DataFrame,
    bigram_counts: DataFrame,
    ctx_stats: DataFrame,
    cont_stats: DataFrame,
    global_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document interpolated-KN bigram log-probability in integer
    micro-nats: (id_col, n_bigrams, kn_micronat). Self-scoring (train
    corpus == score corpus, the perplexity-filter setting) guarantees
    every scored bigram hits all three count tables, so the single
    folded formula is total; held-out scoring would need a back-off
    branch (coalesce defaults below keep it merely finite, not KN).

    Scale shape: three natural-key equi-joins (AQE broadcasts the
    vocabulary-sized sides) + one groupBy(doc) — lm_score_docs'
    shape with one more count relation."""
    stream = df.select(
        F.col(id_col).alias("_id"), F.explode(_bigrams_col(F.col(text_col))).alias("bg")
    ).select(
        "_id",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    joined = (
        stream.join(bigram_counts, on=["w1", "w2"], how="left")
        .join(ctx_stats, on="w1", how="left")
        .join(cont_stats, on="w2", how="left")
        .crossJoin(F.broadcast(global_stats))
    )
    c12 = F.coalesce(F.col("c12"), F.lit(0)).cast("double")
    num = (
        F.greatest(c12 - F.col("discount"), F.lit(0.0)) * F.col("t_types")
        + F.col("discount") * F.coalesce(F.col("n1p_fwd"), F.lit(1)) * F.coalesce(F.col("n1p_rev"), F.lit(1))
    )
    den = F.coalesce(F.col("c_ctx"), F.lit(1)).cast("double") * F.col("t_types")
    per_bg = joined.select(
        "_id", F.round(F.log(num / den) * NAT_SCALE).cast("long").alias("_micro")
    )
    agg = per_bg.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("_micro").cast("long").alias("kn_micronat"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("kn_micronat", F.lit(0)).alias("kn_micronat"),
        )
    )


def kn_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of train_kneser_ney + kn_score_docs on the same
    (doc_id, text) relation: identical tokenization, the same folded
    single-ratio formula (two IEEE products, one addition, one
    division, one ln), micro-nat rounding, integer SUM."""
    return f"""
WITH _kn_docs AS (SELECT doc_id, text FROM ({docs_sql})),
_kn_tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM _kn_docs
),
_kn_pos AS (
  SELECT doc_id, UNNEST(range(1, len(toks))) AS i, toks
  FROM _kn_tok WHERE len(toks) >= 2
),
_kn_stream AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM _kn_pos),
_kn_bi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM _kn_stream GROUP BY w1, w2
),
_kn_ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c_ctx, CAST(COUNT(*) AS BIGINT) AS n1p_fwd
  FROM _kn_bi GROUP BY w1
),
_kn_cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_rev FROM _kn_bi GROUP BY w2
),
_kn_glob AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t_types,
         CAST(SUM(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM _kn_bi
),
_kn_disc AS (
  SELECT t_types,
         CASE WHEN n1 + 2 * n2 > 0
              THEN CAST(n1 AS DOUBLE) / CAST(n1 + 2 * n2 AS DOUBLE)
              ELSE 0.5 END AS discount
  FROM _kn_glob
),
_kn_scored AS (
  SELECT s.doc_id,
         CAST(round(ln(
           (GREATEST(CAST(b.c12 AS DOUBLE) - g.discount, 0.0) * g.t_types
            + g.discount * x.n1p_fwd * r.n1p_rev)
           / (CAST(x.c_ctx AS DOUBLE) * g.t_types)
         ) * {NAT_SCALE}) AS BIGINT) AS micro
  FROM _kn_stream s
  JOIN _kn_bi b ON b.w1 = s.w1 AND b.w2 = s.w2
  JOIN _kn_ctx x ON x.w1 = s.w1
  JOIN _kn_cont r ON r.w2 = s.w2
  CROSS JOIN _kn_disc g
),
_kn_agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(micro) AS BIGINT) AS kn_micronat
  FROM _kn_scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.kn_micronat, 0) AS kn_micronat
FROM _kn_docs d LEFT JOIN _kn_agg a ON d.doc_id = a.doc_id
""".strip()
