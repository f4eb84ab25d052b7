"""Unigram-LM subword segmentation (SentencePiece-style, Kudo 2018):
corpus-derived piece vocabulary + per-word Viterbi decoding, with an
exact recursive-CTE twin in the oracle.

BPE (operators/bpe.py) covers the merge-table family; the unigram LM
is the other production tokenizer family — pieces are scored by
corpus likelihood and a word's segmentation is the min-cost path
through the piece lattice, decoded by dynamic programming. A corpus
engine needs it for the same jobs as BPE (token counting, vocabulary
coverage, drift) plus segmentation-quality comparisons between the
two.

Engine split, by design:
- vocabulary estimation is pure relational on BOTH engines: distinct
  words -> all substrings of length 1..max_piece_len (two explode
  levels) -> frequency-weighted counts -> integer micro-nat costs
  round(ln(total/freq)*1e6). Per-round work is vocab-sized, exactly
  the scale argument bpe_merges makes.
- Viterbi decoding is a genuine DP. Spark side: an Arrow-batched
  pandas UDF over the DISTINCT-WORD table with the (model-sized)
  vocab collected once — the production shape: tokenizer models ride
  the broadcast path, documents never leave the JVM until the final
  per-word join. Oracle side: the SAME DP as a recursive CTE whose
  state row carries the last max_piece_len best-costs and
  segmentations as list columns — machine-checked proof that the
  UDF's imperative loop equals the declared recurrence.

Tie-break contract (both engines): on equal path cost the LONGER
final piece wins (the CTE's CASE checks k descending; the UDF's
ascending-k loop overwrites on <=). Costs are integer micro-nats, so
ties are exact, not float-fuzzy.

Every character seen in the corpus is a length-1 piece by
construction, so every in-corpus word is segmentable — no unk path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col

UNI_SCALE = 1_000_000
MAX_PIECE_LEN = 4
MAX_WORD_LEN = 16


def corpus_words(
    df: DataFrame, text_col: str = "text", max_word_len: int = MAX_WORD_LEN
) -> DataFrame:
    """(word, freq) over the whitespace-lowered token stream, capped
    at max_word_len (longer tokens are URL-ish junk in web text)."""
    return (
        df.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def unigram_vocab(
    words: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cost_micro) — every substring of length 1..max_piece_len
    of every word, frequency-weighted by word occurrence count, cost =
    round(ln(total/freq) * 1e6) integer micro-nats."""
    starts = words.select(
        "word", "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("s"),
    )
    pieces = starts.select(
        "word", "freq", "s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.length("word") - F.col("s") + 1),
            )
        ).alias("k"),
    ).select(
        F.expr("substring(word, s, k)").alias("piece"), "freq"
    )
    counts = pieces.groupBy("piece").agg(F.sum("freq").cast("long").alias("pfreq"))
    total = counts.agg(F.sum("pfreq").cast("long").alias("ptotal"))
    return counts.crossJoin(F.broadcast(total)).select(
        "piece",
        F.round(
            F.log(F.col("ptotal").cast("double") / F.col("pfreq")) * UNI_SCALE
        ).cast("long").alias("cost_micro"),
    )


def viterbi_segment(
    words: DataFrame, vocab: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(word, n_pieces, cost_micro, seg) — min-cost segmentation of
    each word over the piece vocabulary. The vocab is collected once
    (model-sized by nature) and rides the Arrow closure into a
    vectorized pandas UDF; the word table is the small distinct-word
    relation, so per-row Python here is per-VOCAB-entry, not
    per-document."""
    vmap = {r["piece"]: r["cost_micro"] for r in vocab.collect()}

    @F.pandas_udf("n_pieces int, cost_micro long, seg string")
    def _seg(col: pd.Series) -> pd.DataFrame:
        out_n, out_c, out_s = [], [], []
        for w in col:
            L = len(w)
            best = [None] * (L + 1)
            seg = [None] * (L + 1)
            best[0], seg[0] = 0, []
            for j in range(1, L + 1):
                b, s = None, None
                for k in range(1, min(max_piece_len, j) + 1):
                    piece = w[j - k:j]
                    c = vmap.get(piece)
                    prev = best[j - k]
                    if c is None or prev is None:
                        continue
                    cand = prev + c
                    # <= : equal cost -> larger k (longer piece) wins,
                    # matching the oracle CTE's descending-k CASE
                    if b is None or cand <= b:
                        b, s = cand, seg[j - k] + [piece]
                best[j], seg[j] = b, s
            if best[L] is None:  # unreachable for in-corpus words
                out_n.append(None); out_c.append(None); out_s.append(None)
            else:
                out_n.append(len(seg[L]))
                out_c.append(best[L])
                out_s.append("|".join(seg[L]))
        return pd.DataFrame(
            {"n_pieces": out_n, "cost_micro": out_c, "seg": out_s}
        )

    return words.select(
        "word", _seg(F.col("word")).alias("_r")
    ).select("word", "_r.n_pieces", "_r.cost_micro", "_r.seg")


def unigram_oracle_sql(
    docs_sql: str,
    max_piece_len: int = MAX_PIECE_LEN,
    max_word_len: int = MAX_WORD_LEN,
) -> str:
    """Recursive-CTE twin: the state row per (word, j) carries the
    last max_piece_len best costs and segmentations as list columns;
    each recursion step is the Viterbi transition with the same
    longest-piece tie-break. Fixed to max_piece_len=4 state width."""
    assert max_piece_len == 4, "CTE state layout is written for width 4"
    return f"""
WITH RECURSIVE
_ug_words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS word
    FROM ({docs_sql})
  ) WHERE strlen(word) <= {max_word_len}
  GROUP BY word
),
_ug_starts AS (
  SELECT word, freq, UNNEST(range(1, strlen(word) + 1)) AS s FROM _ug_words
),
_ug_pieces AS (
  SELECT substring(word, s, k) AS piece, freq FROM (
    SELECT word, freq, s,
           UNNEST(range(1, least({max_piece_len}, strlen(word) - s + 1) + 1)) AS k
    FROM _ug_starts
  )
),
_ug_counts AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS pfreq FROM _ug_pieces GROUP BY piece
),
_ug_vocab AS (
  SELECT piece,
         CAST(round(ln(CAST((SELECT SUM(pfreq) FROM _ug_counts) AS DOUBLE)
                       / pfreq) * {UNI_SCALE}) AS BIGINT) AS cost
  FROM _ug_counts
),
_ug_dp AS (
  SELECT word, 0 AS j,
         [CAST(0 AS BIGINT), NULL, NULL, NULL] AS hist,
         ['', NULL, NULL, NULL] AS hseg
  FROM _ug_words
  UNION ALL
  SELECT word, j + 1,
         [best, hist[1], hist[2], hist[3]],
         [CASE WHEN kstar = 1 THEN (CASE WHEN hseg[1] = '' THEN p1 ELSE hseg[1] || '|' || p1 END)
               WHEN kstar = 2 THEN (CASE WHEN hseg[2] = '' THEN p2 ELSE hseg[2] || '|' || p2 END)
               WHEN kstar = 3 THEN (CASE WHEN hseg[3] = '' THEN p3 ELSE hseg[3] || '|' || p3 END)
               ELSE (CASE WHEN hseg[4] = '' THEN p4 ELSE hseg[4] || '|' || p4 END)
          END, hseg[1], hseg[2], hseg[3]]
  FROM (
    SELECT word, j, hist, hseg, p1, p2, p3, p4,
           least(c1, c2, c3, c4) AS best,
           CASE WHEN c4 = least(c1, c2, c3, c4) THEN 4
                WHEN c3 = least(c1, c2, c3, c4) THEN 3
                WHEN c2 = least(c1, c2, c3, c4) THEN 2
                ELSE 1 END AS kstar
    FROM (
      SELECT d.word, d.j, d.hist, d.hseg,
             substring(d.word, d.j + 1, 1) AS p1,
             substring(d.word, d.j, 2) AS p2,
             substring(d.word, d.j - 1, 3) AS p3,
             substring(d.word, d.j - 2, 4) AS p4,
             CASE WHEN 1 <= d.j + 1 AND d.hist[1] IS NOT NULL
                  THEN d.hist[1] + v1.cost END AS c1,
             CASE WHEN 2 <= d.j + 1 AND d.hist[2] IS NOT NULL
                  THEN d.hist[2] + v2.cost END AS c2,
             CASE WHEN 3 <= d.j + 1 AND d.hist[3] IS NOT NULL
                  THEN d.hist[3] + v3.cost END AS c3,
             CASE WHEN 4 <= d.j + 1 AND d.hist[4] IS NOT NULL
                  THEN d.hist[4] + v4.cost END AS c4
      FROM _ug_dp d
      LEFT JOIN _ug_vocab v1 ON v1.piece = substring(d.word, d.j + 1, 1)
      LEFT JOIN _ug_vocab v2 ON v2.piece = substring(d.word, d.j, 2)
      LEFT JOIN _ug_vocab v3 ON v3.piece = substring(d.word, d.j - 1, 3)
      LEFT JOIN _ug_vocab v4 ON v4.piece = substring(d.word, d.j - 2, 4)
      WHERE d.j < strlen(d.word)
    )
  )
)
SELECT word,
       CAST(len(string_split(hseg[1], '|')) AS INT) AS n_pieces,
       hist[1] AS cost_micro,
       hseg[1] AS seg
FROM _ug_dp WHERE j = strlen(word)
""".strip()
