"""Distributed BPE (byte-pair-encoding) vocabulary learning — the
tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016), run corpus-scale on Spark.

Semantics (classic BPE, word-internal): pre-tokenize to lowercase
whitespace words; start from character symbols; each round, find the
globally most frequent ADJACENT symbol pair (tiebreak: count desc,
then pair lexicographic) and merge every non-overlapping occurrence
greedily left-to-right. k rounds produce the ordered merge table —
the tokenizer artifact.

Scale shape: state is the DISTINCT word table with corpus
frequencies ((word, freq, syms)), so the per-round work is
vocabulary-sized, not corpus-sized — the corpus is touched exactly
once. Pair counting is explode + groupBy SUM(freq): ONE shuffle per
round with map-side partial aggregation. The argmax is a 1-row
TakeOrdered (the only driver action per round — a bounded k-round
loop, like link_depth_bfs). Merge application is a narrow
higher-order fold over each word's symbol array (no shuffle); state
is localCheckpointed per round to keep plans flat.

Greedy-merge equivalence note (shared with the SQL oracle, which
replays merges positionally): overlapping matches only arise in runs
where a == b ("aaaa" under (a,a)); greedy left-to-right then takes
the 1st, 3rd, ... positions of the run — the oracle's
even-offset-within-island selection, the fold here naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col


def word_units(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms): distinct corpus words with frequencies and
    their initial character-symbol arrays."""
    words = df.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word"))
    wf = words.groupBy("word").agg(F.count("*").cast("long").alias("freq"))
    # substring(word, i, 1) with a column start needs the expr form
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return wf.select("word", "freq", chars.alias("syms"))


def _merge_pair_col(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) in a symbol
    array, as a Catalyst fold (aggregate): append each symbol unless
    the accumulator's last element is `a` and the symbol is `b`, in
    which case replace the last element with a||b. The merged unit is
    a NEW symbol (it does not immediately re-merge), matching BPE."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a_lit) & (x == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_lit, b_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(df: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Learn k BPE merges over the corpus. Returns the ordered merge
    table (round, a, b, pair_count) — round is 1-based; pair_count is
    the corpus-weighted frequency of the winning pair at the time it
    was chosen."""
    spark = df.sparkSession
    state = word_units(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, k + 1):
        pairs = state.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (s, i) -> struct(s as a, syms[i + 1] as b))"
                )
            ).alias("p"),
        )
        counted = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("pair_count"))
        )
        best = counted.orderBy(
            F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc()
        ).take(1)
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, best[0].pair_count
        merges.append((r, a, b, int(cnt)))
        state = state.select(
            "word", "freq", _merge_pair_col(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round int, a string, b string, pair_count long"
    )


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Apply an ordered merge list to the corpus vocabulary: returns
    (word, freq, units) — each word segmented by the learned merges
    (narrow per-round folds, no shuffle beyond the word dedupe)."""
    state = word_units(df, text_col)
    for a, b in merges:
        state = state.select(
            "word", "freq", _merge_pair_col(F.col("syms"), a, b).alias("syms")
        )
    return state.select("word", "freq", F.col("syms").alias("units"))


def bpe_apply_oracle_sql(docs_sql: str, merges: list[tuple[str, str]]) -> str:
    """Chained-CTE DuckDB twin of bpe_segment for a LITERAL ordered
    merge list (the tokenizer-ENCODE step: no argmax — each round
    applies a known (a, b) positionally with the same greedy
    even-offset-within-island selection bpe_oracle_sql uses).
    Returns (word, freq, n_units, units)."""
    parts = [
        f"""
WITH _bpe_docs AS (SELECT text FROM ({docs_sql})),
_bpe_words AS (
  SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
  FROM _bpe_docs
),
_bpe_wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM _bpe_words GROUP BY word),
_bpe_pos AS (
  SELECT word, freq, UNNEST(range(1, length(word) + 1)) AS pos FROM _bpe_wf
),
st0 AS MATERIALIZED (
  SELECT word, freq, CAST(pos AS BIGINT) AS pos,
         substr(word, CAST(pos AS INT), 1) AS sym
  FROM _bpe_pos
)"""
    ]
    for r, (a, b) in enumerate(merges, start=1):
        p = r - 1
        a_sql, b_sql = a.replace("'", "''"), b.replace("'", "''")
        parts.append(f""",
pairs{r} AS (
  SELECT s.word, s.pos
  FROM st{p} s JOIN st{p} t ON s.word = t.word AND t.pos = s.pos + 1
  WHERE s.sym = '{a_sql}' AND t.sym = '{b_sql}'
),
sel{r} AS (
  SELECT word, pos
  FROM (
    SELECT word, pos,
           pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM (
      SELECT word, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
      FROM pairs{r}
    )
  ) WHERE off % 2 = 0
),
st{r} AS MATERIALIZED (
  SELECT word, freq,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         sym
  FROM (
    SELECT s.word, s.freq, s.pos,
           CASE WHEN m.pos IS NOT NULL THEN s.sym || s2.sym ELSE s.sym END AS sym
    FROM st{p} s
    LEFT JOIN sel{r} m ON s.word = m.word AND s.pos = m.pos
    LEFT JOIN st{p} s2 ON m.word = s2.word AND s2.pos = m.pos + 1
    LEFT JOIN sel{r} c ON s.word = c.word AND s.pos = c.pos + 1
    WHERE c.pos IS NULL
  )
)""")
    k = len(merges)
    parts.append(f"""
SELECT word, freq, CAST(COUNT(*) AS BIGINT) AS n_units,
       string_agg(sym, ' ' ORDER BY pos) AS units
FROM st{k} GROUP BY word, freq
""")
    return "".join(parts).strip()


def bpe_oracle_sql(docs_sql: str, k: int = 5) -> str:
    """Generated chained-CTE DuckDB twin of bpe_learn: per round —
    pair counts over the positional symbol table, 1-row argmax with
    the same tiebreak, positional greedy-merge application
    (even-offset-within-island selection), dense renumbering. The k
    winning pairs are UNION ALL'd into the same (round, a, b,
    pair_count) table bpe_learn returns."""
    parts = [
        f"""
WITH _bpe_docs AS (SELECT text FROM ({docs_sql})),
_bpe_words AS (
  SELECT UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
  FROM _bpe_docs
),
_bpe_wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM _bpe_words GROUP BY word),
_bpe_pos AS (
  SELECT word, freq, UNNEST(range(1, length(word) + 1)) AS pos FROM _bpe_wf
),
st0 AS MATERIALIZED (
  SELECT word, freq, CAST(pos AS BIGINT) AS pos,
         substr(word, CAST(pos AS INT), 1) AS sym
  FROM _bpe_pos
)"""
    ]
    for r in range(1, k + 1):
        p = r - 1
        parts.append(f""",
pairs{r} AS (
  SELECT s.word, s.freq, s.pos, s.sym AS a, t.sym AS b
  FROM st{p} s JOIN st{p} t ON s.word = t.word AND t.pos = s.pos + 1
),
cnt{r} AS (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs{r} GROUP BY a, b
),
best{r} AS (
  SELECT a, b, pair_count FROM cnt{r}
  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
),
match{r} AS (
  SELECT p.word, p.pos,
         p.pos - ROW_NUMBER() OVER (PARTITION BY p.word ORDER BY p.pos) AS grp
  FROM pairs{r} p JOIN best{r} x ON p.a = x.a AND p.b = x.b
),
sel{r} AS (
  SELECT word, pos
  FROM (
    SELECT word, pos,
           pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM match{r}
  ) WHERE off % 2 = 0
),
st{r} AS MATERIALIZED (
  SELECT word, freq,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         sym
  FROM (
    SELECT s.word, s.freq, s.pos,
           CASE WHEN m.pos IS NOT NULL THEN s.sym || s2.sym ELSE s.sym END AS sym
    FROM st{p} s
    LEFT JOIN sel{r} m ON s.word = m.word AND s.pos = m.pos
    LEFT JOIN st{p} s2 ON m.word = s2.word AND s2.pos = m.pos + 1
    LEFT JOIN sel{r} c ON s.word = c.word AND s.pos = c.pos + 1
    WHERE c.pos IS NULL
  )
)""")
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, a, b, pair_count FROM best{r}" for r in range(1, k + 1)
    )
    parts.append(f"\nSELECT CAST(round AS INT) AS round, a, b, pair_count FROM ({sel}) ORDER BY round")
    return "".join(parts).strip()


def segment_coverage(
    df: DataFrame,
    merges: list[tuple[str, str]],
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-quality readout per stratum for a FIXED merge list
    (the eval a tokenizer training run ships with): how well do the
    learned merges compress each slice of the corpus?

      n_words       word occurrences in the stratum
      n_tokens      BPE units those words segment into (sum)
      fertility_ppm 1e6 * n_tokens div n_words  (1e6 = perfectly
                    merged, higher = more subword splitting)
      one_unit_ppm  1e6 * (occurrences segmented to a SINGLE unit)
                    div n_words  (full-word vocab coverage)

    A stratum whose fertility is far above the training mix's is
    under-served by the tokenizer (the practical OOV signal for an
    open-vocab BPE, where literal OOV is impossible by construction).

    Scale shape: the merge fold runs once over the GLOBAL distinct
    word table (vocab-sized — the bpe_learn discipline), never per
    stratum; per-stratum word counts join the segmented vocab on the
    word key (one shuffle each side), then a stratum-keyed agg."""
    seg = bpe_segment(df, merges, text_col=text_col).select(
        "word", F.size("units").cast("long").alias("n_units")
    )
    toks = tokens_col(F.lower(F.col(text_col)))
    per_stratum = (
        df.select(F.col(stratum_col).alias("stratum"), toks.alias("_w"))
        .select("stratum", F.explode("_w").alias("word"))
        .groupBy("stratum", "word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    joined = per_stratum.join(seg, on="word", how="inner")
    return (
        joined.groupBy("stratum")
        .agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_units")).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("n_units") == 1, F.col("freq")).otherwise(F.lit(0)))
            .cast("long")
            .alias("_one"),
        )
        .select(
            "stratum",
            "n_words",
            "n_tokens",
            F.expr("CAST(1000000 AS BIGINT) * n_tokens div n_words").alias("fertility_ppm"),
            F.expr("CAST(1000000 AS BIGINT) * _one div n_words").alias("one_unit_ppm"),
        )
    )
