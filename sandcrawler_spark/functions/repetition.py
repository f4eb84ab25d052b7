"""Gopher-style repetition filters for web-text corpus curation.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", table A1) gate
documents on repetition signals: fraction of duplicate lines, fraction
of characters in duplicate lines, fraction of characters in the most
frequent n-gram, and fraction of characters covered by duplicated
n-grams. These run over every document of a 100 TB corpus, so the
implementations here are explode + groupBy shapes (per-(doc,line) /
per-(doc,gram) keys — shuffle-partitioned far finer than per-doc, no
skew ceiling, map-side partial aggregation applies) and NOT nested
array-lambda column expressions: Catalyst inlines a producer array
expression into each consumer lambda and re-evaluates it per element —
the O(n^2) optimizer trap measured at 116 s vs 1 s on the winnowing
operator.

Metric definitions (documented divergence from the paper where noted):
- dup_line_frac      = (line occurrences beyond first) / total lines
- dup_line_char_frac = chars in occurrences beyond first / chars in all lines
- top n-gram char fraction = count(top gram) * len(top gram) / len(text)
  (ties broken by lexicographically smallest gram — deterministic)
- dup n-gram word fraction = (gram occurrences beyond first) * n / word
  count, capped at 1.0. The paper's variant counts *character positions
  covered* by duplicated n-grams; the word-occurrence form keeps the
  same signal monotonically and is exactly replayable in ANSI SQL.

Each metric has a DuckDB twin in __spark_entry__.oracle_sql()
("gopher_repetition").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per non-blank line: split on \\n, values trimmed, empty
    lines dropped (boilerplate dedupe must not be defeated by stray
    indentation)."""
    arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return df.select(F.col(id_col).alias("_id"), F.explode(arr).alias("line"))


def line_repetition(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document duplicate-line stats.

    Returns (id_col, n_lines, dup_line_frac, dup_line_char_frac).
    Documents with zero non-blank lines are omitted (no lines -> no
    repetition signal; the caller's quality gate treats absent as 0).
    """
    per_line = (
        _lines(df, id_col, text_col)
        .groupBy("_id", "line")
        .agg(F.count("*").alias("cnt"), F.length(F.first("line")).alias("len"))
    )
    out = per_line.groupBy("_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        (
            (F.sum("cnt") - F.count("*")) / F.sum("cnt")
        ).alias("dup_line_frac"),
        (
            F.sum((F.col("cnt") - 1) * F.col("len")) / F.sum(F.col("cnt") * F.col("len"))
        ).alias("dup_line_char_frac"),
    )
    return out.select(
        F.col("_id").alias(id_col), "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
    )


def _ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One row per word n-gram occurrence: (_id, gram)."""
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("_toks"),
        F.length(F.col(text_col)).alias("_nchar"),
    ).filter(F.size("_toks") >= n)
    return base.select(
        "_id", "_nchar", F.size("_toks").alias("_nw"),
        F.explode(F.sequence(F.lit(1), F.size("_toks") - (n - 1))).alias("_i"),
        F.col("_toks"),
    ).select(
        "_id", "_nchar", "_nw",
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_i"), n)).alias("gram"),
    )


def top_ngram_char_frac(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Fraction of the document's characters accounted for by its most
    frequent word n-gram (count * gram length / text length). Ties go
    to the lexicographically smallest gram. Returns (id_col, top_gram,
    top_{n}gram_char_frac); docs with < n words are omitted."""
    grams = _ngrams(df, id_col, text_col, n)
    counts = grams.groupBy("_id", "gram").agg(
        F.count("*").alias("cnt"),
        F.first("_nchar").alias("_nchar"),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = counts.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return top.select(
        F.col("_id").alias(id_col),
        F.col("gram").alias("top_gram"),
        F.round(
            F.col("cnt") * F.length("gram") / F.col("_nchar"), 6
        ).alias(f"top_{n}gram_char_frac"),
    )


def dup_ngram_word_frac(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Fraction of words attributable to repeated word n-grams:
    (occurrences beyond the first, summed over grams) * n / word count,
    capped at 1.0 (overlapping repeats can over-count words, the paper
    caps coverage at the document length the same way). Returns
    (id_col, dup_{n}gram_word_frac); docs with < n words are omitted."""
    grams = _ngrams(df, id_col, text_col, n)
    counts = grams.groupBy("_id", "gram").agg(
        F.count("*").alias("cnt"), F.first("_nw").alias("_nw")
    )
    out = counts.groupBy("_id").agg(
        (
            F.least(
                F.sum(F.col("cnt") - 1) * n / F.first("_nw").cast("double"), F.lit(1.0)
            )
        ).alias("frac")
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.round("frac", 6).alias(f"dup_{n}gram_word_frac"),
    )


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """All three repetition signals joined per document (inner on docs
    that have >= max(top_n, dup_n) words and >= 1 line — the corpus
    gate drops shorter docs before this filter anyway)."""
    a = line_repetition(df, id_col, text_col)
    b = top_ngram_char_frac(df, id_col, text_col, n=top_n)
    c = dup_ngram_word_frac(df, id_col, text_col, n=dup_n)
    return a.join(b, on=id_col).join(c, on=id_col)


# --- Gopher quality rules (r4 session 16) ----------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_cols(text):
    """The Gopher QUALITY rule set (Rae et al. 2021, Appendix A) —
    the companion to gopher_repetition's repetition rules, completing
    the published filter. Every threshold is evaluated in integer
    cross-multiplied form (no float ratios), so the DuckDB twin
    replays it bit-for-bit:

      wc_ok        50 <= word count <= 100,000
      mwl_ok       3 <= mean word length <= 10  (3n <= chars <= 10n)
      sym_ok       (hashtags + '...' occurrences) * 10 <= words
      bullet_ok    bullet-start lines * 10 <= 9 * lines
      ellipsis_ok  '...'-ending lines * 10 <= 3 * lines
      alpha_ok     words containing a letter * 5 >= 4 * words
      stop_ok      >= 2 distinct members of the 8-stopword probe set

    Returns the 7 flags + gopher_pass (AND of all)."""
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    n_words = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    n_stop_kinds = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.regexp_count(text, F.lit(r"\.\.\."))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))
    )
    n_ell_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))

    wc_ok = n_words.between(50, 100_000)
    mwl_ok = (total_chars >= n_words * 3) & (total_chars <= n_words * 10)
    sym_ok = (n_hash + n_ellipsis) * 10 <= n_words
    bullet_ok = n_bullet * 10 <= n_lines * 9
    ellipsis_ok = n_ell_lines * 10 <= n_lines * 3
    alpha_ok = n_alpha * 5 >= n_words * 4
    stop_ok = n_stop_kinds >= 2
    gopher_pass = (
        wc_ok & mwl_ok & sym_ok & bullet_ok & ellipsis_ok & alpha_ok & stop_ok
    )
    return [
        wc_ok.alias("wc_ok"), mwl_ok.alias("mwl_ok"), sym_ok.alias("sym_ok"),
        bullet_ok.alias("bullet_ok"), ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"), stop_ok.alias("stop_ok"),
        gopher_pass.alias("gopher_pass"),
    ]
