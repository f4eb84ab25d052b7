"""C4-style line/page cleaning for web-text training corpora
(Raffel et al. 2020, JMLR 21(140) §2.2 — the public C4 recipe):

  line rules   — keep a line only if it (a) ends in a terminal
                 punctuation mark, (b) has at least 5 words, and
                 (c) does not mention "javascript" (boilerplate
                 cookie/JS warnings);
  page rules   — drop the whole page if the cleaned text has fewer
                 than 3 sentences, contains the phrase "lorem ipsum",
                 or contains a curly brace (code, not prose).

Divergence from the paper, documented: the "bad words" list filter is
omitted (the published list is an external artifact; the hook is the
same `contains` predicate over a broadcast list and adding it changes
no plumbing), and langdetect is replaced by this repo's stopword
language score (functions/textstats.lang_id_en_score_col).

Everything here is a pure Catalyst column expression (split / filter
higher-order function / regexp), so the pass runs JVM-side with
whole-stage codegen over 100 TB of page text — no Python crossing.
Each expression has a DuckDB twin (list_filter + regexp_matches) in
__spark_entry__.oracle_sql()["c4_line_filters"], which verifies the
semantics byte-for-byte via the cleaned-text md5.

Scale shape: per-row narrow map, no shuffle at all; the page-level
verdict is a column, so downstream stages filter on it and the scan's
predicate pushdown still applies to the enclosing query.

Reference tie-in: the reference's quality gate is GROBID confidence
(scalding ScoreJob / python/sandcrawler/ingest.py quality checks);
C4's line rules are the webtext-corpus analog of that same
keep/drop verdict, expressed over extracted text instead of TEI.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a line must end in . ! ? or a closing double-quote after one of
# them, ignoring trailing whitespace (the reference C4 implementation
# strips each line before the endswith test; the \s* also keeps the
# three regex engines in agreement on \r\n-terminated lines, where a
# bare $ is end-of-text in RE2 but before-final-terminator in Java)
TERMINAL_PUNCT_RE = r'[.!?"]\s*$'


def _line_word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(line, r"\s+"), lambda t: t != ""))


def kept_lines_col(text: Column, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line rules, original order."""
    lines = F.split(text, "\n")
    return F.filter(
        lines,
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (_line_word_count(l) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )


def with_c4_verdict(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Adds c4 cleaning columns to df:

    n_lines / n_lines_kept — before/after the line rules;
    clean_text            — kept lines re-joined with newline;
    n_sentences           — terminal-mark count in clean_text;
    clean_words           — word count of clean_text;
    clean_md5             — md5 of clean_text (the byte-level
                            verification key the oracle replays);
    page_kept             — the C4 page verdict.
    """
    kept = kept_lines_col(F.col(text_col), min_words=min_words)
    out = df.withColumn("_kept", kept).withColumn(
        "clean_text", F.array_join(F.col("_kept"), "\n")
    )
    n_sent = F.regexp_count(F.col("clean_text"), F.lit(r"[.!?]"))
    return (
        out.withColumn("n_lines", F.size(F.split(F.col(text_col), "\n")))
        .withColumn("n_lines_kept", F.size(F.col("_kept")))
        .withColumn("n_sentences", n_sent)
        .withColumn(
            "clean_words",
            F.size(F.filter(F.split(F.col("clean_text"), r"\s+"), lambda t: t != "")),
        )
        .withColumn("clean_md5", F.md5(F.col("clean_text")))
        .withColumn(
            "page_kept",
            (n_sent >= min_sentences)
            & ~F.lower(F.col(text_col)).contains("lorem ipsum")
            & ~F.col(text_col).contains("{"),
        )
        .drop("_kept")
    )


def c4_oracle_sql(
    pages_sql: str,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> str:
    """DuckDB twin of with_c4_verdict over a (url, text) relation:
    identical line split, line predicate, re-join, md5, and page
    verdict, so the value hash matches byte-for-byte."""
    line_pred = (
        f"regexp_matches(l, '{TERMINAL_PUNCT_RE}') "
        f"AND len(list_filter(string_split_regex(l, '\\s+'), t -> t <> '')) >= {min_words} "
        "AND NOT contains(lower(l), 'javascript')"
    )
    return f"""
WITH _c4_in AS (SELECT url, {text_col} AS text FROM ({pages_sql})),
_c4_kept AS (
  SELECT url, text,
         list_filter(string_split(text, chr(10)), l -> {line_pred}) AS kept
  FROM _c4_in
),
_c4_clean AS (
  -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
  SELECT url, text, kept, COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
  FROM _c4_kept
)
SELECT url,
       CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_lines_kept,
       CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS INT) AS n_sentences,
       CAST(len(list_filter(string_split_regex(clean_text, '\\s+'), t -> t <> '')) AS INT)
         AS clean_words,
       md5(clean_text) AS clean_md5,
       (len(regexp_extract_all(clean_text, '[.!?]')) >= {min_sentences}
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS page_kept
FROM _c4_clean
""".strip()
