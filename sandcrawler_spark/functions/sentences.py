"""Rule-based sentence segmentation — the text-pipeline stage between
extraction and tokenization: training-data builders split documents
into sentences for sequence packing, quality scoring (mean sentence
length is a Gopher-adjacent signal), and parallel-corpus alignment.
The reference extracts whole-document text (`html_ingest.py`,
`pdfextract.py`) and leaves segmentation to consumers; a corpus
engine needs it as a first-class, deterministic operator.

Pure Catalyst, shared Java/RE2 regex subset (no lookahead, no
backreference patterns) so the DuckDB oracle replays the exact same
passes:

  1. protect decimal points              (3.14 stays one token)
  2. protect e.g. / i.e. / et al.        (inline (?i), both engines)
  3. protect title abbreviations         (Dr. Mr. Prof. Fig. ...)
  4. protect single-capital initials     (J. Smith)
  5. mark boundaries: terminator run + whitespace + [A-Z0-9"(]
     -> terminator + \\x1e + capital (the classic rule-based split;
     requiring a following capital is what keeps "vs. the" intact
     after step 3 fires)

Counting then needs no list ops at all: n_sentences = boundary marks
+ 1 (when the doc has any word), n_words counts [A-Za-z0-9]+ runs on
the ORIGINAL text (protections only rewrite dots into non-word
placeholders, so word counts are unaffected by construction).

Scale shape: narrow per-row regexp passes inside whole-stage codegen
— no shuffle, no UDF, no array materialization; at 100 TB this is a
scan-speed operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT = "\x11"  # protected-dot placeholder (non-word control char)
_SEP = "\x1e"  # sentence-boundary marker

_DEC_PAT = r"(\d)\.(\d)"
_EG_PAT = r"(?i)\b(e)\.(g)\."
_IE_PAT = r"(?i)\b(i)\.(e)\."
_ETAL_PAT = r"(?i)\b(et al)\."
_ABBR_PAT = r"\b(Dr|Mr|Mrs|Ms|Prof|Fig|Eq|Vol|No|pp|cf|Jr|Sr|St|vs)\."
_INIT_PAT = r"\b([A-Z])\."
_BOUND_PAT = "([.!?]+)\\s+([A-Z0-9\"(])"
# CJK terminators (。！？) end a sentence with no case signal to
# require — mark when more text follows (a trailing terminator adds
# no boundary: n_sentences is bounds+1). Literal chars in the class
# keep the pattern byte-identical across Java/RE2/Python re.
_CJK_BOUND_PAT = "([。！？]+)\\s*(\\S)"
# a "word" is an alnum run OR one CJK ideograph (the standard
# char-as-word convention for unsegmented scripts)
_WORD_PAT = "[A-Za-z0-9]+|[一-鿿]"


def marked_sentences_col(text: Column) -> Column:
    """The text with protected dots rewritten to \\x11 and sentence
    boundaries marked with \\x1e — the shared intermediate both the
    stats below and any downstream per-sentence explode split on."""
    s = F.regexp_replace(text, _DEC_PAT, f"$1{_DOT}$2")
    s = F.regexp_replace(s, _EG_PAT, f"$1{_DOT}$2{_DOT}")
    s = F.regexp_replace(s, _IE_PAT, f"$1{_DOT}$2{_DOT}")
    s = F.regexp_replace(s, _ETAL_PAT, f"$1{_DOT}")
    s = F.regexp_replace(s, _ABBR_PAT, f"$1{_DOT}")
    s = F.regexp_replace(s, _INIT_PAT, f"$1{_DOT}")
    s = F.regexp_replace(s, _BOUND_PAT, f"$1{_SEP}$2")
    return F.regexp_replace(s, _CJK_BOUND_PAT, f"$1{_SEP}$2")


def with_sentence_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds (n_sentences, n_words, mean_words_x100). mean is integer
    fixed-point ((100 * n_words) div n_sentences) so per-doc values
    replay bit-exactly in the oracle; a doc with words but no
    boundary is one sentence; an empty/wordless doc is zero."""
    marked = marked_sentences_col(F.col(text_col))
    n_words = F.regexp_count(F.col(text_col), F.lit(_WORD_PAT)).cast("int")
    n_bounds = F.regexp_count(marked, F.lit(_SEP)).cast("int")
    n_sent = F.when(n_words > 0, n_bounds + F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_sentences", n_sent)
        .withColumn(
            "mean_words_x100",
            F.when(
                F.col("n_sentences") > 0,
                F.expr("(100 * n_words) div n_sentences"),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )


def sentence_stats_oracle_sql(docs_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin: the same five protection passes + boundary mark
    (RE2 '\\1' group syntax, 'g' flag — DuckDB replaces first-only by
    default), then the same two regexp counts. docs_sql must yield
    (id_col, text)."""
    d, sep = _DOT, _SEP
    return f"""
WITH docs AS ({docs_sql}),
marked AS (
  SELECT {id_col},
         text,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '{_DEC_PAT}', '\\1{d}\\2', 'g'),
                       '{_EG_PAT}', '\\1{d}\\2{d}', 'g'),
                     '{_IE_PAT}', '\\1{d}\\2{d}', 'g'),
                   '{_ETAL_PAT}', '\\1{d}', 'g'),
                 '{_ABBR_PAT}', '\\1{d}', 'g'),
               '{_INIT_PAT}', '\\1{d}', 'g'),
             '([.!?]+)\\s+([A-Z0-9"(])', '\\1{sep}\\2', 'g'),
           '([。！？]+)\\s*(\\S)', '\\1{sep}\\2', 'g') AS m
  FROM docs
),
counted AS (
  SELECT {id_col},
         CAST(len(regexp_extract_all(text, '{_WORD_PAT}')) AS INT) AS n_words,
         CAST(len(regexp_extract_all(m, '{sep}')) AS INT) AS n_bounds
  FROM marked
)
SELECT {id_col},
       n_words,
       CASE WHEN n_words > 0 THEN n_bounds + 1 ELSE 0 END AS n_sentences,
       CAST(CASE WHEN n_words > 0
                 THEN (100 * n_words) // (n_bounds + 1)
                 ELSE 0 END AS INT) AS mean_words_x100
FROM counted
"""
