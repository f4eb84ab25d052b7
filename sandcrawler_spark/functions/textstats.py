"""Text-analysis functions for training-data pipelines: token count,
word count, language-ID heuristic, quality scoring, fingerprinting.

All pure Catalyst expressions (JVM, whole-stage codegen) — every one
of these runs over 100 TB of `documents.text`, so no Python crossing
is acceptable here. Each has an ANSI-SQL twin in __spark_entry__
oracle_sql() so DuckDB verifies the semantics.

Word-count parity: the reference counts words as len(text.split())
(/root/reference/python/sandcrawler/html_ingest.py:35,
pdfextract.py:231-233).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, fixed English stopword list (shared verbatim with the SQL oracle)
EN_STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array (split on
    '' yields [''], filtered out so counts match len(str.split()))."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def word_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def char_count_col(text: Column) -> Column:
    return F.length(text)


def stopword_ratio_col(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio_col(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def mean_word_len_col(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def lang_id_en_score_col(text: Column) -> Column:
    """n-gram-free language-ID heuristic: English stopword hit-rate.
    Score in [0,1]; classify en if >= 0.08 on web text."""
    return stopword_ratio_col(text)


def quality_score_col(text: Column) -> Column:
    """Composite document quality in [0,1]: length band + stopword
    presence + punctuation sanity (C4-style web-text heuristics)."""
    wc = word_count_col(text).cast("double")
    len_score = F.least(wc / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio_col(text) / F.lit(0.2), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(text) * 5)
    return (len_score * 0.4 + stop_score * 0.4 + punct_pen * 0.2)


# GPT-2-style pre-tokenizer, restricted to syntax RE2 (the DuckDB
# oracle) and Java regex share: contractions | optional-space letters |
# optional-space digits | optional-space punctuation run | whitespace
# run. Both engines use leftmost-first alternation, so counts agree.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_col(text: Column) -> Column:
    """Approximate LLM token count: matches of the BPE-ish pre-token
    regex (whitespace runs count one each, like tiktoken's pre-split).
    Pure Catalyst (regexp_count is codegen'd) — the budget-estimation
    pass over a whole corpus must not cross into Python."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def winnow_fingerprints(df, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-char gram (md5 prefix, so the SQL oracle replays it),
    slide a w-hash window, keep each window's minimum, dedupe. The
    selected fingerprint set is position-robust: near-duplicate
    documents share most fingerprints even after local edits — the
    containment-style near-dup key (vs fingerprint_col's exact key).

    Returns (id_col, fingerprint) rows. Shape note: this is an
    explode + window-min over gram positions, NOT nested array
    lambdas — a transform-inside-transform column expression is an
    optimizer trap (Catalyst inlines the producer expression into the
    consumer lambda, re-evaluating the whole gram-hash array per
    window: measured 116s vs 1s on 100 docs). The window partitions by
    document, so parallelism is per-doc and no partition exceeds one
    document's grams."""
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = df.select(F.col(id_col).alias("_id"), norm.alias("_n")).filter(
        F.length("_n") >= k + w - 1
    )
    grams = base.select(
        "_id", "_n", F.explode(F.sequence(F.lit(1), F.length("_n") - (k - 1))).alias("_i")
    ).select(
        "_id", "_i", F.substring(F.md5(F.col("_n").substr(F.col("_i"), F.lit(k))), 1, 8).alias("_h")
    )
    win = Window.partitionBy("_id").orderBy("_i").rowsBetween(0, w - 1)
    fps = grams.select(
        "_id",
        F.min("_h").over(win).alias("fingerprint"),
        F.count("_h").over(win).alias("_wn"),
    ).filter(F.col("_wn") == w)
    return fps.select(F.col("_id").alias(id_col), "fingerprint").distinct()


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed,
    punctuation-stripped text — the exact-dedupe key. md5 (not
    xxhash64) so the DuckDB oracle computes the identical value."""
    norm = F.lower(F.trim(text))
    norm = F.regexp_replace(norm, r"[^\w\s]", "")
    norm = F.regexp_replace(norm, r"\s+", " ")
    return F.md5(norm)


def readability_counts_cols(text: Column) -> list[Column]:
    """Surface counts for Flesch readability: words (maximal [a-z]+
    runs of the lowercased text), sentences ([.!?]+ runs, floored at
    1), and a deterministic dictionary-free syllable proxy — per word
    max(1, number of [aeiouy]+ vowel groups).

    Pure Catalyst: regexp_extract_all + a single-level aggregate over
    the word array (no Python crossing, no nested higher-order
    lambdas — the O(n²) inlining trap stays avoided). Each count is
    BIGINT so the score arithmetic downstream is exact.
    """
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), F.lit(0))
    n_words = F.size(words).cast("long")
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
        ).cast("long"),
    )
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))),
    ).cast("long")
    return [
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ]


def readability(df, id_col: str = "doc_id", text_col: str = "text"):
    """Flesch reading-ease + Flesch-Kincaid grade level in integer
    micro-units — the classic surface readability gates a web-text
    quality stack runs next to the C4/Gopher heuristics (readability
    bands are a standard pretraining-corpus quality stratifier).

    All arithmetic is integer with truncating division on
    non-negative operands (Spark `div` == DuckDB `//` there), so
    scores are bit-identical across engines and partitionings:

      fre_micro  = 206_835_000 - (1_015_000*words) div sentences
                              - (84_600_000*syllables) div words
      fkgl_micro = (390_000*words) div sentences
                 + (11_800_000*syllables) div words - 15_590_000

    (word count floored at 1 in the divisors so empty docs score
    rather than divide by zero). Narrow map, zero shuffles: runs at
    full scan speed over 100 TB of documents.text.
    """
    return (
        df.select(F.col(id_col), *readability_counts_cols(F.col(text_col)))
        .withColumn("_w", F.expr("greatest(CAST(1 AS BIGINT), n_words)"))
        .select(
            id_col,
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "CAST(206835000 - (CAST(1015000 AS BIGINT) * n_words) div n_sentences"
                " - (CAST(84600000 AS BIGINT) * n_syllables) div _w AS BIGINT)"
            ).alias("fre_micro"),
            F.expr(
                "CAST((CAST(390000 AS BIGINT) * n_words) div n_sentences"
                " + (CAST(11800000 AS BIGINT) * n_syllables) div _w"
                " - 15590000 AS BIGINT)"
            ).alias("fkgl_micro"),
        )
    )


def paragraph_langs(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Paragraph-level language segmentation + code-switch profile:
    (doc_id, n_paras, n_en, n_other, n_switches, dominant_lang).

    Document-level language ID (lang_id_en_score_col) mislabels
    code-switched pages — a mostly-English page with German comment
    paragraphs, or boilerplate in the site's language around quoted
    English — and those pages are exactly what a monolingual corpus
    filter should SPLIT rather than keep/drop whole. Per-paragraph
    classification over split('\\n\\n') + a lag() transition count
    gives the curation signal (n_switches > 0 => route to
    paragraph-level filtering instead of doc-level keep/drop).

    The en test is the integer-exact form of the >= 0.08 stopword
    ratio: 100*n_stop >= 8*n_toks — no float division, so the DuckDB
    twin replays it bit-for-bit. One explode + one per-doc window
    (bounded by paragraphs-per-doc), no corpus-wide shuffle.
    """
    from pyspark.sql import Window

    paras = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("pidx", "para"),
    )
    toks = tokens_col(F.lower(F.col("para")))
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    scored = paras.select(
        "doc_id", "pidx",
        F.when((n_toks > 0) & (n_stop * 100 >= n_toks * 8), F.lit("en"))
        .otherwise(F.lit("other")).alias("pred"),
    )
    w = Window.partitionBy("doc_id").orderBy("pidx")
    flagged = scored.select(
        "doc_id", "pred",
        (F.lag("pred").over(w).isNotNull()
         & (F.lag("pred").over(w) != F.col("pred"))).cast("int").alias("switch"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_paras"),
        F.sum((F.col("pred") == "en").cast("int")).cast("int").alias("n_en"),
        F.sum((F.col("pred") == "other").cast("int")).cast("int").alias("n_other"),
        F.sum("switch").cast("int").alias("n_switches"),
        F.when(
            F.sum((F.col("pred") == "en").cast("int"))
            >= F.sum((F.col("pred") == "other").cast("int")),
            F.lit("en"),
        ).otherwise(F.lit("other")).alias("dominant_lang"),
    )


def longest_repeat(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 200,
    cap: int = 24,
):
    """Longest repeated substring per document (suffix-sort + adjacent
    LCP), capped: (doc_id, repeat_len, repeat_sub).

    The memorization-audit primitive: a long internal repeat is the
    within-document form of what span_dedupe catches across documents
    — templated spam, copy-pasted boilerplate, generator loops. The
    classic O(n) answer is a suffix array; the exact same semantics
    fall out of a relational phrasing: explode all suffixes, sort
    them, and the longest repeat is the maximum longest-common-prefix
    between ADJACENT sorted suffixes (any repeated substring is a
    prefix of two suffixes, and two suffixes sharing a prefix sort
    adjacent to other sharers).

    Bounded honestly for scale: suffixes are clipped to `cap` chars
    (repeats longer than cap report cap) and the scan covers the
    first `prefix_chars` of each doc — so the exploded relation is
    O(prefix_chars) rows x cap bytes per doc, the per-doc sort window
    is bounded, and nothing is corpus-global. The LCP itself is the
    same bounded fold remove_dot_segments uses (F.aggregate /
    list_reduce with the engines' shared lambda semantics), with
    length guards so '' == '' beyond a short suffix's end cannot
    inflate the prefix.
    """
    from pyspark.sql import Window

    pre = F.substring(F.col(text_col), 1, prefix_chars)
    sfx = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(1), F.length(pre))).alias("pos"),
        pre.alias("_pre"),
    ).select(
        "doc_id", F.expr(f"substring(_pre, pos, {cap})").alias("suffix")
    )
    w = Window.partitionBy("doc_id").orderBy("suffix")
    paired = sfx.select(
        "doc_id", "suffix", F.lag("suffix").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    lcp = F.aggregate(
        F.sequence(F.lit(1), F.lit(cap)),
        F.lit(0),
        lambda acc, k: F.when(
            (acc == k - 1)
            & (k <= F.length("suffix")) & (k <= F.length("prev"))
            & (F.substr(F.col("suffix"), k, F.lit(1))
               == F.substr(F.col("prev"), k, F.lit(1))),
            k,
        ).otherwise(acc),
    )
    scored = paired.select("doc_id", "suffix", lcp.cast("int").alias("lcp"))
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("lcp").desc(), F.col("suffix").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") == 1)
        .select(
            "doc_id",
            F.col("lcp").alias("repeat_len"),
            F.expr("substring(suffix, 1, lcp)").alias("repeat_sub"),
        )
    )
