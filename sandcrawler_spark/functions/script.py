"""Unicode script profiling — the writing-system router a multilingual
corpus needs BEFORE language ID: the n-gram lang-ID heuristic
(textstats.lang_id_en_score_col) only separates languages within an
alphabet; script counts split the corpus into per-writing-system lanes
(tokenizer choice, lang-ID model choice, CJK segmentation) with one
codegen pass and zero Python.

Counts are per-codepoint regexp matches over explicit hex ranges —
the same ranges expressed in Java-regex syntax here and RE2 syntax in
the DuckDB twin, so both engines count identical codepoints. Dominant
script = first in _PRIORITY achieving the max count (deterministic
tie-break), 'none' for letterless docs.

Scale shape: narrow projection, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# script -> Java character-class body (BMP main blocks; extend as the
# corpus demands). Order IS the dominance tie-break priority.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "han": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
}
_PRIORITY = list(SCRIPT_RANGES)


def script_count_col(text: Column, script: str) -> Column:
    return F.regexp_count(text, F.lit(f"[{SCRIPT_RANGES[script]}]")).cast("long")


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, <script>_n per script, n_letters, dominant_script,
    dominant_ppm) — dominant_ppm = dominant count * 1e6 div total
    letters (integer floor)."""
    counted = df.select(
        F.col(id_col),
        *[script_count_col(F.col(text_col), s).alias(f"{s}_n") for s in _PRIORITY],
    )
    total = None
    for s in _PRIORITY:
        c = F.col(f"{s}_n")
        total = c if total is None else total + c
    counted = counted.withColumn("n_letters", total.cast("long"))
    max_c = F.greatest(*[F.col(f"{s}_n") for s in _PRIORITY])
    dom = F.when(F.col("n_letters") == 0, F.lit("none"))
    for s in _PRIORITY:
        dom = dom.when(F.col(f"{s}_n") == max_c, F.lit(s))
    return (
        counted.withColumn("dominant_script", dom)
        .withColumn("_max_c", max_c)
        .withColumn(
            "dominant_ppm",
            F.when(
                F.col("n_letters") > 0,
                F.expr("(_max_c * CAST(1000000 AS BIGINT)) div n_letters"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("_max_c")
    )


# compact high-frequency function-word profiles (top closed-class
# words that are near-unique per language; deliberately excludes
# cross-language collisions like de/la shared by es+fr except where
# the rest of the profile disambiguates). Order = tie-break priority.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "les", "des", "est", "dans", "que", "une", "pour", "qui", "pas"],
    "es": ["el", "los", "las", "es", "en", "que", "una", "por", "con", "para"],
    "it": ["il", "che", "di", "non", "per", "una", "sono", "con", "del", "gli"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "zijn", "voor", "met"],
}
_LANG_PRIORITY = list(LANG_STOPWORDS)


def lang_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_hits_ppm: int = 40_000,
) -> DataFrame:
    """Closed-class-word language ID over six European languages —
    the multi-language upgrade of textstats.lang_id_en_score_col (one
    language, one ratio): per doc, the hit rate of each language's
    function-word profile in integer ppm, argmax with fixed priority
    tie-break, 'und' (undetermined, the BCP-47 convention) when the
    best rate is under min_hits_ppm (4%) or the doc has no tokens.

    Scale shape: pure Catalyst — one tokenize, one array_intersect-
    style filter per language (tiny constant arrays), no shuffle, no
    UDF. The DuckDB twin replays token-for-token.

    Returns (id, n_tokens, <lang>_ppm per language, lang_pred).
    """
    from sandcrawler_spark.functions.textstats import tokens_col

    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "n_tokens", F.size("_toks").cast("long")
    )
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(
            F.filter(F.col("_toks"), lambda t: F.array_contains(arr, t))
        ).cast("long")
        base = base.withColumn(f"_h_{lang}", hits).withColumn(
            f"{lang}_ppm",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(_h_{lang} * CAST(1000000 AS BIGINT)) div n_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    max_ppm = F.greatest(*[F.col(f"{lg}_ppm") for lg in _LANG_PRIORITY])
    pred = F.when(
        (F.col("n_tokens") == 0) | (max_ppm < F.lit(min_hits_ppm)), F.lit("und")
    )
    for lg in _LANG_PRIORITY:
        pred = pred.when(F.col(f"{lg}_ppm") == max_ppm, F.lit(lg))
    return base.withColumn("lang_pred", pred).drop(
        "_toks", *[f"_h_{lg}" for lg in _LANG_PRIORITY]
    )
