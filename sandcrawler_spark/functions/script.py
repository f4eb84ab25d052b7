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
