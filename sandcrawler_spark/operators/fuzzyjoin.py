"""Fuzzy string join: edit-distance <= k matching at corpus scale.

The reference compares URLs fuzzily one pair at a time
(url_fuzzy_equal in reference python/sandcrawler/misc.py — http/https
and www variants) and matches titles by Levenshtein in its scalding
scorer (scalding ScoreJob slug similarity). The batch question — which
frontier URLs are small typos/variants of a seed list — needs an
edit-distance JOIN, and the naive form is a cross product.

This is prefix-filtered q-gram blocking (the Ed-Join family, Xiao et
al., VLDB'08 — public algorithm): if ed(s, t) <= k then an edit
touches at most q gram types, so s and t lose at most k*q distinct
q-gram types of each other; ranking every string's distinct grams by
a GLOBAL total order (ascending corpus frequency, ties by gram) and
keeping only each string's first k*q + 1 grams (its "prefix"), any
true match must share at least one prefix gram. Blocking is therefore
EXACT — a superset of the true result — and the final
`F.levenshtein <= k` verify makes the output identical to the brute
force, which is what the DuckDB oracle runs.

Scale shape at 100 TB: the frequency order pushes template grams
("https://", ".example.") out of every prefix — prefixes hold each
string's RAREST grams, so the blocking join fans out on low-frequency
keys, never on the shared URL template. Costs: one gram-frequency
groupBy, one per-string top-(kq+1) window over <= len(s) rows, one
equi-join on prefix grams, one Levenshtein verify per candidate. All
JVM-side (sequence/transform gram expansion, built-in levenshtein);
no Python crossing.

Exactness precondition: every string has more than k*q distinct
q-grams (len >~ q*(k+1)); shorter strings can evade the prefix
guarantee. Callers join URLs/titles (tens of chars) with q=3, k<=2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(df: DataFrame, id_col: str, s_col: str, q: int) -> DataFrame:
    """Distinct (id, gram) pairs of all length-q substrings of s."""
    g = df.select(
        F.col(id_col).alias("gid"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({s_col}) - {q - 1}, 1)),"
                f" i -> substring({s_col}, i, {q}))"
            )
        ).alias("gram"),
    )
    return g.filter(F.length("gram") == q).distinct()


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int = 2,
    q: int = 3,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_col, right_col) <= k.

    Output: (left_col, right_col, dist:int). Exact — equals the brute
    cross join + filter — provided strings carry > k*q distinct
    q-grams (see module docstring).
    """
    lg = _grams(left.select(left_col).distinct(), left_col, left_col, q)
    rg = _grams(right.select(right_col).distinct(), right_col, right_col, q)

    # global total order: ascending corpus document frequency, gram
    # as tiebreak — rarest grams first, template grams last
    df_counts = (
        lg.select("gram").unionAll(rg.select("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    prefix_len = k * q + 1
    w = Window.partitionBy("gid").orderBy("df", "gram")

    def prefix(g: DataFrame) -> DataFrame:
        return (
            g.join(df_counts, "gram")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= prefix_len)
            .select("gid", "gram")
        )

    lp = prefix(lg).withColumnRenamed("gid", "_l")
    rp = prefix(rg).withColumnRenamed("gid", "_r")
    cand = lp.join(rp, "gram").select("_l", "_r").distinct()

    dist = F.levenshtein(F.col("_l"), F.col("_r"))
    return (
        cand.filter(dist <= k)
        .select(
            F.col("_l").alias(left_col),
            F.col("_r").alias(right_col),
            dist.cast("int").alias("dist"),
        )
    )
