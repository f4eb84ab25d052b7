"""Fuzzy-match scoring joins (the Scalding matcher, Spark-first).

Parity targets:
  - ScoreJob slug inner join (/root/reference/scalding/src/main/scala/
    sandcrawler/ScoreJob.scala:31-48): two corpora keyed by normalized
    title slug (block key), inner join, per-pair Levenshtein
    similarity. The slug turns an O(n²) fuzzy match into an equi-join.
  - GroupFatcatWorksJob self-join (GroupFatcatWorksJob.scala:24-43 +
    Scorable.scala:63-80 `selfMatchable`): same-corpus self-join on
    slug, trivial matches dropped via a strict ordering (a < b) so
    each pair appears once.

Skew: degenerate titles would be mega-hot slug keys — the slug
denylist + min-length (functions/slug.py) is the hot-key guard the
reference uses (ScorableFeatures.scala:10-14); AQE skew-join covers
the residual tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.slug import similarity_col, slug_col


def slug_join_score(
    left: DataFrame,
    right: DataFrame,
    left_title: str = "title",
    right_title: str = "title",
    left_id: str = "id",
    right_id: str = "id",
    min_score: int = 0,
) -> DataFrame:
    """Block-then-verify fuzzy title match across two corpora."""
    l = left.select(
        F.col(left_id).alias("left_id"),
        F.col(left_title).alias("left_title"),
        slug_col(F.col(left_title)).alias("slug"),
    ).filter(F.col("slug").isNotNull())
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(right_title).alias("right_title"),
        slug_col(F.col(right_title)).alias("slug"),
    ).filter(F.col("slug").isNotNull())
    return (
        l.join(r, on="slug", how="inner")
        .withColumn("score", similarity_col(F.col("left_title"), F.col("right_title")))
        .filter(F.col("score") >= min_score)
        .select("slug", "left_id", "right_id", "left_title", "right_title", "score")
    )


def self_group_works(
    df: DataFrame, title_col: str = "title", id_col: str = "id", min_score: int = 900
) -> DataFrame:
    """Self-join on slug; (a < b) ordering drops self/duplicate pairs."""
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(title_col).alias("title"),
        slug_col(F.col(title_col)).alias("slug"),
    ).filter(F.col("slug").isNotNull())
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, on="slug", how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("score", similarity_col(F.col("a.title"), F.col("b.title")))
        .filter(F.col("score") >= min_score)
        .select(
            "slug",
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "score",
        )
    )
