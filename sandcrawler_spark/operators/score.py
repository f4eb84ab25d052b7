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


MAX_TITLE_LENGTH = 1023  # Scorable.scala:35

# CrossrefScorable.scala:30-42 — release types worth fuzzy-matching
CROSSREF_TYPE_WHITELIST = (
    "book", "book-chapter", "dataset", "dissertation", "journal-article", "letter",
    "monograph", "posted-content", "pre-print", "proceedings-article", "report",
    "working-paper",
)


def grobid_keep_filter(
    df: DataFrame, title_col: str = "title", status_code_col: str = "status_code"
) -> DataFrame:
    """F11: GROBID-side quality gate before the scoring join
    (GrobidScorable.scala:29-52): extraction succeeded (status 200) and
    the title exists with a sane length."""
    return df.filter(
        (F.col(status_code_col) == 200)
        & F.col(title_col).isNotNull()
        & (F.length(title_col) > 0)
        & (F.length(title_col) <= MAX_TITLE_LENGTH)
    )


def crossref_keep_filter(
    df: DataFrame, title_col: str = "title", type_col: str = "release_type"
) -> DataFrame:
    """F12: Crossref-side gate (CrossrefScorable.scala:29-56): release
    type in the whitelist and a present, sane-length title."""
    return df.filter(
        F.col(type_col).isin(*CROSSREF_TYPE_WHITELIST)
        & F.col(title_col).isNotNull()
        & (F.length(title_col) > 0)
        & (F.length(title_col) <= MAX_TITLE_LENGTH)
    )


def score_insertable_join(
    grobid: DataFrame,
    crossref: DataFrame,
    cdx: DataFrame,
    min_score: int = 0,
) -> DataFrame:
    """J5: the 3-way ScoreInsertableJob shape (ScoreInsertable.scala:
    53-76): quality-filtered grobid × crossref slug-join scored by
    title similarity, then the scored pairs join CDX capture metadata
    on the grobid side's content hash.

    Inputs: grobid(sha1hex, title, status_code), crossref(id, title,
    release_type), cdx(sha1hex, mimetype, warc_csize). Both scoring
    sides shuffle only on the slug block key; the final join is an
    equi-join on sha1hex (AQE handles hot hashes)."""
    g = grobid_keep_filter(grobid).select(
        F.col("sha1hex"), F.col("title").alias("grobid_title")
    )
    c = crossref_keep_filter(crossref).select(
        F.col("id").alias("crossref_id"), F.col("title").alias("crossref_title")
    )
    scored = slug_join_score(
        g, c, left_title="grobid_title", right_title="crossref_title",
        left_id="sha1hex", right_id="crossref_id", min_score=min_score,
    ).select(
        F.col("left_id").alias("sha1hex"),
        F.col("right_id").alias("crossref_id"),
        "slug",
        "score",
    )
    meta = cdx.select("sha1hex", "mimetype", "warc_csize")
    return scored.join(meta, on="sha1hex", how="inner")


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
