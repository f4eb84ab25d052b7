"""Corpus novelty curve: how much of each crawl slice's n-gram mass
is NEW versus already seen earlier in the crawl — the dedup-rate-
over-time diagnostic (cf. Lee et al. "Deduplicating Training Data
Makes Language Models Better": duplicate text concentrates as a crawl
ages) that tells a pipeline when continued crawling stops adding
novel training tokens.

Buckets are crawl-order slices (doc_id ranges — at production scale,
capture-date partitions). A gram instance is "novel" iff it lies in
the FIRST bucket where that gram ever occurs; the per-bucket novelty
ratio is novel-instances / total-instances in ppm.

Scale shape: gram build is a per-document array transform (single-
level lambda over the token array — no per-character explode, no
nested-lambda O(n²) inlining); then ONE shuffle keyed by gram for the
min-bucket aggregate (map-side partials), a join back on the SAME
gram key (reuses the hash partitioning), and a final bucket-count
aggregate. A boilerplate gram in 90% of docs is a big join fan-out on
one key but both sides are partitioned by gram and the consumer is an
immediate aggregate — no per-key materialization (the paragraph/span
dedupe hot-gram discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.textstats import tokens_col


def novelty_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    bucket_size: int = 50,
) -> DataFrame:
    """Per-bucket n-gram novelty: (bucket, n_instances, n_novel,
    novelty_ppm), bucket = doc_id div bucket_size."""
    grams = df.select(
        F.expr(f"CAST({id_col} div {bucket_size} AS BIGINT)").alias("bucket"),
        tokens_col(F.lower(F.col(text_col))).alias("toks"),
    ).select(
        "bucket",
        F.explode(
            F.expr(
                f"""CASE WHEN size(toks) >= {n}
                     THEN transform(sequence(0, size(toks) - {n}),
                          i -> concat_ws(' ', slice(toks, i + 1, {n})))
                     ELSE CAST(array() AS ARRAY<STRING>) END"""
            )
        ).alias("gram"),
    )
    first_bucket = grams.groupBy("gram").agg(F.min("bucket").alias("first_bucket"))
    return (
        grams.join(first_bucket, on="gram")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_instances"),
            F.sum((F.col("bucket") == F.col("first_bucket")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "bucket",
            "n_instances",
            "n_novel",
            F.expr(
                "CAST((n_novel * CAST(1000000 AS BIGINT)) div n_instances AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )
