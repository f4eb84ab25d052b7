"""C4 line/page cleaning (functions/c4filters.py) and the NB quality
classifier (operators/quality_clf.py): golden values on constructed
pages, hand-computed weights, and partitioning invariance."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sandcrawler_spark.functions.c4filters import with_c4_verdict
from sandcrawler_spark.operators.quality_clf import (
    NAT_SCALE,
    nb_score_docs,
    train_nb_classifier,
)


def _c4(spark, pages):
    df = spark.createDataFrame(pages, ["url", "text"])
    return {r.url: r for r in with_c4_verdict(df, "text").collect()}


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "A short untermined title line",          # no terminal punct -> drop
            "this line has exactly five words.",      # keep
            "too few words.",                         # < 5 words -> drop
            "Please enable JavaScript to view the comments.",  # javascript -> drop
            "another perfectly ordinary sentence with plenty of words!",  # keep
            'he said "keep quoted lines like this one."',  # ends in quote -> keep
        ]
    )
    got = _c4(spark, [("u1", text)])["u1"]
    assert got.n_lines == 6
    assert got.n_lines_kept == 3
    kept = "\n".join(
        [
            "this line has exactly five words.",
            "another perfectly ordinary sentence with plenty of words!",
            'he said "keep quoted lines like this one."',
        ]
    )
    assert got.clean_md5 == hashlib.md5(kept.encode()).hexdigest()
    assert got.n_sentences == 3
    assert got.clean_words == 6 + 8 + 8
    assert bool(got.page_kept) is True


def test_c4_page_rules(spark):
    sent = "a fully valid line with many words in it."
    three = "\n".join([sent] * 3)
    got = _c4(
        spark,
        [
            ("few", "\n".join([sent] * 2)),          # only 2 sentences -> drop
            ("lorem", three + "\nLorem Ipsum dolor sit amet today."),
            ("brace", three + "\nfunction() { return 1; }"),
            ("ok", three),
        ],
    )
    assert bool(got["few"].page_kept) is False
    assert bool(got["lorem"].page_kept) is False
    assert bool(got["brace"].page_kept) is False
    assert bool(got["ok"].page_kept) is True


def test_c4_all_lines_dropped(spark):
    got = _c4(spark, [("u", "Download below.")])["u"]
    assert got.n_lines_kept == 0 and got.clean_words == 0
    assert got.clean_md5 == hashlib.md5(b"").hexdigest()
    assert bool(got.page_kept) is False


def test_nb_known_weights_and_score(spark):
    # pos docs: "good good fine", neg docs: "bad bad fine"
    df = spark.createDataFrame(
        [(1, "good good fine", 1), (2, "bad bad fine", 0)],
        ["doc_id", "text", "y"],
    )
    w = {r.w: r.weight_micronat for r in train_nb_classifier(df, "y", min_count=1).collect()}
    # counts: good (2,0), bad (0,2), fine (1,1); n_pos=3 n_neg=3 V=3
    def wt(cp, cn):
        return round((math.log((cp + 1) / (3 + 3)) - math.log((cn + 1) / (3 + 3))) * NAT_SCALE)

    assert w == {"good": wt(2, 0), "bad": wt(0, 2), "fine": wt(1, 1)}
    assert w["good"] > 0 > w["bad"] and w["fine"] == 0

    weights = train_nb_classifier(df, "y", min_count=1)
    got = {r.doc_id: r for r in nb_score_docs(df, weights).collect()}
    assert got[1].n_scored_tokens == 3
    assert got[1].logodds_micronat == 2 * w["good"] + w["fine"]
    assert got[2].logodds_micronat == 2 * w["bad"] + w["fine"]


def test_nb_oov_and_empty_doc(spark):
    train = spark.createDataFrame(
        [(1, "alpha alpha", 1), (2, "beta beta", 0)], ["doc_id", "text", "y"]
    )
    w = train_nb_classifier(train, "y", min_count=2)
    score = spark.createDataFrame(
        [(10, "gamma gamma gamma"), (11, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in nb_score_docs(score, w).collect()}
    assert got[10].n_scored_tokens == 0 and got[10].logodds_micronat == 0
    assert got[11].n_scored_tokens == 0 and got[11].logodds_micronat == 0


def test_nb_partitioning_invariance_and_separation(spark):
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("clean prose token"), (F.col("id") % 5).cast("string"),
                     F.lit(" clean prose")),
        ).otherwise(
            F.concat(F.lit("spam junk token"), (F.col("id") % 5).cast("string"),
                     F.lit(" spam junk")),
        ).alias("text"),
        (F.col("id") % 2 == 0).cast("int").alias("y"),
    )

    def rows(d):
        w = train_nb_classifier(d, "y")
        return sorted(tuple(r) for r in nb_score_docs(d, w).collect())

    base = rows(docs)
    assert rows(docs.repartition(13)) == base
    assert rows(docs.repartition(1)) == base
    by_id = {t[0]: t[2] for t in base}
    assert min(by_id[i] for i in by_id if i % 2 == 0) > max(
        by_id[i] for i in by_id if i % 2 == 1
    )
