"""DSIR hashed-ngram importance weighting (operators/dsir.py):
directionality (target-like docs outscore off-target docs), exact
partitioning invariance of the integer micro-nat scores, empty-doc
handling, and mergeability of the hash-LM sufficient statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators.dsir import (
    dsir_weights,
    train_hash_lm,
)

A_WORDS = "theorem lemma proof corollary integral manifold"
B_WORDS = "buy cheap deal sale discount coupon"


def _docs(spark):
    rows = []
    for i in range(20):
        rows.append((i, f"{A_WORDS} {A_WORDS.split()[i % 6]}"))
    for i in range(20, 40):
        rows.append((i, f"{B_WORDS} {B_WORDS.split()[i % 6]}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_directionality(spark):
    raw = _docs(spark)
    target = raw.filter(F.col("doc_id") < 20)  # the "math" slice
    w = {r.doc_id: r.logratio_micronat for r in dsir_weights(raw, target).collect()}
    a_scores = [w[i] for i in range(20)]
    b_scores = [w[i] for i in range(20, 40)]
    # every in-domain doc must outscore every off-domain doc: the two
    # vocabularies are disjoint, so the ratio model separates cleanly
    assert min(a_scores) > max(b_scores)
    assert min(a_scores) > 0 > max(b_scores)


def test_dsir_empty_and_missing_docs(spark):
    raw = spark.createDataFrame(
        [(1, "theorem proof"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    target = raw.filter(F.col("doc_id") == 1)
    got = {r.doc_id: (r.n_tokens, r.logratio_micronat)
           for r in dsir_weights(raw, target).collect()}
    assert got[2] == (0, 0) and got[3] == (0, 0)
    assert got[1][0] == 2


def test_dsir_partitioning_invariance(spark):
    raw = _docs(spark)
    target = raw.filter(F.col("doc_id") % 4 == 0)
    one = dsir_weights(raw.coalesce(1), target.coalesce(1)).collect()
    many = dsir_weights(raw.repartition(13), target.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_hash_lm_partials_merge(spark):
    """Bucket counts are mergeable sufficient statistics: training on
    two shards and SUMming equals training on the union — the property
    that lets the target/raw models build incrementally per crawl
    round."""
    docs = _docs(spark)
    lo, hi = docs.filter("doc_id < 20"), docs.filter("doc_id >= 20")
    c_all, _ = train_hash_lm(docs)
    c_lo, _ = train_hash_lm(lo)
    c_hi, _ = train_hash_lm(hi)
    merged = (
        c_lo.unionByName(c_hi).groupBy("bucket").agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, c_all.collect())
    )
