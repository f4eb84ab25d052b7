"""End-to-end training-corpus pipeline job (jobs/build_corpus.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))


def test_build_corpus_pipeline(spark):
    from build_corpus import build_corpus
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out, stats = build_corpus(spark, docs, token_budget=20_000)
    # lineage is monotone non-increasing through the gates
    assert (
        stats["input"]
        >= stats["after_exact_dedupe"]
        >= stats["after_neardup_dedupe"]
        >= stats["after_quality_gates"]
        >= stats["packed_docs"]
    )
    assert stats["packed_docs"] > 0
    # the pack respects the budget exactly (greedy prefix property)
    assert stats["packed_tokens"] <= 20_000
    mx = out.agg(F.max("cum_tokens")).collect()[0][0]
    assert mx == stats["packed_tokens"]
    # deterministic: re-running yields identical stats
    _, stats2 = build_corpus(spark, docs, token_budget=20_000)
    assert stats == stats2


def test_build_corpus_dsir_stage(spark):
    """DSIR selection stage: keeps ceil(frac*n) docs chosen by target-
    language importance weight, the kept slice is biased toward the
    target language vs the pre-DSIR mix, and the run is deterministic."""
    import math

    from build_corpus import build_corpus
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out, stats = build_corpus(
        spark, docs, token_budget=1_000_000,
        dsir_target_lang="en", dsir_keep_frac=0.4,
    )
    assert stats["after_quality_gates"] >= stats["after_dsir"] >= stats["packed_docs"]
    assert stats["after_dsir"] == max(1, math.ceil(0.4 * stats["after_quality_gates"]))

    # the selected slice must be en-enriched relative to the survivors
    kept = out.select("doc_id").join(docs, on="doc_id")
    en_kept = kept.filter(F.col("lang") == "en").count() / kept.count()
    en_all = docs.filter(F.col("lang") == "en").count() / docs.count()
    assert en_kept > en_all

    _, stats2 = build_corpus(
        spark, docs, token_budget=1_000_000,
        dsir_target_lang="en", dsir_keep_frac=0.4,
    )
    assert stats == stats2
