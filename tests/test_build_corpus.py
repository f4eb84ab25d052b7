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
