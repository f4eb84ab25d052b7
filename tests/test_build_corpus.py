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


def test_build_corpus_encoding_stage(spark):
    """Stage 0 repairs mojibake BEFORE anything downstream consumes the
    text. The exact-dedupe fingerprint strips non-ASCII, so corrupted
    twins collapse either way — the repair's user-visible property is
    that the SURVIVING text is clean: the corrupted plant carries the
    lower doc_id (it wins representative), and with the stage on its
    packed text is the clean form; with --no-fix-encoding the
    corruption flows through to the corpus."""
    from build_corpus import build_corpus
    from pyspark.sql import functions as F

    from sandcrawler_spark.functions.encoding import mojibake_py

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # reversed word order: disjoint 5-gram shingles, so the plant is
    # NOT a near-dup of doc 0, while keeping corpus-typical quality
    base_words = docs.orderBy("doc_id").first().text.split()
    clean = "caf\u00e9 r\u00e9sum\u00e9 \u2014 " + " ".join(reversed(base_words))
    planted = spark.createDataFrame(
        [(900001, mojibake_py(clean)), (900002, clean)],
        "doc_id long, text string",
    )
    both = docs.unionByName(planted)

    out, stats = build_corpus(spark, both, token_budget=1_000_000)
    assert stats["encoding_repaired"] == 1
    kept = {r.doc_id: r.text for r in out.collect()}
    assert 900001 in kept and 900002 not in kept  # min-id rep, twin gone
    assert kept[900001] == clean

    out_off, stats_off = build_corpus(
        spark, both, token_budget=1_000_000, fix_encoding=False
    )
    assert "encoding_repaired" not in stats_off
    kept_off = {r.doc_id: r.text for r in out_off.collect()}
    assert kept_off[900001] == mojibake_py(clean)  # corruption flowed through


def test_build_corpus_line_dedupe_stage(spark):
    """--dedupe-lines: a good article wrapped in repeated boilerplate
    lines trips the dup_line_frac gate and is dropped whole without
    the stage; with it the boilerplate collapses to one occurrence and
    the content survives into the pack."""
    from build_corpus import build_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    words = docs.orderBy("doc_id").first().text.split()
    content = [" ".join(reversed(words[i : i + 12])) for i in range(0, 84, 12)]
    boiler = ["accept our cookie notice to continue"] * 6
    planted_text = "\n".join(boiler[:3] + content + boiler[3:])
    planted = spark.createDataFrame(
        [(900004, planted_text)], "doc_id long, text string"
    )
    both = docs.unionByName(planted)

    out_off, stats_off = build_corpus(spark, both, token_budget=1_000_000)
    out_on, stats_on = build_corpus(
        spark, both, token_budget=1_000_000, dedupe_lines=True
    )
    assert stats_on["lines_removed"] >= 5
    kept_on = {r.doc_id: r.text for r in out_on.collect()}
    assert 900004 in kept_on
    assert kept_on[900004].count("cookie notice") == 1
    # without the stage the wrapped article is gated away whole
    assert 900004 not in {r.doc_id for r in out_off.collect()}
    assert stats_off["after_quality_gates"] < stats_on["after_quality_gates"]


def test_build_corpus_strip_boilerplate_stage(spark):
    """--strip-boilerplate: two hosts syndicate the same article under
    different site templates — with the stage the template strips
    BEFORE dedupe so the copies collapse to one; without it both
    template-wrapped variants survive exact dedupe as distinct docs."""
    from build_corpus import build_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    )
    article = docs.orderBy("doc_id").first().text
    wrapped = []
    for host, base in (("mirror-a", 910000), ("mirror-b", 920000)):
        for i in range(4):
            body = article if i == 0 else f"unique {host} story {i} " * 20
            wrapped.append(
                (base + i, f"{host} navigation menu\n{body}\npowered by {host}", host)
            )
    both = docs.unionByName(
        spark.createDataFrame(wrapped, "doc_id long, text string, source string")
    )

    out_off, stats_off = build_corpus(spark, both, token_budget=1_000_000)
    out_on, stats_on = build_corpus(
        spark, both, token_budget=1_000_000, strip_host_col="source"
    )
    assert stats_on["boilerplate_lines_removed"] >= 16  # 2 lines x 8 docs
    ids_on = {r.doc_id for r in out_on.collect()}
    ids_off = {r.doc_id for r in out_off.collect()}
    # with the strip, the two template-wrapped syndicated copies hash
    # equal to each other (and to the original article) in stage 1:
    # only the min-id copy of the article family survives
    assert not {910000, 920000}.issubset(ids_on)
    # without it both wrapped copies survive exact dedupe as distinct
    assert stats_off["after_exact_dedupe"] > stats_on["after_exact_dedupe"]
    # stripped docs carry no template chrome into the pack
    for r in out_on.collect():
        assert "navigation menu" not in r.text and "powered by" not in r.text


def test_build_corpus_domain_gate_and_kn_lm(spark):
    """Domain Wilson gate: a 'source' domain whose docs mostly fail
    the quality gates loses even its survivors; lm_kind='kn' swaps
    stage 5 to Kneser-Ney with the same output schema. Both runs
    deterministic."""
    from build_corpus import build_corpus
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    base, bstats = build_corpus(spark, docs, token_budget=50_000, lm_kind="kn")
    assert "logprob_micronat" in base.columns and bstats["packed_docs"] > 0
    # an aggressive floor (80%) must engage the gate
    gated, gstats = build_corpus(
        spark, docs, token_budget=50_000,
        domain_col="source", domain_floor_ppm=800_000,
    )
    assert "after_domain_gate" in gstats
    assert gstats["after_domain_gate"] <= gstats["after_quality_gates"]
    # determinism
    _, gstats2 = build_corpus(
        spark, docs, token_budget=50_000,
        domain_col="source", domain_floor_ppm=800_000,
    )
    assert gstats == gstats2
