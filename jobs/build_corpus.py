"""spark-submit entry point: end-to-end LLM training-corpus build.

Chains the engine's training-data operators into the standard web-text
pipeline shape (C4/Gopher/CCNet lineage): exact dedupe → near-dup
dedupe (MinHash-LSH + connected components) → Gopher repetition
filters + quality gate → PII redaction → bigram-LM scoring →
token-budget packing — and writes the packed corpus as parquet plus a
one-line JSON stats report with per-stage lineage counts (the
accumulator-metrics contract the crawl jobs follow).

Cluster launch:

    cd /root/repo && zip -r /tmp/sandcrawler_spark.zip sandcrawler_spark
    spark-submit --master <cluster> \
        --py-files /tmp/sandcrawler_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        jobs/build_corpus.py --sf-dir <dir> --out <dir> --token-budget 1000000

Local smoke:

    python jobs/build_corpus.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/corpus_out --token-budget 20000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    token_budget: int,
    min_quality: float = 0.25,
    max_dup_line_frac: float = 0.3,
    max_top_ngram_char_frac: float = 0.2,
    max_dup_ngram_word_frac: float = 0.3,
    dsir_target_lang: str | None = None,
    dsir_keep_frac: float = 0.5,
    fix_encoding: bool = True,
    dedupe_lines: bool = False,
    strip_host_col: str | None = None,
    domain_col: str | None = None,
    domain_floor_ppm: int | None = None,
    lm_kind: str = "bigram",
) -> tuple[DataFrame, dict]:
    """Run the pipeline over docs(doc_id, text[, lang]); returns
    (packed DataFrame, stage-count stats). Deterministic end to end.

    dsir_target_lang: when set (and docs carry a lang column), insert
    a DSIR selection stage after PII redaction — hashed-ngram
    importance weights toward the target-language slice, keeping the
    top ceil(dsir_keep_frac * n) docs by (weight desc, doc_id), a
    distributed TakeOrdered.

    domain_col + domain_floor_ppm: when both set, insert a DOMAIN
    Wilson gate after the per-doc quality gates — the per-doc
    pass/fail outcome of stage 3 is rolled up per domain_col value
    (diagnostics.wilson_domain_rollup) and every doc from a domain
    whose Wilson lower bound is below domain_floor_ppm is dropped,
    the RefinedWeb-style curation move: a domain whose evidence says
    it mostly ships junk loses even its lucky survivors.

    lm_kind: 'bigram' (add-k, the default) or 'kn' (interpolated
    Kneser-Ney) — which LM scores the surviving corpus in stage 5;
    both emit the same (n_bigrams, logprob_micronat) schema."""
    from sandcrawler_spark.functions.pii import redact_pii_col
    from sandcrawler_spark.functions.repetition import gopher_repetition
    from sandcrawler_spark.functions.textstats import quality_score_col, word_count_col
    from sandcrawler_spark.operators.cumsum import global_cumsum
    from sandcrawler_spark.operators.dedupe import exact_dedupe, neardup_dedupe
    from sandcrawler_spark.operators.lm import lm_score_docs, train_bigram_lm

    stats = {"input": docs.count()}

    # 0. encoding repair BEFORE dedupe: a cp1252-mojibake variant of a
    # clean page must collapse into the same exact-dedupe fingerprint,
    # not survive as a distinct near-dup (functions/encoding.py; the
    # repair is a no-op on clean text, so the stage is safe-by-default)
    if fix_encoding:
        from sandcrawler_spark.functions.encoding import fix_mojibake_col

        d0 = docs.withColumn("_fixed", fix_mojibake_col(F.col("text")))
        d0 = (
            d0.withColumn("_repaired", (F.col("_fixed") != F.col("text")).cast("long"))
            .withColumn("text", F.col("_fixed"))
            .drop("_fixed")
            .localCheckpoint(eager=True)
        )
        stats["encoding_repaired"] = (
            d0.agg(F.coalesce(F.sum("_repaired"), F.lit(0))).collect()[0][0]
        )
        docs = d0.drop("_repaired")

    # 0.5 (optional) cross-document boilerplate strip BEFORE dedupe:
    # removing each host's shared template first means two copies of
    # one article on different hosts hash equal in stage 1, and the
    # quality/repetition gates judge content, not chrome
    if strip_host_col is not None and strip_host_col in docs.columns:
        from sandcrawler_spark.operators.boilerplate import (
            host_boilerplate_lines,
            strip_boilerplate,
        )

        bp = host_boilerplate_lines(docs, host_col=strip_host_col, id_col="doc_id")
        sb = strip_boilerplate(
            docs, bp, host_col=strip_host_col, id_col="doc_id"
        ).localCheckpoint(eager=True)
        stats["boilerplate_lines_removed"] = (
            sb.agg(F.coalesce(F.sum("n_removed"), F.lit(0))).collect()[0][0]
        )
        docs = docs.drop("text").join(sb.select("doc_id", "text"), on="doc_id")

    # 1. exact dedupe: keep the min-id representative per fingerprint
    reps = exact_dedupe(docs).select("doc_id")
    d1 = docs.join(reps, on="doc_id", how="left_semi").localCheckpoint(eager=True)
    stats["after_exact_dedupe"] = d1.count()

    # 2. near-dup dedupe (LSH block -> verify -> CC -> representative)
    nd = neardup_dedupe(d1)
    keep = nd.filter(F.col("is_rep")).select(F.col("doc_id"))
    d2 = d1.join(keep, on="doc_id", how="left_semi").localCheckpoint(eager=True)
    stats["after_neardup_dedupe"] = d2.count()

    # 2.5 (optional) within-doc line dedup BEFORE the repetition gate:
    # a good article wrapped in repeated nav/cookie boilerplate would
    # otherwise trip dup_line_frac and be dropped whole — collapse the
    # boilerplate to its first occurrence and let the content through
    if dedupe_lines:
        from sandcrawler_spark.operators.dedupe import dedupe_lines_within_doc

        ld = dedupe_lines_within_doc(d2).localCheckpoint(eager=True)
        stats["lines_removed"] = (
            ld.agg(F.coalesce(F.sum("n_removed"), F.lit(0))).collect()[0][0]
        )
        d2 = d2.drop("text").join(ld.select("doc_id", "text"), on="doc_id")

    # 3. repetition + quality gates (Gopher-style)
    rep = gopher_repetition(d2)  # top_n=2, dup_n=5 defaults
    bad = rep.filter(
        (F.col("dup_line_frac") > max_dup_line_frac)
        | (F.col("top_2gram_char_frac") > max_top_ngram_char_frac)
        | (F.col("dup_5gram_word_frac") > max_dup_ngram_word_frac)
    ).select("doc_id")
    d3 = (
        d2.join(bad, on="doc_id", how="left_anti")
        .withColumn("q_micro", F.round(quality_score_col(F.col("text")) * 1_000_000).cast("long"))
        .filter(F.col("q_micro") >= int(min_quality * 1_000_000))
        .localCheckpoint(eager=True)
    )
    stats["after_quality_gates"] = d3.count()

    # 3.5 (optional) domain-level Wilson gate: judge DOMAINS by their
    # stage-3 outcomes, then drop whole domains below the floor
    if domain_col is not None and domain_floor_ppm is not None and domain_col in docs.columns:
        from sandcrawler_spark.operators.diagnostics import wilson_domain_rollup

        verdicts = d2.select("doc_id", F.col(domain_col).alias("_dom")).join(
            d3.select("doc_id", F.lit(True).alias("_pass")), on="doc_id", how="left"
        ).select("_dom", F.coalesce("_pass", F.lit(False)).alias("passed"))
        bad_domains = (
            wilson_domain_rollup(verdicts, "_dom", "passed")
            .filter(F.col("wilson_lb_ppm") < int(domain_floor_ppm))
            .select(F.col("domain").alias(domain_col))
        )
        d3 = d3.join(bad_domains, on=domain_col, how="left_anti").localCheckpoint(
            eager=True
        )
        stats["after_domain_gate"] = d3.count()

    # 4. PII redaction (byte-level, deterministic)
    d4 = d3.withColumn("text", redact_pii_col(F.col("text")))

    # 4.5 (optional) DSIR selection toward a target distribution
    if dsir_target_lang is not None and "lang" in d4.columns:
        import math

        from sandcrawler_spark.operators.dsir import dsir_weights

        target = d4.filter(F.col("lang") == dsir_target_lang)
        w = dsir_weights(d4, target)
        n4 = d4.count()
        k = max(1, math.ceil(dsir_keep_frac * n4))
        kept = (
            w.orderBy(F.col("logratio_micronat").desc(), F.col("doc_id").asc())
            .limit(k)
            .select("doc_id")
        )
        d4 = d4.join(kept, on="doc_id", how="left_semi").localCheckpoint(eager=True)
        stats["after_dsir"] = d4.count()

    # 5. LM scoring over the surviving corpus (attached, not a gate —
    # downstream consumers pick their own perplexity cut)
    if lm_kind == "kn":
        from sandcrawler_spark.operators.lm import kn_score_docs, train_kneser_ney

        kbi, kctx, kcont, kglob = train_kneser_ney(d4)
        scored = kn_score_docs(d4, kbi, kctx, kcont, kglob).withColumnRenamed(
            "kn_micronat", "logprob_micronat"
        )
    else:
        bi, uni, vocab = train_bigram_lm(d4)
        scored = lm_score_docs(d4, bi, uni, vocab)
    d5 = d4.join(scored, on="doc_id").withColumn(
        "n_tokens", word_count_col(F.col("text")).cast("long")
    )

    # 6. token-budget packing by quality rank
    packed = global_cumsum(
        d5,
        [F.col("q_micro").desc(), F.col("doc_id").asc()],
        "n_tokens",
        out_col="cum_tokens",
    ).filter(F.col("cum_tokens") <= token_budget)
    out = packed.select(
        "doc_id", "text", "q_micro", "n_tokens", "cum_tokens",
        "n_bigrams", "logprob_micronat",
    ).localCheckpoint(eager=True)
    stats["packed_docs"] = out.count()
    stats["packed_tokens"] = (
        out.agg(F.coalesce(F.sum("n_tokens"), F.lit(0))).collect()[0][0]
    )
    return out, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--token-budget", type=int, default=1_000_000)
    ap.add_argument("--min-quality", type=float, default=0.25)
    ap.add_argument(
        "--dsir-target-lang", default=None,
        help="enable the DSIR selection stage toward this language's "
        "hashed-ngram distribution",
    )
    ap.add_argument("--dsir-keep-frac", type=float, default=0.5)
    ap.add_argument(
        "--no-fix-encoding", action="store_true",
        help="skip the stage-0 mojibake repair",
    )
    ap.add_argument(
        "--strip-boilerplate", action="store_true",
        help="mine + strip per-source template lines (>=50%% doc "
        "frequency) before dedupe",
    )
    ap.add_argument(
        "--dedupe-lines", action="store_true",
        help="collapse repeated lines within each doc (boilerplate) "
        "before the repetition gate",
    )
    ap.add_argument(
        "--domain-floor-ppm", type=int, default=None,
        help="enable the domain Wilson gate: drop every doc from a "
        "'source' domain whose Wilson lower bound of passing the "
        "quality gates is below this (ppm)",
    )
    ap.add_argument(
        "--lm-kind", choices=["bigram", "kn"], default="bigram",
        help="stage-5 LM: add-k bigram or interpolated Kneser-Ney",
    )
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from sandcrawler_spark.session import get_spark

    spark = get_spark("build_corpus", master=f"local[{args.cpus}]")
    need_source = args.strip_boilerplate or args.domain_floor_ppm is not None
    cols = ["doc_id", "text", "lang"] + (["source"] if need_source else [])
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(*cols)
    out, stats = build_corpus(
        spark, docs, token_budget=args.token_budget, min_quality=args.min_quality,
        dsir_target_lang=args.dsir_target_lang, dsir_keep_frac=args.dsir_keep_frac,
        fix_encoding=not args.no_fix_encoding,
        dedupe_lines=args.dedupe_lines,
        strip_host_col="source" if args.strip_boilerplate else None,
        domain_col="source" if args.domain_floor_ppm is not None else None,
        domain_floor_ppm=args.domain_floor_ppm,
        lm_kind=args.lm_kind,
    )
    out.write.mode("overwrite").parquet(os.path.join(args.out, "corpus"))
    stats["out"] = args.out
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
