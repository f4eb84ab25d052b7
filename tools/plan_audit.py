"""Physical-plan audit: assert the plans we designed are the plans we
got. For each audited query: column-pruned parquet scans (ReadSchema
carries only needed columns), filters pushed to the scan, no
CartesianProduct outside the explicitly-allowed list, broadcast joins
where a side is small, and wide WholeStageCodegen coverage.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit code 1 if any invariant fails.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries where an un-keyed broadcast join (planned as
# BroadcastNestedLoopJoin) is by design: cosine_knn broadcasts a 3-row
# query side; ann_ivf broadcasts the ~20-row centroid table for the
# assignment/probe passes. Everything else must be keyed.
ALLOW_BNLJ = {
    "cosine_knn", "ann_lsh", "ann_ivf",
    # r5 session-B 1-row stat broadcasts: link_rot's share-ppm total,
    # purge_propagation's per-table count pairs, kn's global-discount row
    "link_rot", "purge_propagation", "kn_lm_scores",
    # single-row corpus-stat broadcasts (crossJoin of an agg'd
    # 1-row DF): the right plan — the "nested loop" runs once
    "bm25_search", "lm_doc_scores", "sb_lm_scores", "host_budget_alloc",
    "temperature_mix",
    "dsir_weights", "nb_quality", "domain_budget_alloc", "ccnet_buckets",
    # eval queries: exact ground truth needs all-pairs on the tiny
    # fixture (150 docs) + 1-row count crossJoins
    "dedupe_recall", "ann_recall", "lsh_tuning",
    # ADC scan broadcasts the (tiny) LUT-decorated query side un-keyed
    # by design; pq_recall additionally runs the exact-truth scan;
    # ann_ivfpq's coarse assignment broadcasts the centroid table
    # un-keyed (the ann_ivf shape)
    "ann_pq", "pq_recall", "ann_ivfpq", "ann_sq8",
    # centroid-table broadcast assignment (the ann_ivf shape) + 1-row
    # temperature total
    "topic_balance",
    # 1-row corpus-anchor crossJoin onto the synthetic window table
    # (the interval join itself is a bucketed equi-join)
    "interval_join",
    # stratum-pair expansion is a |strata| x |strata| crossJoin of the
    # DISTINCT stratum list (synopsis-sized, never the corpus)
    "stratum_overlap",
    # 1-row stat broadcasts: UCB total-trials row + k-th-key row onto
    # the per-host table; gini runs two water-filling 1-row crossJoins
    "ucb_frontier", "alloc_fairness",
    # 1-row totals crossJoin onto the synopsis-sized per-source table
    "mixture_epochs",
    # anchor-set broadcast (the cosine_knn shape): ~10 query rows
    # crossed un-keyed onto the corpus, banded + two-level top-k after
    "hard_negatives",
    # 1-row stat broadcasts (corpus stats + the k-th-score theta row)
    # onto the query-term-filtered tf relation — the bm25_search shape
    "maxscore_topk",
    # wraps nb_quality (its 1-row prior crossJoins) with a bin rollup
    "nb_calibration",
    # bm25 over the anchor index: the bm25_search 1-row stat shape
    "anchor_search",
}

AUDIT = [
    "lineitem_rollup", "status_counts", "politeness_schedule", "seen_antijoin",
    "seen_bloom", "best_capture", "paper_filter_slice", "tarball_filter_slice",
    "fingerprint_dedupe", "jaccard_pairs", "minhash_lsh", "simhash_pairs",
    "cosine_knn", "embedding_neardup", "token_counts", "winnow_fingerprints",
    "recrawl_frontier", "sha1_digest_join", "union_lanes", "score_insertable",
    "batch_dedupe_latest", "html_biblio", "sub_resources", "ann_ivf",
    "ann_lsh_multiprobe", "robots_parse", "politeness_delay",
    "gopher_repetition", "paragraph_dedupe", "pii_scrub", "warc_roundtrip",
    "benchmark_decontaminate", "warc_fetch_join", "corpus_sample",
    "seen_cuckoo", "outlink_edges", "link_depth", "host_pagerank",
    "frontier_rank_blend", "hll_host_cardinality", "span_dedupe",
    "cms_part_counts", "postings_stats", "bm25_search", "lm_doc_scores",
    "user_sessions", "bpe_merges", "event_quantiles", "host_budget_alloc",
    "cumulative_events", "corpus_pack", "dedupe_recall", "phrase_search",
    "cms_heavy_hitters", "sitemap_roundtrip", "temperature_mix", "url_traps",
    "backlink_features", "recrawl_rates", "shard_assign",
    "incremental_pagerank", "adaptive_delay", "hyperball_centrality",
    "histogram_quantiles", "dsir_weights", "anchor_texts", "zorder_prune",
    "trust_rank", "reciprocal_links", "c4_line_filters", "nb_quality",
    "feed_roundtrip", "robots_match", "soft404", "registered_domain",
    "bpe_encode", "fix_mojibake", "domain_budget_alloc", "host_communities",
    "context_pack", "containment_pairs", "ccnet_buckets", "nfc_normalize",
    "line_dedupe", "pq_codes", "ann_pq", "pq_recall",
    "host_triangles", "weighted_sample", "dust_rules", "host_hits",
    "host_boilerplate", "boilerplate_strip", "semantic_dedupe", "corpus_split", "host_kcore", "topic_balance", "corpus_diagnostics", "community_modularity", "dust_apply", "script_profile", "corpus_manifest", "host_coupling", "page_robots", "nofollow_outlinks", "quality_fusion", "lang_profile",
    "kmv_host_cardinality", "sb_lm_scores", "weighted_sample_stratified",
    "kmv_overlap",
    # r4 session-6 (seed_cover excluded: its result is a k-row
    # driver-assembled relation, no scan to audit)
    "spam_mass", "bowtie_classes", "readability", "tfidf_keywords",
    "cdc_chunks", "capture_recapture", "url_badwords",
    # (embedding_pca excluded for the same reason as seed_cover: the
    # distributed phase feeds a driver-assembled d-row result)
    "snapshot_diff", "novelty_curve", "source_diversity",
    "degree_distribution",
    # r4 session-7
    "opic_scores", "adamic_adar", "char_entropy", "token_drift", "zipf_fit",
    # r4 session-8
    "salsa_scores", "degree_assortativity", "interval_join",
    "event_transitions", "rate_anomalies", "soft_dedupe_weights",
    "hll_sliding", "host_mirrors", "ewma_trend", "ann_ivfpq",
    "pct_normalize", "stratum_overlap", "distance_profile", "hreflang_pairs", "meta_refresh", "host_moves", "crawl_capacity",
    "topic_affinity", "shard_cut", "community_shard_cut",
    # r4 session-8: close the audit gap — every queries() entry audited
    "ann_lsh", "ann_recall", "asof_closest", "canonical_aliases",
    "embedding_pca", "extraction_roundtrip", "fetch_statuses",
    "grobid_hook", "hit_rate_stats", "lang_pred_counts", "mime_sniff",
    "multimodal_meta", "neardup_dedupe", "politeness_timing",
    "quality_scores", "revisit_resolution", "seed_cover",
    "slug_self_join", "surt_canonical", "surt_seed_join", "word_counts",
    # r4 session-9
    "ucb_frontier", "pagination_gaps", "alloc_fairness",
    "revalidation_savings", "host_ktruss", "wet_roundtrip",
    "bpe_coverage", "sitemap_recrawl", "reshard_churn", "ann_sq8",
    "host_wcc", "lang_mismatch", "pagination_fill", "frontier_aging",
    "sketch_accuracy", "host_branching", "retry_after", "ring_balance",
    "seen_sizing",
    # r4 session-10
    "tag_density", "title_dupes", "meta_tags", "postings_compression",
    "frontier_merge", "outlink_entropy", "circuit_breaker", "wat_export",
    "lsh_tuning", "robots_coverage", "mixture_epochs", "cdx_export",
    "dup_cluster_histogram", "anchor_stuffing", "capture_coverage",
    "keep_longest_dedupe", "robots_delta",
    # r4 session-11
    "frame_sample", "media_resize", "ip_politeness", "crawl_lineage",
    # r4 session-12
    "dhash_images", "audio_chunks", "cdn_politeness", "scd2_history",
    "template_clusters",
    # r4 session-13
    "skew_advisor", "warc_cdx_audit",
    # r4 session-14 (kcenter_select excluded: k-row driver-assembled
    # relation like seed_cover)
    "redirect_resolution", "fuzzy_url_join", "pmi_pairs", "cache_headers",
    # r4 session-15
    "subdomain_traps", "nepotistic_links", "hard_negatives", "charset_sniff",
    # r4 session-16
    "identifier_extract", "image_dims", "maxscore_topk", "html_blocks",
    "textrank_keywords", "url_resolve", "unigram_segment", "jsonld_meta",
    "lang_segments", "recrawl_allocation", "parked_domains", "longest_repeat",
    "tracker_hosts", "bbit_minhash", "table_markdown", "url_taxonomy",
    "capture_drift", "outlink_resolved", "http_dates", "arc_roundtrip",
    "gopher_quality", "seen_compare", "nb_calibration", "anchor_search",
    "warc_revisit_write", "https_upgrade",
    # r5 session-B
    "oai_harvest", "sentence_stats", "robots_cache", "kn_lm_scores",
    "domain_quality", "cdx_collapse", "feed_discovery", "link_rot",
    "purge_propagation", "temporal_split", "cdxj_roundtrip",
    "warc_segments", "timemap", "arc2warc",
]


def audit_one(name: str, df) -> list[str]:
    # execute THIS df's own QueryExecution first (a .count() would spawn
    # a different one): under AQE only the executed plan shows the final
    # stages with their codegen annotations
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_BNLJ:
        problems.append("BroadcastNestedLoopJoin outside allowlist")
    # every parquet scan should be column-pruned: flag scans reading >12 cols
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c for c in m.group(1).split(",") if c]
        if len(cols) > 12:
            problems.append(f"wide scan ({len(cols)} cols): {m.group(1)[:80]}...")
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    n_codegen = len(re.findall(r"codegen id : \d+", plan))
    if n_codegen == 0:
        problems.append("no codegen'd operator in plan")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as em
    from sandcrawler_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = em.queries()
    failures = 0
    for name in AUDIT:
        if only and name not in only:
            continue
        df = qs[name](spark, sf_dir)
        problems = audit_one(name, df)
        status = "OK " if not problems else "BAD"
        print(f"{status}  {name}" + ("" if not problems else "  " + "; ".join(problems)))
        failures += bool(problems)
    print(f"plan failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
