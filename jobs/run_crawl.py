"""spark-submit entry point: run N crawl rounds against on-disk state.

Cluster launch (the north-rule shape — multi-executor, --py-files):

    cd /root/repo && zip -r /tmp/sandcrawler_spark.zip sandcrawler_spark
    spark-submit --master <cluster> \
        --py-files /tmp/sandcrawler_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        jobs/run_crawl.py --corpus-dir <dir> --state-dir <dir> --rounds 5

Local smoke:

    python jobs/run_crawl.py --corpus-dir <dir-with-parquet> \
        --state-dir /tmp/crawl_state --rounds 2

The corpus dir must hold pages/cdx/ingest_request/robots parquet
(generate one with sandcrawler_spark.sources.synth.write_corpus_parquet).
State dir accumulates snapshot tables + the rounds manifest; re-running
resumes from the last committed round (kill-safe).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-dir", required=True)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--master", default=None)
    ap.add_argument("--now", default="timestamp'2024-02-01 00:00:00'")
    ap.add_argument(
        "--adaptive-politeness", action="store_true",
        help="AIMD per-host delay adaptation: fetch outcomes tighten "
        "(429/503) or relax (clean rounds) the robots Crawl-delay floor "
        "for the next round's schedule",
    )
    ap.add_argument(
        "--rank-frontier", action="store_true",
        help="maintain incremental host PageRank from each round's "
        "discovered links and use it to order the frontier queue",
    )
    ap.add_argument(
        "--frontier-cap", type=int, default=None,
        help="with --rank-frontier: cap each round's unseen frontier "
        "to the top-N rows by (priority, host link-rank); the rest "
        "wait for a later round",
    )
    ap.add_argument(
        "--host-budget", type=int, default=None,
        help="cumulative per-host fetch quota enforced across rounds by "
        "the stateful_host_budget streaming operator (over-quota hosts "
        "are deferred; state resumes from the budget checkpoint)",
    )
    ap.add_argument(
        "--circuit-breaker", type=int, nargs=2, default=None,
        metavar=("M", "K"),
        help="per-host failure circuit breaker: a host with M "
        "consecutive all-miss rounds is blacked out for K rounds "
        "(frontier rows deferred, retried after expiry)",
    )
    ap.add_argument(
        "--respect-page-robots", action="store_true",
        help="enforce page-level robots: drop meta-noindex pages from "
        "the extraction store; exclude rel=nofollow links and links "
        "from meta-nofollow pages from the rank-frontier edge store",
    )
    ap.add_argument(
        "--rewrite-moved-hosts", action="store_true",
        help="site-migration rewriting: when a host's observed "
        "redirects concentrate on one destination host, rewrite its "
        "queued frontier rows to the new host before the seen filter",
    )
    ap.add_argument(
        "--ucb-hosts", type=int, default=None,
        help="UCB1 host scheduling: admit only the K best host arms "
        "per round (reward = fetch hit; untried hosts first, then "
        "mean + exploration bonus over the round-versioned cumulative "
        "trial stats; unselected hosts' rows are deferred)",
    )
    ap.add_argument(
        "--discover", action="store_true",
        help="sitemap/feed discovery: fetched bodies that are sitemap "
        "or RSS/Atom XML contribute new ingest requests to the next "
        "round's frontier (persisted; seen-filter still gates)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sandcrawler_spark.streaming.rounds import CrawlRunner

    if args.master:
        from sandcrawler_spark.session import get_spark

        spark = get_spark("sandcrawler_crawl", master=args.master)
    else:
        # under spark-submit the session config comes from --conf flags
        spark = SparkSession.builder.appName("sandcrawler_crawl").getOrCreate()

    corpus = {
        name: spark.read.parquet(os.path.join(args.corpus_dir, f"{name}.parquet"))
        for name in ("pages", "cdx", "ingest_request", "robots")
    }
    runner = CrawlRunner(
        spark, corpus, args.state_dir, now_expr=args.now,
        host_budget=args.host_budget,
        adaptive_politeness=args.adaptive_politeness,
        rank_frontier=args.rank_frontier,
        frontier_cap=args.frontier_cap,
        discover=args.discover,
        circuit_breaker=tuple(args.circuit_breaker) if args.circuit_breaker else None,
        respect_page_robots=args.respect_page_robots,
        rewrite_moved_hosts=args.rewrite_moved_hosts,
        ucb_hosts=args.ucb_hosts,
    )
    done_before = len(runner.rounds_done())
    entries = runner.run(max_rounds=args.rounds)
    print(
        json.dumps(
            {
                "resumed_at_round": done_before,
                "rounds_run": len(entries),
                "entries": entries,
                "metrics": runner.metrics.as_dict(),
            },
            default=str,
        )
    )


if __name__ == "__main__":
    main()
