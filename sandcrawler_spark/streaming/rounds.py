"""The crawl-round driver: frontier -> seen-filter -> politeness ->
fetch-simulate -> extract -> persist, resumable per round.

This is the Spark restatement of the reference's streaming ingest
loop (SURVEY.md §3.1): one round == one Kafka micro-batch; the
"offset store" (workers.py:558-561) becomes the rounds manifest +
snapshot ids of the state tables, so a killed run resumes at the next
round with identical results (tested: run(2)+run(2) == run(4)).

Per-round lineage (seed -> frontier -> scheduled -> fetched ->
extracted counts + snapshot ids) is recorded in rounds.json and in
each table snapshot's lineage blob — the per-partition lineage the
north rule asks for lives at round granularity here, partition
granularity at the table layer (parquet file stats).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandcrawler_spark.functions.biblio import biblio_udf
from sandcrawler_spark.functions.extract_text import extract_text_udf
from sandcrawler_spark.functions.hashes import with_file_meta
from sandcrawler_spark.operators.fetch import fetch_simulate
from sandcrawler_spark.operators.frontier import build_frontier
from sandcrawler_spark.operators.politeness import schedule_politeness
from sandcrawler_spark.operators.seen import unseen_exact
from sandcrawler_spark.plans.tables import CrawlMetrics, SnapshotTable


class CrawlRunner:
    def __init__(
        self,
        spark: SparkSession,
        corpus: dict[str, DataFrame],
        state_dir: str,
        now_expr: str = "timestamp'2024-02-01 00:00:00'",
        denylist: list[str] | None = None,
        host_budget: int | None = None,
        adaptive_politeness: bool = False,
        rank_frontier: bool = False,
        frontier_cap: int | None = None,
        discover: bool = False,
        soft404_filter: bool = False,
        circuit_breaker: tuple[int, int] | None = None,
        respect_page_robots: bool = False,
        rewrite_moved_hosts: bool = False,
        ucb_hosts: int | None = None,
    ):
        self.spark = spark
        self.corpus = corpus
        self.state_dir = state_dir
        self.now_expr = now_expr
        # §2.8 backpressure ENFORCEMENT (not just validation): when
        # set, a per-host cumulative cap on scheduled fetch attempts,
        # tracked across rounds by the stateful_host_budget streaming
        # operator (streaming/eventtime.py) — the Spark-native twin of
        # the reference's per-host backpressure (workers.py:534-554).
        self.host_budget = host_budget
        # AIMD per-host delay adaptation (operators/politeness.py
        # adapt_crawl_delays): each round's fetch outcomes update a
        # per-host delay table that tightens (429/503) or relaxes
        # (clean rounds) the robots Crawl-delay floor for the NEXT
        # round's schedule. Delay tables are versioned per round under
        # the state dir, so a crashed round's re-run reads the same
        # prior state it read the first time.
        self.adaptive_politeness = adaptive_politeness
        # Continuous-crawl link-rank maintenance: each round's fetched
        # pages contribute host edges to a cumulative host graph; ranks
        # are warm-started from the previous round (incremental
        # PageRank, operators/linkgraph.py) and — when frontier_cap is
        # set — decide WHICH frontier rows make the round when the
        # frontier outgrows the cap (the north star's priority frontier
        # queue: request priority first, then discovered link mass).
        # Both stores are round-versioned like adaptive_delays, so a
        # crashed round replays against the same prior state.
        self.rank_frontier = rank_frontier
        self.frontier_cap = frontier_cap
        # Sitemap/feed discovery channel: fetched bodies that are
        # sitemap or RSS/Atom XML contribute new ingest requests to
        # the NEXT round's frontier (functions/sitemaps.py,
        # functions/feeds.py). Discovered rows persist in a snapshot
        # table keyed by (ingest_type, base_url) with on_conflict
        # nothing, so a crashed round's replay re-merges the same rows
        # idempotently and the seen-filter still gates re-fetches.
        self.discover = discover
        # Soft-404 gate (functions/soft404.py): HTTP-200 pages whose
        # EXTRACTED content is an error page are reclassified to
        # status 'soft404' (hit=False) and kept out of the extraction
        # corpus — content-level junk the status taxonomy can't see.
        self.soft404_filter = soft404_filter
        # Per-host failure circuit breaker (m, k): a host whose
        # scheduled fetches produce zero hits for m CONSECUTIVE rounds
        # is blacked out for the next k rounds (its frontier rows are
        # deferred, not dropped — they re-enter when the blackout
        # expires). A dead origin otherwise burns quota every round
        # forever; AIMD (adaptive_politeness) slows a STRUGGLING host,
        # the breaker stops a DEAD one. State is round-versioned like
        # adaptive_delays, replay-stable.
        self.circuit_breaker = circuit_breaker
        # Page-level robots enforcement (functions/pagerobots.py): a
        # meta-robots noindex page is fetched (politeness happens at
        # robots.txt level) but its extraction is DROPPED from the
        # store, and link discovery for the rank frontier excludes
        # rel=nofollow edges and all edges out of meta-nofollow pages.
        self.respect_page_robots = respect_page_robots
        # Site-migration rewriting (operators/linkgraph.py host_moves):
        # cross-host redirects observed by the fetch loop accumulate in
        # a round-versioned (src_host, dst_host, n_pair) count store;
        # once a host's redirects concentrate on ONE destination
        # (>=80% share, >=5 observations) its queued frontier rows are
        # rewritten to the new host BEFORE the seen filter — one
        # host-level decision instead of rediscovering the move URL by
        # URL through redirect hops every round.
        self.rewrite_moved_hosts = rewrite_moved_hosts
        # UCB1 host scheduling (operators/bandit.py): treat each host
        # as a bandit arm (reward = fetch hit) and admit only the
        # ucb_hosts best arms per round — untried hosts first (UCB's
        # init phase: every arm once), then by mean + exploration
        # bonus over the CUMULATIVE per-host trial history, which is
        # round-versioned like adaptive_delays (replay-stable).
        # Unselected hosts' rows are deferred, not dropped — they stay
        # unseen and re-enter the frontier; UCB guarantees every arm
        # with pending work is eventually re-selected (its bonus grows
        # with ln of total trials while untouched).
        self.ucb_hosts = ucb_hosts
        # F9: poison-pill content hashes skipped before every extraction
        # (BAD_PDF_SHA1HEX analog, pdfextract.py:19-146)
        self.denylist = list(denylist or [])
        os.makedirs(state_dir, exist_ok=True)
        self.discovered = SnapshotTable(
            spark, os.path.join(state_dir, "discovered"), ["ingest_type", "base_url"]
        )
        self.results = SnapshotTable(spark, os.path.join(state_dir, "ingest_file_result"), ["ingest_type", "base_url"])
        self.seen = SnapshotTable(spark, os.path.join(state_dir, "url_seen"), ["canon_url"])
        self.extraction = SnapshotTable(spark, os.path.join(state_dir, "extraction"), ["sha1hex"])
        self.metrics = CrawlMetrics(spark)

    # ---- round manifest -------------------------------------------------
    @property
    def _rounds_path(self) -> str:
        return os.path.join(self.state_dir, "rounds.json")

    def rounds_done(self) -> list[dict]:
        if not os.path.exists(self._rounds_path):
            return []
        with open(self._rounds_path) as f:
            return json.load(f)

    def _record_round(self, entry: dict) -> None:
        rounds = self.rounds_done()
        rounds.append(entry)
        tmp = self._rounds_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rounds, f, indent=1)
        os.replace(tmp, self._rounds_path)

    # ---- round-versioned side stores --------------------------------------
    def _versioned_dir(self, sub: str, r: int) -> str:
        return os.path.join(self.state_dir, sub, f"round={r}")

    def _read_versioned(self, sub: str, schema: str, r: int) -> DataFrame | None:
        """Latest version of a round-versioned store at or before round
        r (None if never written). A crashed round's re-run reads the
        same prior state it read the first time."""
        for back in range(r, -1, -1):
            p = self._versioned_dir(sub, back)
            if os.path.isdir(p):
                return self.spark.read.schema(schema).parquet(p)
        return None

    # ---- adaptive politeness ----------------------------------------------
    def _delays_dir(self, r: int) -> str:
        return self._versioned_dir("adaptive_delays", r)

    def _read_delays(self, r: int) -> DataFrame | None:
        """Delay table as of the END of round r (None before round 0)."""
        return self._read_versioned(
            "adaptive_delays", "host string, crawl_delay_ms long", r
        )

    def _robots_with_adaptive_delays(self, r: int) -> DataFrame:
        """Robots dimension with crawl_delay_s raised to the adaptive
        per-host delay where one is tracked (the adaptive layer only
        ever ADDS caution over the robots floor)."""
        robots = self.corpus["robots"]
        delays = self._read_delays(r - 1)
        if delays is None:
            return robots
        adaptive_s = F.col("crawl_delay_ms") / F.lit(1000.0)
        return (
            robots.join(F.broadcast(delays), on="host", how="left")
            .withColumn(
                "crawl_delay_s",
                F.when(
                    F.col("crawl_delay_ms").isNotNull(),
                    F.greatest(F.coalesce(F.col("crawl_delay_s"), F.lit(0.0)), adaptive_s),
                ).otherwise(F.col("crawl_delay_s")),
            )
            .drop("crawl_delay_ms")
        )

    def _update_delays(self, results: DataFrame, batch: DataFrame, r: int) -> None:
        """Fold this round's outcomes into the delay table (AIMD) and
        version it under round=r (idempotent overwrite on replay)."""
        from sandcrawler_spark.functions.urls import host_col
        from sandcrawler_spark.operators.politeness import adapt_crawl_delays

        prior = self._read_delays(r - 1)
        hosts = batch.select("host").distinct()
        if prior is None:
            current = hosts.withColumn("crawl_delay_ms", F.lit(1000).cast("long"))
        else:
            current = (
                hosts.join(prior, on="host", how="left")
                .select(
                    "host",
                    F.coalesce("crawl_delay_ms", F.lit(1000)).cast("long").alias("crawl_delay_ms"),
                )
                .unionByName(prior.join(hosts, on="host", how="left_anti"))
            )
        obs = results.select(
            host_col(F.col("base_url")).alias("host"),
            F.col("terminal_status_code").alias("status_code"),
        )
        adapt_crawl_delays(obs, current).write.mode("overwrite").parquet(
            self._delays_dir(r)
        )

    # ---- site-migration rewriting ----------------------------------------
    _MOVES_SCHEMA = "src_host string, dst_host string, n_pair long"

    def _update_moves(self, results: DataFrame, r: int) -> None:
        """Fold this round's observed cross-host redirects into the
        cumulative (src_host, dst_host) count store, versioned at
        round=r (counts SUM-merge; replay of round r rereads the same
        round r-1 state and recomputes the same table)."""
        hp = r"^https?://([^/]+)"
        obs = (
            results.filter(F.col("terminal_url").isNotNull())
            .select(
                F.regexp_extract("base_url", hp, 1).alias("src_host"),
                F.regexp_extract("terminal_url", hp, 1).alias("dst_host"),
            )
            .filter(
                (F.col("src_host") != "")
                & (F.col("dst_host") != "")
                & (F.col("src_host") != F.col("dst_host"))
            )
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("long").alias("n_pair"))
        )
        prior = self._read_versioned("redirect_moves", self._MOVES_SCHEMA, r - 1)
        cur = obs if prior is None else (
            obs.unionByName(prior)
            .groupBy("src_host", "dst_host")
            .agg(F.sum("n_pair").cast("long").alias("n_pair"))
        )
        cur.write.mode("overwrite").parquet(self._versioned_dir("redirect_moves", r))

    def _apply_moves(self, frontier: DataFrame, r: int):
        """Rewrite frontier rows whose host has MOVED (host_moves
        verdict over the cumulative redirect counts) to the
        destination host, then re-dedupe by canonical URL (a rewritten
        row may now collide with a native row for the same target).
        Runs BEFORE the seen filter, so a rewritten URL that was
        already fetched under its new host is dropped like any other
        seen URL. Returns (frontier, n_rewritten)."""
        from pyspark.sql import Window

        from sandcrawler_spark.functions.urls import surt_udf
        from sandcrawler_spark.operators.linkgraph import host_moves_from_counts

        state = self._read_versioned("redirect_moves", self._MOVES_SCHEMA, r - 1)
        if state is None:
            return frontier, 0
        moves = (
            host_moves_from_counts(state)
            .filter(F.col("moved"))
            .select(F.col("src_host").alias("host"), F.col("dst_host"))
        )
        j = frontier.join(F.broadcast(moves), on="host", how="left")
        hit = F.col("dst_host").isNotNull()
        # '://old-host/' -> '://new-host/': canonical URLs always carry
        # a path slash (clean_url), so the delimiter-bounded replace
        # touches only the authority
        rewrite = lambda c: F.when(  # noqa: E731
            hit,
            F.expr(
                f"replace({c}, '://' || host || '/', '://' || dst_host || '/')"
            ),
        ).otherwise(F.col(c))
        out = (
            j.withColumn("_moved", hit)
            .withColumn("base_url", rewrite("base_url"))
            .withColumn("canon_url", rewrite("canon_url"))
            .withColumn("url", rewrite("url"))
            .withColumn("host", F.when(hit, F.col("dst_host")).otherwise(F.col("host")))
            .withColumn("surt", F.when(hit, surt_udf(F.col("canon_url"))).otherwise(F.col("surt")))
            .drop("dst_host")
        )
        n_moved = out.filter(F.col("_moved")).count()
        if n_moved:
            w = Window.partitionBy("ingest_type", "canon_url").orderBy(
                F.desc("priority"), F.asc("base_url")
            )
            out = (
                out.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            self.metrics.inc("moved_hosts_rewritten", n_moved)
        return out.drop("_moved"), n_moved

    # ---- failure circuit breaker -------------------------------------------
    _BREAKER_SCHEMA = "host string, fail_streak long, blackout_until long"

    def _read_breaker(self, r: int) -> DataFrame | None:
        return self._read_versioned("breaker", self._BREAKER_SCHEMA, r)

    def _apply_breaker(self, batch: DataFrame, r: int):
        """Defer every batch row whose host is blacked out at round r.
        Returns (admitted, n_deferred). Deferred rows were never
        fetched, so they stay unseen and re-enter the frontier when
        the blackout expires."""
        state = self._read_breaker(r - 1)
        if state is None:
            return batch, 0
        blocked = state.filter(F.col("blackout_until") >= r).select("host")
        admitted = batch.join(F.broadcast(blocked), on="host", how="left_anti")
        n_deferred = batch.count() - admitted.count()
        self.metrics.inc("breaker_deferred", n_deferred)
        return admitted, n_deferred

    def _update_breaker(self, results: DataFrame, r: int) -> None:
        """Fold this round's outcomes into the breaker table: a host
        with >= 1 hit resets its streak; an all-miss host increments
        it; at m the breaker trips (blackout_until = r + k, streak
        reset). Untouched hosts carry forward. Versioned under
        round=r (idempotent overwrite on replay)."""
        from sandcrawler_spark.functions.urls import host_col

        m, k = self.circuit_breaker
        prior = self._read_breaker(r - 1)
        per_host = results.groupBy(
            host_col(F.col("base_url")).alias("host")
        ).agg(F.max(F.col("hit").cast("int")).alias("_any_hit"))
        if prior is not None:
            joined = per_host.join(prior, on="host", how="left")
        else:
            joined = per_host.withColumn("fail_streak", F.lit(None).cast("long")).withColumn(
                "blackout_until", F.lit(None).cast("long")
            )
        streak = F.when(F.col("_any_hit") == 1, F.lit(0)).otherwise(
            F.coalesce(F.col("fail_streak"), F.lit(0)) + 1
        )
        tripped = streak >= m
        updated = joined.select(
            "host",
            F.when(tripped, F.lit(0)).otherwise(streak).cast("long").alias("fail_streak"),
            F.when(tripped, F.lit(r + k))
            .otherwise(F.coalesce(F.col("blackout_until"), F.lit(-1)))
            .cast("long")
            .alias("blackout_until"),
        )
        if prior is not None:
            carried = prior.join(per_host.select("host"), on="host", how="left_anti")
            updated = updated.unionByName(carried)
        updated.write.mode("overwrite").parquet(self._versioned_dir("breaker", r))

    # ---- UCB1 host scheduling ----------------------------------------------
    _UCB_SCHEMA = "host string, n_trials long, n_success long"

    def _read_ucb(self, r: int) -> DataFrame | None:
        return self._read_versioned("ucb_stats", self._UCB_SCHEMA, r)

    def _apply_ucb(self, batch: DataFrame, r: int):
        """Admit only the ucb_hosts best host arms this round:
        never-tried hosts first (host-asc for determinism — UCB1's
        try-every-arm-once init), remaining slots by
        (ucb_micro DESC, host ASC) over the cumulative stats. Returns
        (admitted, n_deferred)."""
        from sandcrawler_spark.operators.bandit import MICRO, isqrt_col

        k = self.ucb_hosts
        hosts = batch.select("host").distinct()
        state = self._read_ucb(r - 1)
        if state is None:
            chosen = hosts.orderBy("host").limit(k)
        else:
            tried = hosts.join(state, on="host", how="inner")
            untried = hosts.join(state.select("host"), on="host", how="left_anti")
            n_untried = untried.count()
            chosen = untried.orderBy("host").limit(k).select("host")
            slots = k - n_untried
            if slots > 0:
                # N = total trials in the whole state (the bandit's
                # clock), not just this batch's hosts
                tot = state.agg(F.sum("n_trials").cast("long").alias("_n_total"))
                scored = (
                    tried.crossJoin(F.broadcast(tot))
                    .withColumn(
                        "_ln_micro",
                        F.round(F.log(F.col("_n_total").cast("double")) * MICRO).cast("long"),
                    )
                    .withColumn(
                        "_ucb",
                        F.expr(f"n_success * CAST({MICRO} AS BIGINT) div n_trials")
                        + isqrt_col(
                            F.expr(f"2 * _ln_micro * CAST({MICRO} AS BIGINT) div n_trials")
                        ),
                    )
                )
                best = scored.orderBy(F.col("_ucb").desc(), F.col("host").asc()).limit(
                    slots
                ).select("host")
                chosen = chosen.unionByName(best)
        admitted = batch.join(F.broadcast(chosen), on="host", how="left_semi")
        n_deferred = batch.count() - admitted.count()
        self.metrics.inc("ucb_deferred", n_deferred)
        return admitted, n_deferred

    def _update_ucb(self, results: DataFrame, r: int) -> None:
        """Fold this round's outcomes into the cumulative per-host
        trial stats (every scheduled fetch = one arm pull, hit =
        reward 1). Versioned under round=r, idempotent on replay."""
        from sandcrawler_spark.functions.urls import host_col

        per_host = results.groupBy(
            host_col(F.col("base_url")).alias("host")
        ).agg(
            F.count("*").cast("long").alias("_t"),
            F.sum(F.col("hit").cast("long")).cast("long").alias("_s"),
        )
        prior = self._read_ucb(r - 1)
        if prior is not None:
            merged = (
                per_host.join(prior, on="host", how="full")
                .select(
                    "host",
                    (F.coalesce("_t", F.lit(0)) + F.coalesce("n_trials", F.lit(0)))
                    .cast("long")
                    .alias("n_trials"),
                    (F.coalesce("_s", F.lit(0)) + F.coalesce("n_success", F.lit(0)))
                    .cast("long")
                    .alias("n_success"),
                )
            )
        else:
            merged = per_host.select(
                "host",
                F.col("_t").alias("n_trials"),
                F.col("_s").alias("n_success"),
            )
        merged.write.mode("overwrite").parquet(self._versioned_dir("ucb_stats", r))

    # ---- link-rank frontier prioritization ---------------------------------
    _EDGE_SCHEMA = "src_host string, dst_host string, weight long"
    _RANK_SCHEMA = "host string, rank long"

    def _update_link_ranks(self, results: DataFrame, batch: DataFrame, r: int) -> None:
        """Fold this round's discovered link mass into the cumulative
        host graph and warm-start PageRank from the previous round's
        ranks (incremental_pagerank). Link discovery covers every page
        the crawler RENDERED this round — the requested URLs and the
        hit terminals — not just terminals (a landing page's outbound
        links are exactly the cross-host mass the rank needs; its
        terminal is often a link-less PDF). Both stores are
        round-versioned; a round with no new edges carries the prior
        state forward so every round has a version (replay-stable)."""
        from sandcrawler_spark.operators.linkgraph import (
            extract_outlinks,
            host_graph,
            host_pagerank,
            incremental_pagerank,
        )

        prior_e = self._read_versioned("link_edges", self._EDGE_SCHEMA, r - 1)
        rendered = (
            results.filter(F.col("hit"))
            .select(F.col("terminal_url").alias("url"))
            .unionByName(batch.select(F.col("canon_url").alias("url")))
            .distinct()
        )
        fetched_pages = (
            rendered.join(self.corpus["pages"], on="url", how="inner")
            .select("url", "html")
        )
        if self.respect_page_robots:
            from sandcrawler_spark.functions.pagerobots import (
                outlinks_with_rel,
                page_robots,
            )

            links = (
                outlinks_with_rel(fetched_pages)
                .filter(~F.col("nofollow"))
                .select("src_url", "dst_url")
            )
            nf_pages = (
                page_robots(fetched_pages)
                .filter(F.col("nofollow"))
                .select(F.col("url").alias("src_url"))
            )
            new_e = host_graph(links.join(nf_pages, "src_url", "left_anti"))
        else:
            new_e = host_graph(extract_outlinks(fetched_pages))
        cum = (
            new_e if prior_e is None
            else prior_e.unionByName(new_e)
            .groupBy("src_host", "dst_host")
            .agg(F.sum("weight").cast("long").alias("weight"))
        )
        cum = cum.localCheckpoint(eager=True)
        if cum.isEmpty():
            # nothing discovered yet: version the (empty) prior forward
            cum.write.mode("overwrite").parquet(self._versioned_dir("link_edges", r))
            return
        prev_ranks = self._read_versioned("host_ranks", self._RANK_SCHEMA, r - 1)
        if prev_ranks is None:
            ranks = host_pagerank(cum, n_iter=5)
        else:
            ranks = incremental_pagerank(cum, prev_ranks, n_iter=2)
        cum.write.mode("overwrite").parquet(self._versioned_dir("link_edges", r))
        ranks.write.mode("overwrite").parquet(self._versioned_dir("host_ranks", r))

    def _rank_capped_frontier(self, frontier: DataFrame, r: int):
        """Priority frontier queue: when the unseen frontier exceeds
        frontier_cap, keep the top rows by (request priority desc,
        host link-rank desc, canon_url) — a distributed TakeOrdered,
        never a single-task global sort. Returns (frontier, n_dropped).
        """
        ranks = self._read_versioned("host_ranks", self._RANK_SCHEMA, r - 1)
        if ranks is not None:
            frontier = frontier.join(
                F.broadcast(ranks.withColumnRenamed("rank", "_hr")),
                on="host", how="left",
            )
        else:
            frontier = frontier.withColumn("_hr", F.lit(None).cast("long"))
        frontier = frontier.withColumn("_hr", F.coalesce("_hr", F.lit(0)))
        if self.frontier_cap is None:
            return frontier.drop("_hr"), 0
        total = frontier.count()
        if total <= self.frontier_cap:
            return frontier.drop("_hr"), 0
        kept = (
            frontier.orderBy(
                F.col("priority").desc(), F.col("_hr").desc(), F.col("canon_url")
            )
            .limit(self.frontier_cap)
            .drop("_hr")
        )
        return kept, total - self.frontier_cap

    # ---- host-budget backpressure -----------------------------------------
    def _enforce_host_budget(self, batch: DataFrame, r: int):
        """Defer scheduled rows whose host has exhausted its cumulative
        fetch quota. The running per-host totals are OWNED by the
        stateful_host_budget operator: each round's admitted rows are
        spooled to disk and drained through an availableNow streaming
        query whose applyInPandasWithState state (and file-source
        offsets) live under the runner's state dir — so the totals
        resume exactly like every other table here, and this round's
        admission decisions read the operator's own emissions.

        Admission: batch rows carry rank_in_key (deterministic per-host
        politeness order), so host h admits rows with
        prev_total + rank_in_key < budget and defers the rest. A host
        over quota contributes nothing; when EVERY remaining frontier
        row is deferred the crawl reports done (budget exhausted)
        rather than spinning on rows it will never fetch.

        Returns (admitted_rows, n_deferred)."""
        from sandcrawler_spark.streaming.eventtime import stateful_host_budget

        budget = self.host_budget
        sink = os.path.join(self.state_dir, "budget_totals")
        spool = os.path.join(self.state_dir, "budget_spool")
        ckpt = os.path.join(self.state_dir, "budget_ckpt")
        batch = batch.persist()
        round_spool = os.path.join(spool, f"round={r}")
        if os.path.isdir(round_spool):
            # crashed-round replay: the spool is the authoritative
            # admission record for this round (the sink may already
            # include this round's drain — recomputing from it would
            # admit a different set than the one already counted)
            spooled = self.spark.read.schema(
                "host string, canon_url string"
            ).parquet(round_spool)
            admitted = batch.join(
                spooled.select("canon_url").distinct(), on="canon_url", how="left_semi"
            )
            n_deferred = batch.count() - admitted.count()
        else:
            prev = None
            if os.path.isdir(sink) and any(
                d.startswith("batch=") for d in os.listdir(sink)
            ):
                prev = (
                    self.spark.read.schema(
                        "host string, total_fetched long, over_budget boolean"
                    )
                    .parquet(*(os.path.join(sink, d) for d in os.listdir(sink)
                               if d.startswith("batch=")))
                    .groupBy("host")
                    .agg(F.max("total_fetched").alias("_prev"))
                )
            joined = (
                batch.join(F.broadcast(prev), on="host", how="left")
                if prev is not None
                else batch.withColumn("_prev", F.lit(None).cast("long"))
            )
            admit = (
                F.coalesce(F.col("_prev"), F.lit(0)) + F.col("rank_in_key")
                < F.lit(budget)
            )
            admitted = joined.filter(admit).drop("_prev")
            n_deferred = joined.filter(~admit).count()
            admitted.select("host", "canon_url").write.mode("overwrite").parquet(
                round_spool
            )
        self.metrics.inc("budget_deferred", n_deferred)
        # Spark 4.1: the state-commit validator false-positives for
        # applyInPandasWithState driven from Python via foreachBatch
        self.spark.conf.set(
            "spark.sql.streaming.stateStore.commitValidation.enabled", "false"
        )
        stream = self.spark.readStream.schema("host string, canon_url string").parquet(
            os.path.join(spool, "*")
        )

        def _sink(bdf: DataFrame, bid: int) -> None:
            bdf.write.mode("overwrite").parquet(os.path.join(sink, f"batch={bid}"))

        q = (
            stateful_host_budget(stream, budget=budget)
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batch.unpersist()
        return admitted, n_deferred

    # ---- one round -------------------------------------------------------
    # ---- sitemap/feed discovery ---------------------------------------------
    def _discover_requests(self, to_extract: DataFrame) -> int:
        """Parse sitemap XML (urlset/sitemapindex) and RSS/Atom feed
        bodies among this round's fetched pages into new ingest
        requests; merge into the discovered store (PK'd, on_conflict
        nothing — idempotent on round replay). Returns rows found this
        round (pre-merge, post-distinct). Sitemap index pointers come
        back as ingest requests too: the next round fetches the child
        sitemap and THIS hook parses it — the fetch loop is the
        recursion."""
        from sandcrawler_spark.functions.feeds import discover_feeds, parse_feed
        from sandcrawler_spark.functions.sitemaps import parse_sitemap

        # try_validate_utf8: binary bodies (PDFs) come out NULL instead
        # of throwing MALFORMED_CHARACTER_CODING like a strict decode
        xmlish = to_extract.select(
            F.col("terminal_url").alias("src_url"),
            F.expr("try_validate_utf8(html)").alias("xml"),
        ).filter(F.col("xml").isNotNull())
        sm = parse_sitemap(
            xmlish.filter(F.col("xml").rlike(r"<(urlset|sitemapindex)[\s>]")),
            "xml",
            keep_cols=["src_url"],
        ).select(F.lit("sitemap").alias("link_source"), F.col("src_url"), F.col("loc"))
        fd = parse_feed(
            xmlish.filter(F.col("xml").rlike(r"<(rss|feed)[\s>]")),
            "xml",
            keep_cols=["src_url"],
        ).select(F.lit("feed").alias("link_source"), F.col("src_url"), F.col("link").alias("loc"))
        # third channel: HTML pages advertising their feed via
        # <link rel="alternate" type="application/rss+xml|atom+xml">
        # (autodiscovery) — the feed URL itself becomes a request; the
        # NEXT round fetches it and the fd branch above parses it
        ad = discover_feeds(
            xmlish.filter(F.col("xml").rlike(r"(?i)<link\b[^>]*alternate")),
            html_col="xml",
            url_col="src_url",
        ).select(
            F.lit("feed_autodiscovery").alias("link_source"),
            F.col("url").alias("src_url"),
            F.col("feed_url").alias("loc"),
        )
        reqs = (
            sm.unionByName(fd).unionByName(ad)
            .select(
                "link_source",
                F.col("src_url").alias("link_source_id"),
                F.when(F.lower("loc").endswith(".pdf"), "pdf")
                .otherwise("html")
                .alias("ingest_type"),
                F.col("loc").alias("base_url"),
                F.lit("discovery").alias("ingest_request_source"),
                F.lit(1).cast("long").alias("priority"),
                F.lit(1).cast("long").alias("link_depth"),
            )
            .distinct()
            .persist()
        )
        n = reqs.count()
        if n:
            self.discovered.merge(reqs, on_conflict="nothing")
        reqs.unpersist()
        return n

    def run_round(self) -> dict:
        r = len(self.rounds_done())
        requests = self.corpus["ingest_request"]
        if self.discover:
            d = self.discovered.read()
            if d is not None:
                requests = requests.unionByName(d, allowMissingColumns=True)
        frontier = build_frontier(
            requests,
            self.results.read(),
            now_expr=self.now_expr,
        )
        n_moved = 0
        if self.rewrite_moved_hosts:
            frontier, n_moved = self._apply_moves(frontier, r)
        seen_df = self.seen.read()
        if seen_df is not None:
            frontier = unseen_exact(frontier, seen_df, "canon_url")
        n_rank_dropped = 0
        if self.rank_frontier:
            frontier, n_rank_dropped = self._rank_capped_frontier(frontier, r)
            self.metrics.inc("frontier_rank_dropped", n_rank_dropped)
        frontier = frontier.persist()
        n_frontier = frontier.count()

        robots = (
            self._robots_with_adaptive_delays(r)
            if self.adaptive_politeness
            else self.corpus["robots"]
        )
        sched = schedule_politeness(frontier, robots)
        batch = sched.filter(F.col("crawl_round") == 0)
        n_deferred = 0
        if self.host_budget is not None:
            batch, n_deferred = self._enforce_host_budget(batch, r)
        n_breaker = 0
        if self.circuit_breaker is not None:
            batch, n_breaker = self._apply_breaker(batch, r)
        n_ucb = 0
        if self.ucb_hosts is not None:
            batch, n_ucb = self._apply_ucb(batch, r)
        batch = batch.persist()
        n_batch = batch.count()
        if n_batch == 0:
            frontier.unpersist()
            batch.unpersist()
            entry = {
                "round": r, "frontier": n_frontier, "scheduled": 0,
                "deferred": n_deferred, "breaker_deferred": n_breaker,
                "ucb_deferred": n_ucb,
                # breaker/UCB-deferred work is only PAUSED — the
                # blackout expires / the arm gets re-selected, so an
                # empty batch must not end the crawl
                "done": n_breaker == 0 and n_ucb == 0,
            }
            self._record_round(entry)
            return entry

        results = fetch_simulate(batch, self.corpus["cdx"], self.corpus["pages"])
        results = results.withColumn("updated", F.expr(self.now_expr))
        if self.adaptive_politeness:
            self._update_delays(results, batch, r)
        if self.rewrite_moved_hosts:
            self._update_moves(results, r)
        if self.circuit_breaker is not None:
            self._update_breaker(results, r)
        if self.ucb_hosts is not None:
            self._update_ucb(results, r)
        if self.rank_frontier:
            self._update_link_ranks(results, batch, r)

        # extraction: content-addressed short-circuit (skip sha1s we
        # already extracted — the HBase existence check, S6/J8)
        hits = results.filter(F.col("hit")).select(
            "terminal_url", "terminal_dt", "terminal_sha1hex"
        ).distinct()
        if self.denylist:
            from sandcrawler_spark.operators.denylist import split_denylist

            hits, denied = split_denylist(hits, self.denylist, "terminal_sha1hex")
            self.metrics.inc("denylist_skipped", denied.count())
        prior = self.extraction.read()
        if prior is not None:
            hits = hits.join(
                prior.select(F.col("sha1hex").alias("terminal_sha1hex")),
                on="terminal_sha1hex",
                how="left_anti",
            )
        bodies = self.corpus["pages"].select(
            F.col("url").alias("terminal_url"),
            F.date_format("warc_ts", "yyyyMMddHHmmss").alias("terminal_dt"),
            "html",
        )
        # C18/C19 routing: PDF bodies go through the grobid + pdf_meta
        # hooks; HTML bodies through text extraction + biblio (the
        # reference's per-ingest-type worker split)
        from sandcrawler_spark.functions.biblio import BIBLIO_SCHEMA
        from sandcrawler_spark.functions.hooks import (
            GROBID_SCHEMA,
            PDF_META_SCHEMA,
            with_grobid,
            with_pdf_meta,
        )

        to_extract = hits.join(bodies, on=["terminal_url", "terminal_dt"], how="inner")
        is_pdf = F.substring(F.col("html"), 1, 4) == F.lit(b"%PDF")
        html_base = (
            with_file_meta(to_extract.filter(~is_pdf), "html")
            .withColumn("_ex", extract_text_udf(F.col("html")))
            .withColumn("_biblio", biblio_udf(F.col("html"), F.col("terminal_url")))
        )
        n_noindex = 0
        if self.respect_page_robots:
            from sandcrawler_spark.functions.pagerobots import page_robots

            # meta-robots noindex: fetched (the site allowed it) but
            # never stored — the opt-out is about indexing, not access
            noindex = (
                page_robots(
                    html_base.select(F.col("terminal_url").alias("url"), "html")
                )
                .filter(F.col("noindex"))
                .select(F.col("url").alias("terminal_url"))
                .distinct()
                .persist()
            )
            n_noindex = noindex.count()
            self.metrics.inc("noindex_pages", n_noindex)
            if n_noindex:
                html_base = html_base.join(
                    F.broadcast(noindex), "terminal_url", "left_anti"
                )
        n_soft404 = 0
        if self.soft404_filter:
            from sandcrawler_spark.functions.soft404 import soft404_reason_col

            # fetch_simulate only lands 200-class terminals here, so
            # the status arg is a literal 200; the verdict keys on the
            # extracted title/text
            reason = soft404_reason_col(
                F.lit(200), F.col("_biblio.title"), F.col("_ex.text")
            )
            html_base = html_base.withColumn("_soft404", reason).persist()
            flagged = (
                html_base.filter(F.col("_soft404").isNotNull())
                .select(F.col("terminal_sha1hex").alias("_s404_sha1"))
                .distinct()
                .persist()
            )
            n_soft404 = flagged.count()
            self.metrics.inc("soft404_pages", n_soft404)
            if n_soft404:
                # reclassify the fetch result rows (small side: the
                # flagged sha1 set) and drop the pages from extraction
                results = (
                    results.join(
                        F.broadcast(flagged),
                        results["terminal_sha1hex"] == F.col("_s404_sha1"),
                        "left",
                    )
                    .withColumn(
                        "status",
                        F.when(F.col("_s404_sha1").isNotNull(), "soft404")
                        .otherwise(F.col("status")),
                    )
                    .withColumn("hit", F.col("status") == "success")
                    .drop("_s404_sha1")
                )
                html_base = html_base.filter(F.col("_soft404").isNull())
            html_base = html_base.drop("_soft404")
        html_ex = (
            html_base
            .select(
                F.col("terminal_sha1hex").alias("sha1hex"),
                F.col("sha256hex"),
                F.col("md5hex"),
                F.col("size_bytes"),
                F.col("mimetype"),
                F.col("_ex.text").alias("text"),
                F.col("_ex.word_count").alias("word_count"),
                F.col("_ex.extractor").alias("extractor"),
                F.col("_biblio").alias("biblio"),
                F.lit(None).cast(GROBID_SCHEMA).alias("grobid"),
                F.lit(None).cast(PDF_META_SCHEMA).alias("pdf_meta"),
            )
        )
        pdf_ex = (
            with_pdf_meta(with_grobid(with_file_meta(to_extract.filter(is_pdf), "html")))
            .select(
                F.col("terminal_sha1hex").alias("sha1hex"),
                F.col("sha256hex"),
                F.col("md5hex"),
                F.col("size_bytes"),
                F.col("mimetype"),
                F.lit(None).cast("string").alias("text"),
                F.col("pdf_meta.word_count").alias("word_count"),
                F.lit("grobid").alias("extractor"),
                F.lit(None).cast(BIBLIO_SCHEMA).alias("biblio"),
                F.col("grobid"),
                F.col("pdf_meta"),
            )
        )
        n_discovered = 0
        if self.discover:
            n_discovered = self._discover_requests(to_extract)
            self.metrics.inc("discovered_requests", n_discovered)

        extracted = html_ex.unionByName(pdf_ex).persist()
        n_extracted = extracted.count()
        # F10: scope routing — how many extracted docs are ingest-worthy
        # fulltext (html_ingest routes other scopes to skip statuses)
        from sandcrawler_spark.functions.biblio import route_by_scope

        self.metrics.inc(
            "fulltext_scope_docs", route_by_scope(extracted, scope_col="biblio.scope").count()
        )

        lineage = {"round": r, "frontier": n_frontier, "scheduled": n_batch}
        res_snap = self.results.merge(
            results, dedupe_order=[F.desc("updated")], lineage=lineage
        )
        ext_snap = self.extraction.merge(
            extracted, on_conflict="nothing", lineage=lineage
        )
        seen_snap = self.seen.merge(
            batch.select("canon_url").distinct(), on_conflict="nothing", lineage=lineage
        )
        self.metrics.inc("rounds", 1)
        self.metrics.inc("frontier_rows", n_frontier)
        self.metrics.inc("scheduled_rows", n_batch)
        self.metrics.inc("extracted_docs", n_extracted)

        entry = {
            "round": r,
            "frontier": n_frontier,
            "rank_dropped": n_rank_dropped,
            "moved_rewritten": n_moved,
            "scheduled": n_batch,
            "deferred": n_deferred,
            "breaker_deferred": n_breaker,
            "ucb_deferred": n_ucb,
            "extracted": n_extracted,
            "discovered": n_discovered,
            "soft404": n_soft404,
            "noindex": n_noindex,
            "result_counts": res_snap["counts"],
            "snapshots": {
                "ingest_file_result": res_snap["id"],
                "extraction": ext_snap["id"],
                "url_seen": seen_snap["id"],
            },
            "done": False,
            "wall_s": None,
        }
        frontier.unpersist()
        batch.unpersist()
        extracted.unpersist()
        self._record_round(entry)
        return entry

    def run(self, max_rounds: int = 10) -> list[dict]:
        out = []
        for _ in range(max_rounds):
            t0 = time.time()
            entry = self.run_round()
            entry["wall_s"] = round(time.time() - t0, 3)
            out.append(entry)
            if entry.get("done"):
                break
        self.metrics.flush(os.path.join(self.state_dir, "metrics.json"))
        return out
