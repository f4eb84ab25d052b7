"""Fetch simulation (hop loop, status taxonomy) + snapshot tables
(MERGE semantics, time travel) + crawl rounds (checkpoint/resume:
run(2)+run(2) == run(4) — the reference's Kafka offset-store
resumability restated).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sandcrawler_spark.operators.fetch import fetch_simulate
from sandcrawler_spark.plans.tables import SnapshotTable
from sandcrawler_spark.streaming.rounds import CrawlRunner


def _requests(spark, rows):
    return spark.createDataFrame(rows, "ingest_type string, base_url string")


def test_fetch_status_taxonomy(spark, corpus):
    reqs = [
        ("pdf", "https://nowhere.example.net/missing"),  # no-capture
        ("pdf", "https://x.com/cookieAbsent/1"),  # blocked-cookie
        ("file", "https://nowhere.example.net/missing2"),  # 'file'->pdf, no-capture
        ("spreadsheet", "https://x.com/x"),  # wrong-ingest-type
        ("pdf", "https://siteloop.example.com/a"),  # redirect loop
    ]
    out = {r.base_url: r for r in fetch_simulate(_requests(spark, reqs), corpus["cdx"], corpus["pages"]).collect()}
    assert out["https://nowhere.example.net/missing"].status == "no-capture"
    assert out["https://x.com/cookieAbsent/1"].status == "blocked-cookie"
    assert out["https://nowhere.example.net/missing2"].status == "no-capture"
    assert out["https://nowhere.example.net/missing2"].ingest_type == "pdf"
    assert out["https://x.com/x"].status == "wrong-ingest-type"
    assert out["https://siteloop.example.com/a"].status == "redirect-loop"
    for r in out.values():
        assert r.hit is (r.status == "success")


def test_fetch_landing_page_hop_to_pdf(spark, corpus, corpus_pd):
    # pick a landing page from the corpus: /record/ urls carry a
    # citation_pdf_url hop to a real pdf capture
    landing = [u for u in corpus_pd["cdx"]["url"].unique() if "/record/" in u][:3]
    assert landing
    reqs = [("pdf", u) for u in landing]
    out = fetch_simulate(_requests(spark, reqs), corpus["cdx"], corpus["pages"]).collect()
    by_url = {r.base_url: r for r in out}
    assert len(out) == len(landing)
    for u in landing:
        r = by_url[u]
        assert r.status == "success", (u, r.status)
        assert r.terminal_url.endswith(".pdf")
        assert len(r.hops) == 2  # landing -> pdf
        assert r.terminal_sha1hex is not None


def test_fetch_one_result_per_request(spark, corpus):
    # every request yields exactly one result row (lineage accounting)
    reqs = corpus["ingest_request"].select("ingest_type", "base_url").limit(60)
    n_in = reqs.count()
    res = fetch_simulate(reqs, corpus["cdx"], corpus["pages"])
    assert res.count() == n_in


def test_fetch_html_ingest_direct(spark, corpus, corpus_pd):
    arts = [u for u in corpus_pd["cdx"]["url"].unique() if "/articles/" in u][:3]
    reqs = [("html", u) for u in arts]
    out = fetch_simulate(_requests(spark, reqs), corpus["cdx"], corpus["pages"]).collect()
    for r in out:
        assert r.status == "success", (r.base_url, r.status)
        assert len(r.hops) == 1


# ---------------------------------------------------------------------------
# Snapshot tables
# ---------------------------------------------------------------------------


def test_snapshot_merge_update_and_nothing(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"])
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    s1 = t.merge(df1)
    assert s1["counts"] == {"inserted": 2, "updated": 0, "total": 2}

    df2 = spark.createDataFrame([("b", 20), ("c", 30)], ["k", "v"])
    s2 = t.merge(df2)  # update mode: last write wins
    assert s2["counts"] == {"inserted": 1, "updated": 1, "total": 3}
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {"a": 1, "b": 20, "c": 30}

    df3 = spark.createDataFrame([("c", 999), ("d", 4)], ["k", "v"])
    s3 = t.merge(df3, on_conflict="nothing")
    assert s3["counts"]["inserted"] == 1
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {"a": 1, "b": 20, "c": 30, "d": 4}

    # time travel: snapshot 1 still readable
    old = {r.k: r.v for r in t.read_snapshot(s1["id"]).collect()}
    assert old == {"a": 1, "b": 2}
    # lineage chain intact
    assert [s["parent"] for s in t.snapshots()] == [None, s1["id"], s2["id"]]


def test_snapshot_append_chain_compacts(spark, tmp_path):
    """20 appends must NOT grow bucket dir lists monotonically: every
    bucket stays under compact_threshold dirs, rows are preserved, and
    ancestor snapshots still time-travel."""
    t = SnapshotTable(spark, str(tmp_path / "tc"), ["k"], n_buckets=4, compact_threshold=5)
    snaps = []
    for i in range(20):
        batch = spark.createDataFrame([(f"k{i}-{j}", i) for j in range(5)], ["k", "v"])
        snaps.append(t.append(batch))
    cur = t.current_snapshot()
    assert all(len(dirs) <= 5 for dirs in cur["buckets"].values()), cur["buckets"]
    assert cur["counts"]["total"] == 100
    assert t.read().count() == 100
    assert sum(cur["bucket_rows"].values()) == 100
    # time travel across a compaction boundary still works
    assert t.read_snapshot(snaps[9]["id"]).count() == 50
    # explicit full compaction: one dir per bucket, rows unchanged
    t.compact()
    cur = t.current_snapshot()
    assert all(len(dirs) == 1 for dirs in cur["buckets"].values())
    assert t.read().count() == 100


def test_snapshot_merge_in_batch_dedupe(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t2"), ["k"])
    batch = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3)], ["k", "v"])
    t.merge(batch, dedupe_order=[F.desc("v")])
    got = t.read().collect()
    assert len(got) == 1 and got[0].v == 3


# ---------------------------------------------------------------------------
# Crawl rounds: checkpoint / resume
# ---------------------------------------------------------------------------


def _final_state(runner):
    res = runner.results.read()
    seen = runner.seen.read()
    ext = runner.extraction.read()
    return (
        sorted((r.ingest_type, r.base_url, r.status) for r in res.collect()),
        sorted(r.canon_url for r in seen.collect()),
        sorted((r.sha1hex, r.word_count) for r in ext.collect()),
    )


def test_rounds_resume_equivalence(spark, corpus, tmp_path):
    small = {
        "ingest_request": corpus["ingest_request"].limit(40),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    r_a = CrawlRunner(spark, small, str(tmp_path / "a"))
    r_a.run(max_rounds=4)

    # killed-and-resumed run: 2 rounds, new runner object, 2 more
    r_b1 = CrawlRunner(spark, small, str(tmp_path / "b"))
    r_b1.run(max_rounds=2)
    r_b2 = CrawlRunner(spark, small, str(tmp_path / "b"))  # fresh driver
    assert len(r_b2.rounds_done()) == 2  # manifest survived
    r_b2.run(max_rounds=2)

    assert _final_state(r_a) == _final_state(r_b2)


def test_rounds_progress_and_lineage(spark, corpus, tmp_path):
    small = {
        "ingest_request": corpus["ingest_request"].limit(30),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    runner = CrawlRunner(spark, small, str(tmp_path / "c"))
    entries = runner.run(max_rounds=6)
    # monotone progress: frontier shrinks (seen-set grows) until done
    fronts = [e["frontier"] for e in entries if not e.get("done")]
    assert all(f2 <= f1 for f1, f2 in zip(fronts, fronts[1:]))
    assert entries[-1]["done"] or len(entries) == 6
    # lineage recorded on every merge snapshot
    for snap in runner.results.snapshots():
        assert "round" in snap["lineage"]
    assert os.path.exists(os.path.join(str(tmp_path / "c"), "metrics.json"))


def test_host_budget_enforced_in_rounds(spark, corpus, tmp_path):
    """VERDICT r3 item 6: backpressure is ENFORCED inside the round
    loop, not just validated offline — over-quota hosts are deferred
    by admission decisions that consume stateful_host_budget's own
    emitted totals, and the crawl terminates (done) once every
    remaining frontier row belongs to an exhausted host."""
    from sandcrawler_spark.functions.urls import host_of_py

    small = {
        "ingest_request": corpus["ingest_request"].limit(40),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    # unbudgeted reference run: how many URLs each host would fetch
    free = CrawlRunner(spark, small, str(tmp_path / "free"))
    free.run(max_rounds=8)
    free_counts: dict[str, int] = {}
    for r in free.seen.read().collect():
        h = host_of_py(r.canon_url)
        free_counts[h] = free_counts.get(h, 0) + 1
    budget = 2
    assert any(n > budget for n in free_counts.values()), "fixture too small"

    capped = CrawlRunner(
        spark, small, str(tmp_path / "capped"), host_budget=budget
    )
    entries = capped.run(max_rounds=10)
    assert entries[-1]["done"], "budget-capped crawl must terminate"
    assert any(e.get("deferred", 0) > 0 for e in entries), "nothing was deferred"
    # no host ever exceeds its quota in the seen set
    capped_counts: dict[str, int] = {}
    for r in capped.seen.read().collect():
        h = host_of_py(r.canon_url)
        capped_counts[h] = capped_counts.get(h, 0) + 1
    assert capped_counts, "budgeted crawl fetched nothing"
    assert all(n <= budget for n in capped_counts.values()), capped_counts
    # hosts under quota crawl exactly what the free run crawled
    for h, n in free_counts.items():
        assert capped_counts.get(h, 0) == min(n, budget), (h, n)
    # the operator's own totals agree with the seen set
    import os as _os

    sink = _os.path.join(str(tmp_path / "capped"), "budget_totals")
    totals = (
        spark.read.schema("host string, total_fetched long, over_budget boolean")
        .parquet(*(
            _os.path.join(sink, d) for d in _os.listdir(sink)
            if d.startswith("batch=")
        ))
        .groupBy("host").agg(F.max("total_fetched").alias("t"))
    )
    got = {r.host: r.t for r in totals.collect()}
    assert got == capped_counts


def test_adaptive_politeness_rounds(spark, corpus, tmp_path):
    """AIMD delays are maintained inside the round loop: clean hosts
    walk down toward the floor round over round, the table is
    versioned per round, and the adapted crawl is still exactly
    resumable (run(2)+run(2) == run(4))."""
    small = {
        "ingest_request": corpus["ingest_request"].limit(40),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    r_a = CrawlRunner(spark, small, str(tmp_path / "a"), adaptive_politeness=True)
    entries = r_a.run(max_rounds=4)
    n_rounds = len([e for e in entries if not e.get("done")])
    assert n_rounds >= 2

    d0 = {r.host: r.crawl_delay_ms for r in r_a._read_delays(0).collect()}
    dl = {r.host: r.crawl_delay_ms for r in r_a._read_delays(n_rounds - 1).collect()}
    assert d0, "round-0 delay table missing"
    # every tracked delay stays in the clamp band and never rises for
    # the synthetic corpus (no 429/503 in fetch_simulate's taxonomy)
    assert all(250 <= v <= 1000 for v in d0.values())
    assert all(dl[h] <= d0[h] for h in d0)
    # at least one host fetched in 2+ rounds stepped down twice
    assert any(v <= 500 for v in dl.values())

    # resumability with adaptation on
    r_b1 = CrawlRunner(spark, small, str(tmp_path / "b"), adaptive_politeness=True)
    r_b1.run(max_rounds=2)
    r_b2 = CrawlRunner(spark, small, str(tmp_path / "b"), adaptive_politeness=True)
    r_b2.run(max_rounds=2)
    assert _final_state(r_a) == _final_state(r_b2)


def test_rank_frontier_cap_and_resume(spark, corpus, tmp_path):
    """Priority-frontier queue: with rank_frontier + a cap, each round
    schedules at most `cap` unseen URLs (rank-ordered TakeOrdered, the
    rest retried later), the host-rank store is round-versioned, the
    crawl still drains the whole seed list, and run(2)+run(2) ==
    run(4) including the rank table."""
    small = {
        "ingest_request": corpus["ingest_request"].limit(40),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    kw = dict(rank_frontier=True, frontier_cap=12)
    r_a = CrawlRunner(spark, small, str(tmp_path / "a"), **kw)
    entries = r_a.run(max_rounds=8)
    live = [e for e in entries if not e.get("done")]
    assert live and all(e["frontier"] <= 12 for e in live)
    # the cap defers, never drops: everything fetchable still got seen
    uncapped = CrawlRunner(spark, small, str(tmp_path / "u"))
    uncapped.run(max_rounds=8)
    assert sorted(r.canon_url for r in r_a.seen.read().collect()) == sorted(
        r.canon_url for r in uncapped.seen.read().collect()
    )

    n_rounds = len(live)
    ranks_final = r_a._read_versioned("host_ranks", r_a._RANK_SCHEMA, n_rounds - 1)
    assert ranks_final is not None and ranks_final.count() > 0

    # exact resume with ranks on
    r_b1 = CrawlRunner(spark, small, str(tmp_path / "b"), **kw)
    r_b1.run(max_rounds=2)
    r_b2 = CrawlRunner(spark, small, str(tmp_path / "b"), **kw)
    r_b2.run(max_rounds=6)
    assert _final_state(r_a) == _final_state(r_b2)
    ranks_b = r_b2._read_versioned("host_ranks", r_b2._RANK_SCHEMA, n_rounds - 1)
    assert sorted(map(tuple, ranks_final.collect())) == sorted(
        map(tuple, ranks_b.collect())
    )


def test_rank_cap_is_take_ordered_not_global_sort(spark, corpus, tmp_path):
    """The frontier cap must compile to TakeOrderedAndProject (a
    distributed partial top-K) — never a global Sort+Limit that funnels
    the 10^10-row frontier through one task."""
    runner = CrawlRunner(
        spark, corpus, str(tmp_path / "s"), rank_frontier=True, frontier_cap=5
    )
    from sandcrawler_spark.operators.frontier import build_frontier

    frontier = build_frontier(corpus["ingest_request"], None)
    capped, dropped = runner._rank_capped_frontier(frontier, 0)
    assert dropped > 0
    assert capped.count() == 5
    # execute THIS df's QueryExecution, then read the executed plan
    # (the plan_audit discipline: AQE hides final stages otherwise)
    capped.collect()
    plan = capped._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


# ---------------------------------------------------------------------------
# Sitemap/feed discovery channel in the round loop
# ---------------------------------------------------------------------------


def test_sitemap_feed_discovery_rounds(spark, corpus, corpus_pd, tmp_path):
    """--discover: fetched sitemap/feed bodies contribute new ingest
    requests to the NEXT round's frontier; a sitemapindex pointer is
    itself refetched next round (the fetch loop is the recursion)."""
    import base64
    import hashlib

    cdx_pd = corpus_pd["cdx"]
    ok = cdx_pd[(cdx_pd.status_code == 200) & (cdx_pd.mimetype == "text/html")]
    targets = sorted(u for u in ok["url"].unique()
                     if "/articles/" in u and "?" not in u)[:2]
    assert len(targets) == 2
    sm_url = "https://disc.example.org/sitemap.xml"
    sm2_url = "https://disc.example.org/sitemap-2.xml"
    fd_url = "https://disc.example.org/feed.xml"
    bodies = {
        sm_url: f"<sitemapindex><sitemap><loc>{sm2_url}</loc></sitemap></sitemapindex>",
        sm2_url: f"<urlset><url><loc>{targets[0]}</loc></url></urlset>",
        fd_url: ("<rss><channel><item><title>t</title>"
                 f"<link>{targets[1]}</link></item></channel></rss>"),
    }
    ts = corpus_pd["pages"]["warc_ts"].iloc[0].to_pydatetime()
    dtstr = ts.strftime("%Y%m%d%H%M%S")
    page_rows, cdx_rows = [], []
    for u, body in bodies.items():
        digest = hashlib.sha1(body.encode()).digest()
        page_rows.append((u, ts, bytearray(body.encode()), None, None))
        cdx_rows.append((
            "org,example,disc)/" + u.rsplit("/", 1)[1], dtstr, u, "text/html", 200,
            base64.b32encode(digest).decode().rstrip("="), digest.hex(),
            len(body), 0, "SC-TEST/SC-1.warc.gz", None,
        ))
    pages = corpus["pages"].unionByName(spark.createDataFrame(
        page_rows, "url string, warc_ts timestamp, html binary, text string, lang string"))
    cdx = corpus["cdx"].unionByName(spark.createDataFrame(
        cdx_rows,
        "surt string, datetime string, url string, mimetype string, status_code long, "
        "sha1b32 string, sha1hex string, warc_csize long, warc_offset long, "
        "warc_path string, redirect_url string"))
    reqs = spark.createDataFrame(
        [("seed", "s1", "html", sm_url, 1, 0), ("seed", "s2", "html", fd_url, 1, 0)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": cdx, "pages": pages, "robots": corpus["robots"]}

    runner = CrawlRunner(spark, small, str(tmp_path / "d"), discover=True)
    entries = runner.run(max_rounds=6)
    by_round = {e["round"]: e for e in entries}
    # r0 fetches sitemap index + feed -> discovers child sitemap + target[1]
    assert by_round[0]["discovered"] == 2
    # r1 fetches child sitemap + target[1] -> discovers target[0]
    assert by_round[1]["discovered"] == 1
    assert by_round[1]["frontier"] == 2
    # r2 fetches target[0]; then the frontier drains
    assert by_round[2]["frontier"] == 1
    assert entries[-1]["done"]
    res = {r.base_url: r.status for r in runner.results.read().collect()}
    for u in targets + [sm2_url]:
        assert res[u] == "success", (u, res.get(u))
    # without the flag nothing is discovered
    r2 = CrawlRunner(spark, small, str(tmp_path / "off"))
    e2 = r2.run(max_rounds=2)
    assert all(e.get("discovered", 0) == 0 for e in e2)
    assert r2.results.read().count() == 2


def test_soft404_filter_rounds(spark, corpus, tmp_path):
    """soft404_filter: a 200 text/html page whose content is an error
    page is reclassified to status 'soft404' (hit=False) and kept out
    of the extraction corpus; without the flag it lands as success."""
    import base64
    import hashlib

    url = "https://s404.example.org/moved-article"
    body = ("<html><head><title>404 Page Not Found</title></head>"
            "<body><p>Sorry, the page you requested was not found.</p>"
            "</body></html>")
    ts = corpus["pages"].select("warc_ts").first()[0]
    dtstr = ts.strftime("%Y%m%d%H%M%S")
    digest = hashlib.sha1(body.encode()).digest()
    pages = corpus["pages"].unionByName(spark.createDataFrame(
        [(url, ts, bytearray(body.encode()), None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string"))
    cdx = corpus["cdx"].unionByName(spark.createDataFrame(
        [("org,example,s404)/moved-article", dtstr, url, "text/html", 200,
          base64.b32encode(digest).decode().rstrip("="), digest.hex(),
          len(body), 0, "SC-TEST/SC-404.warc.gz", None)],
        "surt string, datetime string, url string, mimetype string, status_code long, "
        "sha1b32 string, sha1hex string, warc_csize long, warc_offset long, "
        "warc_path string, redirect_url string"))
    reqs = spark.createDataFrame(
        [("seed", "s1", "html", url, 1, 0)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": cdx, "pages": pages, "robots": corpus["robots"]}

    runner = CrawlRunner(spark, small, str(tmp_path / "on"), soft404_filter=True)
    entries = runner.run(max_rounds=2)
    assert entries[0]["soft404"] == 1
    res = {r.base_url: (r.status, r.hit) for r in runner.results.read().collect()}
    assert res[url] == ("soft404", False)
    ext = runner.extraction.read()
    assert ext.filter(F.col("sha1hex") == digest.hex()).count() == 0

    off = CrawlRunner(spark, small, str(tmp_path / "off"))
    off.run(max_rounds=2)
    res2 = {r.base_url: r.status for r in off.results.read().collect()}
    assert res2[url] == "success"
    assert off.extraction.read().filter(F.col("sha1hex") == digest.hex()).count() == 1


def test_circuit_breaker_rounds(spark, corpus, tmp_path):
    """Failure circuit breaker (m=2, k=2): a dead host (no captures)
    trips after 2 consecutive all-miss rounds, its remaining frontier
    is DEFERRED (not dropped, crawl not done) for 2 rounds, then
    retried when the blackout expires."""
    reqs = spark.createDataFrame(
        [("seed", f"d{i}", "html", f"https://dead.example.net/p{i}", 1, 0)
         for i in range(5)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": corpus["cdx"],
             "pages": corpus["pages"], "robots": corpus["robots"]}

    r = CrawlRunner(spark, small, str(tmp_path / "cb"), circuit_breaker=(2, 2))
    entries = r.run(max_rounds=7)
    shape = [(e["round"], e["scheduled"], e["breaker_deferred"], e["done"])
             for e in entries]
    assert shape == [
        (0, 2, 0, False),   # quota-2 slice fetched, all miss -> streak 1
        (1, 2, 0, False),   # second all-miss round -> breaker trips
        (2, 0, 1, False),   # blacked out: deferred, NOT done
        (3, 0, 1, False),   # still blacked out
        (4, 1, 0, False),   # blackout expired: last URL retried
        (5, 0, 0, True),    # frontier drained
    ]
    st = {x.host: (x.fail_streak, x.blackout_until)
          for x in spark.read.parquet(str(tmp_path / "cb/breaker/round=1")).collect()}
    assert st["dead.example.net"] == (0, 3)  # tripped at r1, out through r3

    # without the breaker the dead host burns quota every round
    off = CrawlRunner(spark, small, str(tmp_path / "cb_off"))
    entries_off = off.run(max_rounds=7)
    assert [e["scheduled"] for e in entries_off[:3]] == [2, 2, 1]
    assert all(e.get("breaker_deferred", 0) == 0 for e in entries_off)


def test_page_robots_enforcement_rounds(spark, corpus, tmp_path):
    """respect_page_robots: a meta-noindex page is fetched (status
    stays success — the opt-out is about indexing, not access) but its
    extraction never lands; rel=nofollow links and links from
    meta-nofollow pages stay out of the rank-frontier edge store."""
    import base64
    import hashlib

    ts = corpus["pages"].select("warc_ts").first()[0]
    dtstr = ts.strftime("%Y%m%d%H%M%S")

    def _page(url, body):
        digest = hashlib.sha1(body.encode()).digest()
        page = (url, ts, bytearray(body.encode()), None, None)
        surt = "org,example,probots)/" + url.rsplit("/", 1)[1]
        cdx = (surt, dtstr, url, "text/html", 200,
               base64.b32encode(digest).decode().rstrip("="), digest.hex(),
               len(body), 0, "SC-TEST/SC-PR.warc.gz", None)
        return page, cdx, digest.hex()

    noidx_url = "https://probots.example.org/private"
    follow_url = "https://probots.example.org/public"
    p1, c1, sha_noidx = _page(
        noidx_url,
        '<html><head><meta name="robots" content="noindex"></head>'
        "<body><p>perfectly good but opted-out content here</p></body></html>",
    )
    p2, c2, sha_pub = _page(
        follow_url,
        '<html><body><a href="https://followed.example.net/a">ok</a>'
        '<a rel="nofollow" href="https://paid.example.net/b">ad</a></body></html>',
    )
    pages = corpus["pages"].unionByName(spark.createDataFrame(
        [p1, p2],
        "url string, warc_ts timestamp, html binary, text string, lang string"))
    cdx = corpus["cdx"].unionByName(spark.createDataFrame(
        [c1, c2],
        "surt string, datetime string, url string, mimetype string, status_code long, "
        "sha1b32 string, sha1hex string, warc_csize long, warc_offset long, "
        "warc_path string, redirect_url string"))
    reqs = spark.createDataFrame(
        [("seed", "s1", "html", noidx_url, 1, 0), ("seed", "s2", "html", follow_url, 1, 0)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": cdx, "pages": pages, "robots": corpus["robots"]}

    runner = CrawlRunner(
        spark, small, str(tmp_path / "on"),
        respect_page_robots=True, rank_frontier=True,
    )
    entries = runner.run(max_rounds=2)
    assert entries[0]["noindex"] == 1
    res = {r.base_url: (r.status, r.hit) for r in runner.results.read().collect()}
    assert res[noidx_url] == ("success", True)  # fetched, not reclassified
    ext = runner.extraction.read()
    assert ext.filter(F.col("sha1hex") == sha_noidx).count() == 0
    assert ext.filter(F.col("sha1hex") == sha_pub).count() == 1
    edges = spark.read.parquet(str(tmp_path / "on" / "link_edges" / "round=0"))
    dsts = {r.dst_host for r in edges.collect()}
    assert "followed.example.net" in dsts
    assert "paid.example.net" not in dsts

    # without the flag: extraction lands, nofollow edge counted
    off = CrawlRunner(spark, small, str(tmp_path / "off"), rank_frontier=True)
    off.run(max_rounds=2)
    assert off.extraction.read().filter(F.col("sha1hex") == sha_noidx).count() == 1
    edges_off = spark.read.parquet(str(tmp_path / "off" / "link_edges" / "round=0"))
    assert "paid.example.net" in {r.dst_host for r in edges_off.collect()}


def test_rewrite_moved_hosts_rounds(spark, corpus, tmp_path):
    """--rewrite-moved-hosts: after enough observed redirects
    concentrate old.example.org onto new.example.org, the still-queued
    frontier rows for the old host are rewritten to the new host
    BEFORE the seen filter and fetch directly (no redirect hops)."""
    import base64
    import hashlib

    ts = corpus["pages"].select("warc_ts").first()[0]
    dtstr = ts.strftime("%Y%m%d%H%M%S")
    old, new = "old.example.org", "new.example.org"
    page_rows, cdx_rows, req_rows = [], [], []
    for i in range(8):
        ou, nu = f"https://{old}/p{i}", f"https://{new}/p{i}"
        body = f"<html><head><title>moved {i}</title></head><body>doc {i} text</body></html>"
        digest = hashlib.sha1(body.encode()).digest()
        b32 = base64.b32encode(digest).decode().rstrip("=")
        # old URL: 301 -> new URL
        cdx_rows.append((f"org,example,old)/p{i}", dtstr, ou, "text/html", 301,
                         b32, digest.hex(), 0, 0, "SC-TEST/SC-1.warc.gz", nu))
        # new URL: 200 html capture + body
        cdx_rows.append((f"org,example,new)/p{i}", dtstr, nu, "text/html", 200,
                         b32, digest.hex(), len(body), 0, "SC-TEST/SC-1.warc.gz", None))
        page_rows.append((nu, ts, bytearray(body.encode()), None, None))
        req_rows.append(("seed", f"m{i}", "html", ou, 1, 0))
    pages = corpus["pages"].unionByName(spark.createDataFrame(
        page_rows, "url string, warc_ts timestamp, html binary, text string, lang string"))
    cdx = corpus["cdx"].unionByName(spark.createDataFrame(
        cdx_rows,
        "surt string, datetime string, url string, mimetype string, status_code long, "
        "sha1b32 string, sha1hex string, warc_csize long, warc_offset long, "
        "warc_path string, redirect_url string"))
    reqs = spark.createDataFrame(
        req_rows,
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": cdx, "pages": pages,
             "robots": corpus["robots"]}

    runner = CrawlRunner(spark, small, str(tmp_path / "mv"), rewrite_moved_hosts=True)
    entries = runner.run(max_rounds=8)
    by_round = {e["round"]: e for e in entries}
    # default quota 2/round: rounds 0-2 fetch via redirects (cum moves
    # 2, 4, 6); round 3 crosses min_count=5 -> the 2 queued rows rewrite
    assert [by_round[r].get("moved_rewritten", 0) for r in range(3)] == [0, 0, 0]
    assert by_round[3]["moved_rewritten"] == 2
    res = runner.results.read().collect()
    stat = {r.base_url: r for r in res}
    # rewritten rows were fetched UNDER THE NEW HOST, in one hop
    for i in (6, 7):
        assert f"https://{new}/p{i}" in stat, sorted(stat)
        assert stat[f"https://{new}/p{i}"].status == "success"
        assert f"https://{old}/p{i}" not in stat
    # earlier rows went through the redirect (old base_url, new terminal)
    assert stat[f"https://{old}/p0"].status == "success"
    assert stat[f"https://{old}/p0"].terminal_url == f"https://{new}/p0"
    assert entries[-1]["done"]

    # without the flag every row pays the redirect hop forever
    r2 = CrawlRunner(spark, small, str(tmp_path / "off"))
    e2 = r2.run(max_rounds=8)
    assert all(e.get("moved_rewritten", 0) == 0 for e in e2)
    s2 = {r.base_url for r in r2.results.read().collect()}
    assert f"https://{old}/p7" in s2 and f"https://{new}/p7" not in s2


def test_ucb_host_scheduling_rounds(spark, tmp_path):
    """UCB1 host scheduling (ucb_hosts=1): with three equally-dead
    hosts the policy degenerates to deterministic round-robin — every
    arm tried once (host-asc init), one host per round, deferred work
    PAUSED not dropped — and the cumulative trial store is
    round-versioned."""
    hosts = ["a.dead.example.net", "b.dead.example.net", "c.dead.example.net"]
    reqs = spark.createDataFrame(
        [("seed", f"{h}-{i}", "html", f"https://{h}/p{i}", 1, 0)
         for h in hosts for i in range(2)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    # robots/cdx/pages can be empty-shaped: every fetch is a miss
    empty_cdx = spark.createDataFrame(
        [], "surt string, datetime string, url string, mimetype string, "
            "status_code long, sha1b32 string, sha1hex string, warc_csize long, "
            "warc_offset long, warc_path string, redirect_url string")
    empty_pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string")
    robots = spark.createDataFrame(
        [(h, 0.0, [], 2) for h in hosts],
        "host string, crawl_delay_s double, disallow_prefixes array<string>, "
        "max_parallel long")
    small = {"ingest_request": reqs, "cdx": empty_cdx, "pages": empty_pages,
             "robots": robots}

    r = CrawlRunner(spark, small, str(tmp_path / "ucb"), ucb_hosts=1)
    entries = r.run(max_rounds=6)
    shape = [(e["round"], e["scheduled"], e["ucb_deferred"], e["done"]) for e in entries]
    assert shape == [
        (0, 2, 4, False),  # untried init: a.dead first (host asc)
        (1, 2, 2, False),  # b.dead
        (2, 2, 0, False),  # c.dead
        (3, 0, 0, True),   # all attempted once, frontier drained
    ]
    st = {x.host: (x.n_trials, x.n_success)
          for x in spark.read.parquet(str(tmp_path / "ucb/ucb_stats/round=2")).collect()}
    assert st == {h: (2, 0) for h in hosts}
    # round-0 store only knows the first arm
    st0 = {x.host for x in spark.read.parquet(str(tmp_path / "ucb/ucb_stats/round=0")).collect()}
    assert st0 == {"a.dead.example.net"}


def test_ucb_prefers_rewarding_host(spark, corpus, corpus_pd, tmp_path):
    """After the init pass, the live (all-hits) host is exploited until
    its queue drains while the dead host (tried first, host-asc) waits
    — mean 1e6 + bonus always beats mean 0 + equal-or-smaller bonus."""
    cdx = corpus_pd["cdx"]
    live_urls = sorted(
        cdx[(cdx["status_code"] == 200) & (cdx["mimetype"] == "text/html")
            & cdx["url"].str.contains("/articles/")
            & cdx["url"].str.startswith("https://")]["url"].unique()
    )
    by_host = {}
    for u in live_urls:
        by_host.setdefault(u.split("/")[2], []).append(u)
    live_host, urls = next((h, us) for h, us in sorted(by_host.items()) if len(us) >= 4)
    urls = urls[:4]
    dead = "aaa.dead.example.net"  # sorts before every corpus host
    rows = [("seed", f"l{i}", "html", u, 1, 0) for i, u in enumerate(urls)]
    rows += [("seed", f"d{i}", "html", f"https://{dead}/p{i}", 1, 0) for i in range(4)]
    reqs = spark.createDataFrame(
        rows,
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": corpus["cdx"],
             "pages": corpus["pages"], "robots": corpus["robots"]}

    r = CrawlRunner(spark, small, str(tmp_path / "pref"), ucb_hosts=1)
    entries = r.run(max_rounds=8)
    # reconstruct the per-round schedule from the versioned stats
    trials = []
    for i in range(len([e for e in entries if e["scheduled"]])):
        st = {x.host: x.n_trials
              for x in spark.read.parquet(str(tmp_path / f"pref/ucb_stats/round={i}")).collect()}
        trials.append(st)
    # init: dead first (asc), then live; afterwards live is exploited
    # to exhaustion before dead gets another slot
    assert set(trials[0]) == {dead}
    assert trials[1][live_host] > 0
    live_done_at = next(i for i, st in enumerate(trials) if st.get(live_host, 0) == 4)
    dead_done_at = next(i for i, st in enumerate(trials) if st.get(dead, 0) == 4)
    assert live_done_at < dead_done_at
    # the live host really rewarded the bandit
    final = {x.host: (x.n_trials, x.n_success)
             for x in spark.read.parquet(
                 str(tmp_path / f"pref/ucb_stats/round={len(trials) - 1}")).collect()}
    assert final[live_host][0] == 4 and final[live_host][1] >= 1
    assert final[dead] == (4, 0)


def test_feed_autodiscovery_rounds(spark, corpus, corpus_pd, tmp_path):
    """--discover third channel: an HTML page advertising its feed via
    <link rel="alternate" type="application/rss+xml"> contributes the
    FEED URL as a request; the next round fetches the feed and the
    feed parser contributes the article — a 3-hop page -> feed ->
    article chain through the loop."""
    import base64
    import hashlib

    cdx_pd = corpus_pd["cdx"]
    ok = cdx_pd[(cdx_pd.status_code == 200) & (cdx_pd.mimetype == "text/html")]
    targets = sorted(u for u in ok["url"].unique()
                     if "/articles/" in u and "?" not in u)[:1]
    home_url = "https://autod.example.org/index.html"
    feed_url = "https://autod.example.org/feed.xml"
    bodies = {
        home_url: ('<html><head><link rel="alternate" '
                   f'type="application/rss+xml" href="{feed_url}">'
                   "</head><body>home</body></html>"),
        feed_url: ("<rss><channel><item><title>t</title>"
                   f"<link>{targets[0]}</link></item></channel></rss>"),
    }
    ts = corpus_pd["pages"]["warc_ts"].iloc[0].to_pydatetime()
    dtstr = ts.strftime("%Y%m%d%H%M%S")
    page_rows, cdx_rows = [], []
    for u, body in bodies.items():
        digest = hashlib.sha1(body.encode()).digest()
        page_rows.append((u, ts, bytearray(body.encode()), None, None))
        cdx_rows.append((
            "org,example,autod)/" + u.rsplit("/", 1)[1], dtstr, u, "text/html", 200,
            base64.b32encode(digest).decode().rstrip("="), digest.hex(),
            len(body), 0, "SC-TEST/SC-1.warc.gz", None,
        ))
    pages = corpus["pages"].unionByName(spark.createDataFrame(
        page_rows, "url string, warc_ts timestamp, html binary, text string, lang string"))
    cdx = corpus["cdx"].unionByName(spark.createDataFrame(
        cdx_rows,
        "surt string, datetime string, url string, mimetype string, status_code long, "
        "sha1b32 string, sha1hex string, warc_csize long, warc_offset long, "
        "warc_path string, redirect_url string"))
    reqs = spark.createDataFrame(
        [("seed", "s1", "html", home_url, 1, 0)],
        "link_source string, link_source_id string, ingest_type string, "
        "base_url string, priority long, link_depth long")
    small = {"ingest_request": reqs, "cdx": cdx, "pages": pages,
             "robots": corpus["robots"]}

    runner = CrawlRunner(spark, small, str(tmp_path / "ad"), discover=True)
    entries = runner.run(max_rounds=6)
    by_round = {e["round"]: e for e in entries}
    # r0 fetches the home page -> autodiscovers the feed URL
    assert by_round[0]["discovered"] == 1
    # r1 fetches the feed -> the feed parser discovers the article
    assert by_round[1]["discovered"] == 1
    # r2 fetches the article; then the frontier drains
    assert by_round[2]["frontier"] == 1
    assert entries[-1]["done"]
