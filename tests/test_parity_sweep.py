"""Parity sweep: xml_reserialize (C9), zipfile scan (S3), sha1
denylist (F9), grobid/crossref quality gates (F11/F12), 3-way score
join (J5), pdf_meta row shape, timeout guard."""

from __future__ import annotations

import io
import os
import time
import zipfile

import pytest
from pyspark.sql import functions as F


def test_xml_reserialize_scielo_fixture_parity():
    """The reference's own C9 test on its checked-in fixture
    (/root/reference/python/tests/test_xml.py:6-17): the scielo JATS
    article is declared+encoded ISO-8859-1 (not valid UTF-8), and
    re-serialization must yield a UTF-8 document."""
    from sandcrawler_spark.functions.xmlfmt import xml_reserialize_py

    path = os.path.join(os.path.dirname(__file__), "files", "scielo_article.jats.xml")
    raw = open(path, "rb").read()
    assert b'encoding="ISO-8859-1"' in raw
    raw.decode("ISO-8859-1")
    with pytest.raises(UnicodeDecodeError):
        raw.decode("utf-8")
    out = xml_reserialize_py(raw)
    assert out is not None and out.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    # the re-serialized form IS utf-8 and survives a second pass
    assert xml_reserialize_py(out.encode("utf-8")) is not None


def test_xml_reserialize_roundtrip():
    from sandcrawler_spark.functions.xmlfmt import xml_reserialize_py

    raw = b"<?xml version='1.0' encoding='utf-8'?><doc a='1'><x>hi</x></doc>"
    out = xml_reserialize_py(raw)
    assert out.startswith('<?xml version="1.0" encoding="UTF-8"?>\n')
    assert '<doc a="1"><x>hi</x></doc>' in out
    # idempotent on its own output
    assert xml_reserialize_py(out.encode()) == out
    assert xml_reserialize_py(b"<broken") is None


def test_zip_member_scan(spark, tmp_path):
    from sandcrawler_spark.sources.zipscan import scan_zip_members

    zpath = os.path.join(str(tmp_path), "batch.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("a/one.pdf", b"%PDF-1.4 one")
        z.writestr("a/two.pdf", b"%PDF-1.4 two two")
        z.writestr("notes.txt", b"not a pdf")
    rows = scan_zip_members(spark, zpath, suffix=".pdf").collect()
    got = {r.member_name: r for r in rows}
    assert set(got) == {"a/one.pdf", "a/two.pdf"}
    assert bytes(got["a/one.pdf"].content) == b"%PDF-1.4 one"
    assert got["a/two.pdf"].size_bytes == 16
    assert not any(r.truncated for r in rows)
    # member cap -> truncated flag, not a huge row
    capped = scan_zip_members(spark, zpath, suffix=".pdf", max_member_bytes=4).collect()
    assert all(len(bytes(r.content)) == 4 and r.truncated for r in capped)


def test_sha1_denylist_split(spark):
    from sandcrawler_spark.operators.denylist import filter_denylist, split_denylist

    df = spark.createDataFrame(
        [("aa" * 20, 1), ("bb" * 20, 2), ("cc" * 20, 3)], ["sha1hex", "v"]
    )
    deny = ["BB" * 20]  # case-insensitive on the list side
    kept, denied = split_denylist(df.withColumn("status", F.lit(None).cast("string")), deny)
    assert {r.sha1hex for r in kept.collect()} == {"aa" * 20, "cc" * 20}
    drows = denied.collect()
    assert len(drows) == 1 and drows[0].status == "skip-denylist"
    assert filter_denylist(df, deny).count() == 2


def test_grobid_and_crossref_gates(spark):
    from sandcrawler_spark.operators.score import crossref_keep_filter, grobid_keep_filter

    g = spark.createDataFrame(
        [
            ("s1", "good title", 200),
            ("s2", None, 200),
            ("s3", "failed extract", 500),
            ("s4", "x" * 2000, 200),
        ],
        ["sha1hex", "title", "status_code"],
    )
    assert [r.sha1hex for r in grobid_keep_filter(g).collect()] == ["s1"]
    c = spark.createDataFrame(
        [
            (1, "good", "journal-article"),
            (2, "good", "component"),
            (3, None, "journal-article"),
            (4, "good", "book-chapter"),
        ],
        ["id", "title", "release_type"],
    )
    assert sorted(r.id for r in crossref_keep_filter(c).collect()) == [1, 4]


def test_score_insertable_join(spark):
    from sandcrawler_spark.operators.score import score_insertable_join

    grobid = spark.createDataFrame(
        [
            ("s1", "statistical crawling methods", 200),
            ("s2", "unmatched grobid title here", 200),
            ("s3", "broken", 500),
        ],
        ["sha1hex", "title", "status_code"],
    )
    crossref = spark.createDataFrame(
        [
            (10, "Statistical Crawling: Methods", "journal-article"),
            (11, "something else entirely okay", "journal-article"),
        ],
        ["id", "title", "release_type"],
    )
    cdx = spark.createDataFrame(
        [("s1", "application/pdf", 1234), ("s2", "application/pdf", 99)],
        ["sha1hex", "mimetype", "warc_csize"],
    )
    out = score_insertable_join(grobid, crossref, cdx).collect()
    assert len(out) == 1
    r = out[0]
    assert r.sha1hex == "s1" and r.crossref_id == 10
    assert r.mimetype == "application/pdf" and r.warc_csize == 1234
    # same title modulo case/punctuation: 4 case/colon edits over 29
    # chars -> floor((29-4)*1000/29) = 862 (Levenshtein is raw-title)
    assert r.score == 862


def test_pdf_meta_row_shape(spark):
    from sandcrawler_spark.functions.hooks import with_pdf_meta

    df = spark.createDataFrame(
        [(b"%PDF-1.5 content here",), (b"<html>nope</html>",), (None,)],
        "blob binary",
    )
    rows = with_pdf_meta(df, "blob").select("pdf_meta.*").collect()
    by_status = {r.status: r for r in rows}
    ok = by_status["success"]
    assert ok.page_count >= 1 and ok.has_page0_thumbnail
    assert ok.page0_height == 842.0 and ok.page0_width == 595.0
    assert len(ok.sha1hex) == 40 and len(bytes(ok.page0_thumbnail)) == 16
    assert ok.pdf_version.startswith("1.")
    assert by_status["not-pdf"].sha1hex is not None
    assert by_status["empty-blob"].page_count is None


def test_record_budget_guard():
    from sandcrawler_spark.functions.guard import RecordTimeout, record_budget

    with record_budget(5.0):
        pass  # plenty of budget: no-op
    with pytest.raises(RecordTimeout):
        with record_budget(0.05):
            t0 = time.time()
            while time.time() - t0 < 2.0:
                pass


def test_crawl_order_dump_global_order(spark):
    from pyspark.sql import functions as SF

    from sandcrawler_spark.operators.cdxslice import crawl_order_dump

    df = spark.range(0, 5000).select(
        SF.concat(SF.lit("k"), SF.lpad((SF.col("id") * 7919 % 5000).cast("string"), 5, "0")).alias("surt"),
        SF.lpad((SF.col("id") % 97).cast("string"), 4, "0").alias("datetime"),
    )
    out = crawl_order_dump(df, ["surt", "datetime"], n_partitions=8)
    parts = out.rdd.glom().collect()
    flat = []
    for part in parts:  # partition order IS the global order
        keyed = [(r.surt, r.datetime) for r in part]
        assert keyed == sorted(keyed)  # sorted within each partition
        flat.extend(keyed)
    assert flat == sorted(flat)  # range partitioning: global order too
    assert len(flat) == 5000


def test_cdx_variant_slice_filters(spark):
    from sandcrawler_spark.operators.cdxslice import cdx_variant_slice

    rows = [
        ("com,a)/x.tar.gz", "2024", "application/gzip", 200, "h1"),
        ("com,a)/x.tar.gz", "2023", "application/gzip", 200, "h1"),  # dup hash, earlier dt
        ("com,b)/y.pdf", "2024", "application/pdf", 200, "h2"),
        ("com,c)/z.tar.gz", "2024", "application/gzip", 404, "h3"),  # bad status
        ("com,d)/w.py", "2024", "text/plain", 200, "h4"),
    ]
    cdx = spark.createDataFrame(rows, ["surt", "datetime", "mimetype", "status_code", "sha1hex"])
    tar = cdx_variant_slice(cdx, "tarball").collect()
    assert [(r.surt, r.datetime) for r in tar] == [("com,a)/x.tar.gz", "2023")]
    src = cdx_variant_slice(cdx, "source").collect()
    assert [r.sha1hex for r in src] == ["h4"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdx_variant_slice(cdx, "nope")


def test_politeness_crawl_delay_budget(spark):
    from sandcrawler_spark.operators.politeness import schedule_politeness

    frontier = spark.createDataFrame(
        [(f"https://h{i%2}.org/p{j}", f"h{i%2}.org", 1) for i in range(2) for j in range(20)],
        ["url", "host", "priority"],
    )
    robots = spark.createDataFrame(
        [("h0.org", 8, 30.0, []), ("h1.org", 8, 0.5, [])],
        "host string, max_parallel int, crawl_delay_s double, disallow_prefixes array<string>",
    )
    # 60s window: h0 delay 30s -> cap 2 (< max_parallel 8); h1 delay 0.5s -> cap 120 -> quota 8
    out = schedule_politeness(frontier, robots, round_window_s=60.0)
    quotas = {r.host: r.quota for r in out.select("host", "quota").distinct().collect()}
    assert quotas == {"h0.org": 2, "h1.org": 8}
    rounds = {r.host: r for r in out.groupBy("host").agg(
        F.max("crawl_round").alias("mx")).collect()}
    assert rounds["h0.org"].mx == 9  # 20 urls / quota 2
    assert rounds["h1.org"].mx == 2  # 20 urls / quota 8


def test_snapshot_merge_rewrites_only_touched_buckets(spark, tmp_path):
    from sandcrawler_spark.plans.tables import SnapshotTable

    t = SnapshotTable(spark, os.path.join(str(tmp_path), "tbl"), ["k"], n_buckets=16)
    base = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit("v0").alias("v"))
    t.overwrite(base)
    snap0 = t.current_snapshot()
    # merge a single key -> exactly one bucket rewritten
    batch = spark.createDataFrame([(7, "v1")], ["k", "v"])
    res = t.merge(batch)
    assert res["counts"] == {"inserted": 0, "updated": 1, "total": 2000}
    snap1 = t.current_snapshot()
    rewritten = {b for b in snap1["buckets"] if snap1["buckets"][b] != snap0["buckets"].get(b)}
    assert len(rewritten) == 1  # 15 of 16 buckets inherited by reference
    inherited = [b for b in snap1["buckets"] if b not in rewritten]
    assert all(snap1["buckets"][b] == snap0["buckets"][b] for b in inherited)
    # content correct
    got = {r.k: r.v for r in t.read().collect()}
    assert got[7] == "v1" and got[8] == "v0" and len(got) == 2000
    # on_conflict='nothing' keeps the existing row; new key inserts
    res2 = t.merge(spark.createDataFrame([(7, "v2"), (5000, "new")], ["k", "v"]), on_conflict="nothing")
    assert res2["counts"]["inserted"] == 1 and res2["counts"]["updated"] == 0
    got2 = {r.k: r.v for r in t.read().collect()}
    assert got2[7] == "v1" and got2[5000] == "new" and res2["counts"]["total"] == 2001
    # append is O(batch): bucket map grows, nothing rewritten
    snap2 = t.current_snapshot()
    t.append(spark.createDataFrame([(9999, "app")], ["k", "v"]))
    snap3 = t.current_snapshot()
    assert all(set(snap3["buckets"][b]) >= set(dirs) for b, dirs in snap2["buckets"].items())
    assert t.read().count() == 2002
    # time travel still works
    assert t.read_snapshot(snap0["id"]).count() == 2000


def test_crawl_round_denylist_and_scope_metrics(spark, corpus, tmp_path):
    from sandcrawler_spark.streaming.rounds import CrawlRunner

    # baseline round: learn one extracted sha1
    r1 = CrawlRunner(spark, corpus, os.path.join(str(tmp_path), "s1"))
    r1.run(max_rounds=1)
    ext = r1.extraction.read()
    assert ext is not None and ext.count() > 0
    victim = ext.select("sha1hex").orderBy("sha1hex").first().sha1hex
    n_base = ext.count()

    # same round with the victim denylisted: one fewer extraction,
    # denylist_skipped counts it
    r2 = CrawlRunner(spark, corpus, os.path.join(str(tmp_path), "s2"), denylist=[victim])
    r2.run(max_rounds=1)
    ext2 = r2.extraction.read()
    assert ext2.filter(F.col("sha1hex") == victim).count() == 0
    assert ext2.count() == n_base - 1
    m = r2.metrics.as_dict()
    assert m["denylist_skipped"] == 1
    assert "fulltext_scope_docs" in m


def test_parse_robots_groups_and_agent_matching():
    from sandcrawler_spark.functions.robots import parse_robots_py

    txt = """
# comment
Disallow: /ignored-before-group/

User-agent: googlebot
Disallow: /google-only/
Crawl-delay: 5

User-agent: sandcrawler-bot
User-agent: otherbot
Disallow: /api/
Allow: /api/public/
Crawl-delay: 2.5

User-agent: *
Disallow: /private/
Crawl-delay: not-a-number
"""
    # most specific agent group wins over * (the UA line token must be
    # contained in the crawler's product token, RFC 9309 style)
    r = parse_robots_py(txt, "sandcrawler-bot/1.0")
    assert r["crawl_delay_s"] == 2.5
    assert r["disallow_prefixes"] == ["/api/"]
    assert r["allow_prefixes"] == ["/api/public/"]
    assert r["n_groups"] == 3
    # unknown agent falls back to *
    r2 = parse_robots_py(txt, "randombot")
    assert r2["disallow_prefixes"] == ["/private/"]
    assert r2["crawl_delay_s"] is None  # bad delay value ignored
    # empty file -> permissive
    r3 = parse_robots_py("", "any")
    assert r3 == {"crawl_delay_s": None, "disallow_prefixes": [],
                  "allow_prefixes": [], "n_groups": 0}
    # empty Disallow means allow-all (not an empty-prefix rule)
    r4 = parse_robots_py("User-agent: *\nDisallow:", "any")
    assert r4["disallow_prefixes"] == []


def test_robots_table_feeds_politeness(spark):
    from sandcrawler_spark.functions.robots import robots_table
    from sandcrawler_spark.operators.politeness import schedule_politeness

    fetched = spark.createDataFrame(
        [
            ("a.org", b"User-agent: *\nDisallow: /blocked/\nCrawl-delay: 30"),
            ("b.org", b"User-agent: *\nCrawl-delay: 0.5"),
        ],
        "host string, body binary",
    )
    robots = robots_table(fetched, default_max_parallel=8)
    frontier = spark.createDataFrame(
        [("https://a.org/ok/1", "a.org", 1), ("https://a.org/blocked/2", "a.org", 1),
         ("https://b.org/x", "b.org", 1)],
        ["url", "host", "priority"],
    )
    out = schedule_politeness(frontier, robots, round_window_s=60.0)
    rows = {r.url: r for r in out.collect()}
    assert rows["https://a.org/blocked/2"].robots_excluded
    assert not rows["https://a.org/ok/1"].robots_excluded
    assert rows["https://a.org/ok/1"].quota == 2   # 60s / 30s delay
    assert rows["https://b.org/x"].quota == 8      # delay cap 120 > max_parallel


def test_snapshot_bucket_row_lineage(spark, tmp_path):
    from sandcrawler_spark.plans.tables import SnapshotTable

    t = SnapshotTable(spark, os.path.join(str(tmp_path), "lin"), ["k"], n_buckets=8)
    t.overwrite(spark.range(0, 100).select(F.col("id").alias("k"), F.lit("x").alias("v")))
    s0 = t.current_snapshot()
    assert sum(s0["bucket_rows"].values()) == 100 == s0["counts"]["total"]
    t.merge(spark.createDataFrame([(1, "y"), (5000, "z")], ["k", "v"]))
    s1 = t.current_snapshot()
    # per-bucket lineage stays consistent with the total after a
    # partition-level rewrite (inherited counts + rewritten counts)
    assert sum(s1["bucket_rows"].values()) == s1["counts"]["total"] == 101
    t.append(spark.createDataFrame([(7, "w")], ["k", "v"]))
    s2 = t.current_snapshot()
    assert sum(s2["bucket_rows"].values()) == s2["counts"]["total"] == 102


def test_crawl_round_routes_pdf_through_hooks(spark, corpus, tmp_path):
    from sandcrawler_spark.streaming.rounds import CrawlRunner

    r = CrawlRunner(spark, corpus, os.path.join(str(tmp_path), "pdfroute"))
    r.run(max_rounds=2)
    ext = r.extraction.read()
    pdf_rows = ext.filter(F.col("grobid").isNotNull())
    html_rows = ext.filter(F.col("grobid").isNull())
    assert pdf_rows.count() > 0 and html_rows.count() > 0
    p = pdf_rows.first()
    assert p.extractor == "grobid" and p.text is None
    assert p.grobid.status == "success" and p.grobid.doi.startswith("10.1234/")
    assert p.pdf_meta.page_count >= 1 and p.pdf_meta.has_page0_thumbnail
    h = html_rows.first()
    assert h.text is not None and h.pdf_meta is None and h.biblio is not None


def test_frontier_store_round_partitions(spark, tmp_path):
    from sandcrawler_spark.operators.politeness import schedule_politeness
    from sandcrawler_spark.plans.frontier_store import (
        read_round,
        rounds_available,
        write_frontier_rounds,
    )

    frontier = spark.createDataFrame(
        [(f"https://h{i%3}.org/p{j:03d}", f"h{i%3}.org", j % 4)
         for i in range(3) for j in range(12)],
        ["url", "host", "priority"],
    )
    robots = spark.createDataFrame(
        [(f"h{i}.org", 3, 0.1, []) for i in range(3)],
        "host string, max_parallel int, crawl_delay_s double, disallow_prefixes array<string>",
    )
    sched = schedule_politeness(frontier, robots).filter(F.col("crawl_round").isNotNull())
    path = os.path.join(str(tmp_path), "frontier")
    write_frontier_rounds(sched.select("url", "host", "priority", "crawl_round", "seq_in_round"), path)

    rounds = rounds_available(path)
    assert rounds == sorted({r.crawl_round for r in sched.select("crawl_round").distinct().collect()})

    r0 = read_round(spark, path, 0)
    # partition pruning: the scan carries a crawl_round partition filter
    plan = r0._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "crawl_round" in plan
    # contents match the schedule's round 0, no host exceeds its quota
    expected = {(r.url) for r in sched.filter(F.col("crawl_round") == 0).collect()}
    got_rows = r0.collect()
    assert {r.url for r in got_rows} == expected
    per_host = {}
    for r in got_rows:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert all(n <= 3 for n in per_host.values())


def test_robots_table_status_semantics(spark):
    """RFC 9309 §2.3.1: a 4xx robots fetch means allow-all; a 5xx
    means complete disallow; 200 parses the body as usual."""
    from sandcrawler_spark.functions.robots import robots_table

    body = b"User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
    fetched = spark.createDataFrame(
        [("ok.com", body, 200), ("gone.com", body, 404), ("down.com", body, 503)],
        "host string, body binary, status int",
    )
    r = {row.host: row for row in robots_table(fetched, status_col="status").collect()}
    assert r["ok.com"].disallow_prefixes == ["/private/"]
    assert r["ok.com"].crawl_delay_s == 2.0
    assert r["gone.com"].disallow_prefixes == [] and r["gone.com"].crawl_delay_s is None
    assert r["down.com"].disallow_prefixes == ["/"]


def test_context_pack_invariants(spark):
    """Concat-and-slice packing: spans tile the token stream exactly
    (no gaps, no overlaps, zero padding), window ids are the floor
    division of the span, and the layout is partitioning-invariant."""
    import __spark_entry__ as entry

    base = None
    for parts in (1, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts * 4))
        try:
            rows = sorted(
                entry.q_context_pack(spark, "/root/testdata/sf0.001").collect(),
                key=lambda r: r.doc_id,
            )
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
        offset = 0
        for r in rows:
            assert r.tok_start == offset, (r.doc_id, r.tok_start, offset)
            assert r.win_start == r.tok_start // 256
            assert r.win_end == (r.tok_start + r.n_tokens - 1) // 256
            assert r.win_end >= r.win_start
            offset += r.n_tokens
        layout = [(r.doc_id, r.tok_start, r.win_start, r.win_end) for r in rows]
        if base is None:
            base = layout
        else:
            assert layout == base


def test_ccnet_buckets_tertiles(spark):
    """CCNet head/middle/tail: per-language tertile sizes differ by at
    most 2 (integer floor split), and bucket order respects the score
    order — min(head score) >= max(middle) >= ... within each lang."""
    from collections import defaultdict

    import __spark_entry__ as entry

    rows = entry.q_ccnet_buckets(spark, "/root/testdata/sf0.001").collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.bucket].append(r.logprob_micronat)
    order = ("head", "middle", "tail")
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in order]
        assert max(sizes) - min(sizes) <= 2, (lang, sizes)
        for hi, lo in zip(order, order[1:]):
            if buckets.get(hi) and buckets.get(lo):
                assert min(buckets[hi]) >= max(buckets[lo]), (lang, hi, lo)
