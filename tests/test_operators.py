"""Operator semantics: seen-set (bloom == exact), politeness
(skew-safe rank == window oracle, deterministic across parallelism),
frontier recrawl selection, best-capture ranking, CDX line scan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sandcrawler_spark.functions.cdxfmt import parse_cdx_line_py, parse_cdx_lines
from sandcrawler_spark.operators.bestcapture import lookup_best, lookup_closest
from sandcrawler_spark.operators.frontier import build_frontier
from sandcrawler_spark.operators.politeness import (
    ranked_simple,
    ranked_within_key,
    schedule_politeness,
)
from sandcrawler_spark.operators.seen import (
    build_bloom,
    probe_bloom,
    unseen_bloom_exact,
    unseen_exact,
)

# ---------------------------------------------------------------------------
# URL-seen set
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_equivalence(spark, corpus):
    urls = corpus["cdx"].select(F.col("url")).distinct()
    n = urls.count()
    seen = urls.limit(n // 2).withColumnRenamed("url", "canon_url")
    frontier = urls.withColumnRenamed("url", "canon_url")

    bloom = build_bloom(seen, "canon_url", n_buckets=16)
    truly_seen = {r.canon_url for r in seen.collect()}
    exact = {r.canon_url for r in unseen_exact(frontier, seen, "canon_url").collect()}
    for strategy in ("broadcast", "cogroup"):
        probed = probe_bloom(frontier, bloom, "canon_url", n_buckets=16, strategy=strategy)
        # no false negatives: every truly-seen key must probe maybe_seen
        for r in probed.collect():
            if r.canon_url in truly_seen:
                assert r.maybe_seen, f"false negative ({strategy}): {r.canon_url}"
        combo = {
            r.canon_url
            for r in unseen_bloom_exact(
                frontier, seen, bloom, "canon_url", 16, strategy=strategy
            ).collect()
        }
        assert combo == exact, strategy
    assert len(exact) == n - len(truly_seen)


def test_bloom_incremental_merge(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(100)], ["k"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(100)], ["k"])
    both = a.union(b)
    m = 2048  # fixed sizing so partial blooms are mergeable
    bloom_a = build_bloom(a, "k", n_buckets=4, expected_keys_per_bucket=m)
    bloom_b = build_bloom(b, "k", n_buckets=4, expected_keys_per_bucket=m)
    bloom_ab = build_bloom(both, "k", n_buckets=4, expected_keys_per_bucket=m)
    # merging partial blooms == building from the union
    from sandcrawler_spark.operators.seen import BLOOM_SCHEMA, _merge_bucket

    merged = (
        bloom_a.unionByName(bloom_b)
        .groupBy("bucket")
        .applyInPandas(_merge_bucket, schema=BLOOM_SCHEMA)
    )
    got = {r.bucket: bytes(r.bitmap) for r in merged.collect()}
    want = {r.bucket: bytes(r.bitmap) for r in bloom_ab.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Politeness / skew-proof ranking
# ---------------------------------------------------------------------------


def _rank_df(spark, n_hosts=5, rows_per_host=(200, 50, 10, 3, 1)):
    data = []
    for h in range(n_hosts):
        for i in range(rows_per_host[h]):
            data.append((f"host{h}.com", f"https://host{h}.com/p{i:04d}", (i * 7) % 5))
    return spark.createDataFrame(data, ["host", "url", "priority"])


def test_ranked_cold_equals_window_oracle(spark):
    df = _rank_df(spark)
    order = [F.desc("priority"), F.asc("url")]
    simple = {
        (r.host, r.url): r.rank_in_key for r in ranked_simple(df, "host", order).collect()
    }
    # every host below the hot threshold -> identical to the plain window
    cold = {
        (r.host, r.url): r.rank_in_key
        for r in ranked_within_key(df, "host", "priority", "url", hot_threshold=10**6).collect()
    }
    assert cold == simple


def test_ranked_hot_path_invariants(spark):
    from collections import defaultdict

    df = _rank_df(spark)
    # force every host through the salted hot path
    for parts in (1, 8):
        got = ranked_within_key(
            df.repartition(parts), "host", "priority", "url", n_salts=4, hot_threshold=0
        ).collect()
        by_host = defaultdict(list)
        for r in got:
            by_host[r.host].append(r)
        for host, grp in by_host.items():
            ranks = sorted(r.rank_in_key for r in grp)
            assert ranks == list(range(len(grp))), f"not a bijection for {host}"
            grp.sort(key=lambda r: r.rank_in_key)
            prios = [r.priority for r in grp]
            assert all(a >= b for a, b in zip(prios, prios[1:])), f"priority order broken for {host}"
        if parts == 1:
            baseline = {(r.host, r.url): r.rank_in_key for r in got}
        else:
            assert {(r.host, r.url): r.rank_in_key for r in got} == baseline


def test_schedule_politeness_invariants(spark, corpus):
    frontier = build_frontier(corpus["ingest_request"], None)
    sched = schedule_politeness(frontier, corpus["robots"]).persist()
    rows = sched.filter(~F.col("robots_excluded")).collect()
    assert rows
    # quota respected: per (host, crawl_round) group size <= quota
    from collections import defaultdict

    per_round = defaultdict(list)
    for r in rows:
        per_round[(r.host, r.crawl_round)].append(r)
    for (host, rnd), grp in per_round.items():
        quota = grp[0].quota
        assert len(grp) <= quota, (host, rnd, len(grp), quota)
    # priority order within a host: a row in a later round never has
    # strictly higher priority than any row in an earlier round
    by_host = defaultdict(list)
    for r in rows:
        by_host[r.host].append(r)
    for host, grp in by_host.items():
        grp.sort(key=lambda r: r.rank_in_key)
        prios = [r.priority for r in grp]
        assert prios == sorted(prios, reverse=True) or all(
            p1 >= p2 for p1, p2 in zip(prios, prios[1:])
        )
    # input accounting: every allowed frontier row got a slot
    n_allowed = sched.filter(~F.col("robots_excluded")).count()
    n_excluded = sched.filter(F.col("robots_excluded")).count()
    assert n_allowed + n_excluded == frontier.count()
    sched.unpersist()


def test_schedule_deterministic_across_parallelism(spark, corpus):
    frontier = build_frontier(corpus["ingest_request"], None)
    a = schedule_politeness(
        frontier.repartition(1), corpus["robots"], skew_safe=True
    )
    b = schedule_politeness(
        frontier.repartition(8), corpus["robots"], skew_safe=True
    )
    key = lambda r: (r.ingest_type, r.canon_url)
    sa = {key(r): (r.crawl_round, r.seq_in_round) for r in a.collect()}
    sb = {key(r): (r.crawl_round, r.seq_in_round) for r in b.collect()}
    assert sa == sb


def test_robots_disallow(spark):
    frontier = spark.createDataFrame(
        [
            ("pdf", "https://h.com/login/secret", "h.com", 1, "https://h.com/login/secret"),
            ("pdf", "https://h.com/ok/page", "h.com", 1, "https://h.com/ok/page"),
        ],
        ["ingest_type", "base_url", "host", "priority", "url"],
    )
    robots = spark.createDataFrame(
        [("h.com", 0.5, ["/login"], 2)],
        ["host", "crawl_delay_s", "disallow_prefixes", "max_parallel"],
    )
    out = schedule_politeness(frontier, robots).collect()
    by_url = {r.url: r for r in out}
    assert by_url["https://h.com/login/secret"].robots_excluded
    assert by_url["https://h.com/login/secret"].crawl_round is None
    assert not by_url["https://h.com/ok/page"].robots_excluded


# ---------------------------------------------------------------------------
# Frontier / recrawl staleness
# ---------------------------------------------------------------------------


def test_frontier_dedupes_by_canonical_url(spark, corpus):
    f = build_frontier(corpus["ingest_request"], None)
    dups = (
        f.groupBy("ingest_type", "canon_url").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0


def test_frontier_recrawl_window(spark):
    now = "timestamp'2024-02-01 00:00:00'"
    reqs = spark.createDataFrame(
        [
            ("doi", "1", "pdf", "https://a.com/fresh", "bulk", None, None, 0, 0),
            ("doi", "2", "pdf", "https://a.com/stale-retryable", "bulk", None, None, 0, 0),
            ("doi", "3", "pdf", "https://a.com/too-old", "bulk", None, None, 0, 0),
            ("doi", "4", "pdf", "https://a.com/success-done", "bulk", None, None, 0, 0),
            ("doi", "5", "pdf", "https://a.com/never-tried", "bulk", None, None, 0, 0),
        ],
        "link_source string, link_source_id string, ingest_type string, base_url string,"
        "ingest_request_source string, release_stage string, request string, priority int, link_depth int",
    )
    t = dt.datetime(2024, 2, 1)
    results = spark.createDataFrame(
        [
            ("pdf", "https://a.com/fresh", "no-capture", t - dt.timedelta(hours=1)),
            ("pdf", "https://a.com/stale-retryable", "no-capture", t - dt.timedelta(days=2)),
            ("pdf", "https://a.com/too-old", "no-capture", t - dt.timedelta(days=30)),
            ("pdf", "https://a.com/success-done", "success", t - dt.timedelta(days=2)),
        ],
        "ingest_type string, base_url string, status string, updated timestamp",
    )
    out = {r.base_url for r in build_frontier(reqs, results, now_expr=now).collect()}
    # fresh failure -> wait; stale retryable -> retry; too old -> give up;
    # success -> done; never tried -> crawl
    assert out == {"https://a.com/stale-retryable", "https://a.com/never-tried"}


def test_frontier_cap_deterministic(spark, corpus):
    f1 = build_frontier(corpus["ingest_request"], None, cap=20)
    f2 = build_frontier(corpus["ingest_request"], None, cap=20)
    s1 = sorted(r.canon_url for r in f1.collect())
    s2 = sorted(r.canon_url for r in f2.collect())
    assert s1 == s2 and len(s1) == 20


# ---------------------------------------------------------------------------
# Best capture / as-of lookup
# ---------------------------------------------------------------------------


def test_lookup_best_prefers_200_right_mime_recent(spark):
    rows = [
        # url, datetime, mimetype, status, sha1hex, csize, warc_path
        ("u", "20240101000000", "text/html", 200, "aa", 10, "X/1.warc.gz"),
        ("u", "20240301000000", "application/pdf", 200, "bb", 10, "X/2.warc.gz"),
        ("u", "20240201000000", "application/pdf", 200, "cc", 10, "X/3.warc.gz"),
        ("u", "20240401000000", "application/pdf", 503, "dd", 10, "X/4.warc.gz"),
        ("u", "20240501000000", "warc/revisit", 200, "bb", 0, "X/5.warc.gz"),
    ]
    cdx = spark.createDataFrame(
        rows,
        "url string, datetime string, mimetype string, status_code int, sha1hex string,"
        "warc_csize long, warc_path string",
    )
    best = lookup_best(cdx, best_mimetype="application/pdf").collect()
    assert len(best) == 1
    # 200 + pdf + not-revisit + most recent datetime among those -> bb@2024-03
    assert best[0].sha1hex == "bb" and best[0].datetime == "20240301000000"


def test_lookup_closest_asof(spark):
    cdx = spark.createDataFrame(
        [
            ("u", "20240101000000"),
            ("u", "20240110000000"),
            ("u", "20240120000000"),
        ],
        "url string, datetime string",
    )
    targets = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 9, 0, 0, 0))], "url string, target_dt timestamp"
    )
    got = lookup_closest(cdx, targets).collect()
    assert len(got) == 1 and got[0].datetime == "20240110000000"


# ---------------------------------------------------------------------------
# CDX line scan
# ---------------------------------------------------------------------------


def test_parse_cdx_lines_matches_py(spark):
    good = (
        "com,example)/a 20200101000000 http://example.com/a application/pdf 200 "
        "TZCYZ2ULEHYGESS4L3RNH75I23KKFSMC - - 1234 5678 CRAWL/x.warc.gz"
    )
    bad1 = "filedesc://x.warc 20200101000000 filedesc://x.warc warc/filedesc - - - - 0 0 x"
    bad2 = "com,example)/b 20200101000000 http://example.com/b text/html 200 SHORT - - 1 2 y.warc.gz"
    df = spark.createDataFrame([(good,), (bad1,), (bad2,)], ["value"])
    out = parse_cdx_lines(df).collect()
    assert len(out) == 1
    want = parse_cdx_line_py(good)
    got = out[0].asDict()
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_robots_rfc9309_wildcards_and_precedence(spark):
    """RFC 9309 §2.2.2 (and the de-facto Google semantics): '*'
    matches any run, '$' anchors the end, the longest matching rule
    wins, Allow beats Disallow on equal length."""
    wild = [  # h.com: Disallow /fish*, /*.php$, /*.htm; Allow /x.htm
        ("https://h.com/fish", True),          # /fish*
        ("https://h.com/fishheads/x", True),   # /fish*
        ("https://h.com/fish.php", True),      # /*.php$ (6) beats /fish* (5)
        ("https://h.com/index.php", True),     # /*.php$
        ("https://h.com/index.php5", False),   # $-anchor: no match
        ("https://h.com/x.htm", False),        # Allow /x.htm (6) ties /*.htm (6) -> allow
        ("https://h.com/y.htm", True),         # /*.htm
    ]
    prec = [  # g.com: Disallow /, /folder; Allow /p, /folder/
        ("https://g.com/page", False),         # Allow /p (2) beats / (1)
        ("https://g.com/folder/page", False),  # Allow /folder/ (8) beats /folder (7)
        ("https://g.com/other", True),         # Disallow /
    ]
    rows = [("pdf", u, u.split("/")[2], 1, u) for u, _ in wild + prec]
    frontier = spark.createDataFrame(
        rows, ["ingest_type", "base_url", "host", "priority", "url"])
    robots = spark.createDataFrame(
        [("h.com", None, ["/fish*", "/*.php$", "/*.htm"], ["/x.htm"], 4),
         ("g.com", None, ["/", "/folder"], ["/p", "/folder/"], 4)],
        "host string, crawl_delay_s double, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, max_parallel long",
    )
    out = {r.url: r.robots_excluded for r in schedule_politeness(frontier, robots).collect()}
    for u, expect in wild + prec:
        assert out[u] is expect, (u, out[u], expect)


def test_soft404_tiers(spark):
    """Soft-404 heuristic: anchored error title; error phrase only in
    a TINY body; hard non-200s pass through as NULL."""
    from sandcrawler_spark.functions.soft404 import soft404_reason_col

    long_tail = " lorem ipsum" * 40  # pushes body past the tiny guard
    rows = [
        (1, 200, "404 Page Not Found", "gone", "soft404:title"),
        (2, 200, "Oops! Nothing here", "x", "soft404:title"),
        # anchoring keeps an article ABOUT 404s
        (3, 200, "Understanding Error 404 Handling", "guide" + long_tail, None),
        (4, 200, "Doc", "The page you requested was not found.", "soft404:tiny-error-body"),
        (5, 200, "Doc", "This resource does not exist.", "soft404:tiny-error-body"),
        # tiny guard: long article that merely mentions the phrase
        (6, 200, "Doc", "servers return error 404 sometimes" + long_tail, None),
        (7, 404, "404 Page Not Found", "gone", None),  # hard error -> NULL
        (8, 200, "Doc", "a perfectly fine article body", None),
        (9, 200, None, None, None),  # null-safe
    ]
    df = spark.createDataFrame(
        rows, "id int, status int, title string, body string, expect string")
    out = df.select(
        "id", "expect",
        soft404_reason_col(F.col("status"), F.col("title"), F.col("body")).alias("got"),
    )
    for r in out.collect():
        assert r.got == r.expect, (r.id, r.got, r.expect)


def test_registered_domain_psl(spark):
    """publicsuffix.org algorithm on the Spark tier: exception beats
    all, else longest rule, else implicit '*'; wildcard consumes a
    label; private hosting suffixes split sites. Vectors from the
    published checkPublicSuffix test data."""
    from sandcrawler_spark.functions.psl import (
        registered_domain_py,
        with_registered_domain,
    )

    cases = [
        ("example", None), ("example.example", "example.example"),
        ("b.example.example", "example.example"),
        ("com", None), ("example.com", "example.com"),
        ("WwW.Example.COM", "example.com"), ("a.b.example.com", "example.com"),
        ("co.uk", None), ("example.co.uk", "example.co.uk"),
        ("www.example.co.uk", "example.co.uk"),
        ("ck", None), ("test.ck", None), ("b.test.ck", "b.test.ck"),
        ("a.b.test.ck", "b.test.ck"),
        ("www.ck", "www.ck"), ("www.www.ck", "www.ck"),
        ("github.io", None), ("user.github.io", "user.github.io"),
        ("x.user.github.io", "user.github.io"),
        ("myblog.blogspot.com", "myblog.blogspot.com"),
        ("node1.compute.amazonaws.com", None),
        ("vm.node1.compute.amazonaws.com", "vm.node1.compute.amazonaws.com"),
        ("example.com.", "example.com"),  # trailing-dot FQDN form
    ]
    # python tier (fixture generator / property oracle)
    for h, want in cases:
        assert registered_domain_py(h) == want, h
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    out = {
        r.host: (r.public_suffix, r.registered_domain)
        for r in with_registered_domain(df).collect()
    }
    for h, want in cases:
        assert out[h][1] == want, (h, out[h])
    # the hot-path contract: no shuffle — broadcast joins only
    executed = with_registered_domain(df)
    executed.collect()  # AQE finalizes the plan only on execution
    plan = executed._jdf.queryExecution().executedPlan().toString()
    for shuffle in ("Exchange hashpartitioning", "Exchange rangepartitioning",
                    "ShuffleExchange"):
        assert shuffle not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bpe_encode_segments(spark):
    """bpe_segment applies an ORDERED merge list: ('at','a') compounds
    on round 1's ('a','t') output — 'data' -> d|at|a -> d|ata; merges
    create NEW symbols that don't self-re-merge within a round."""
    from sandcrawler_spark.operators.bpe import bpe_segment

    merges = [("a", "t"), ("e", "r"), ("s", "c"), ("at", "a"), ("o", "w")]
    df = spark.createDataFrame(
        [("data batch merge scan window order",), ("data table",)],
        "text string",
    )
    out = {r.word: (r.freq, r.units) for r in bpe_segment(df, merges).collect()}
    assert out["data"] == (2, ["d", "ata"])
    assert out["batch"] == (1, ["b", "at", "c", "h"])
    assert out["merge"] == (1, ["m", "er", "g", "e"])
    assert out["scan"] == (1, ["sc", "a", "n"])
    assert out["window"] == (1, ["w", "i", "n", "d", "ow"])
    assert out["order"] == (1, ["o", "r", "d", "er"])
    assert out["table"] == (1, ["t", "a", "b", "l", "e"])


def test_fix_mojibake_roundtrip_and_guards(spark):
    """Encoding repair: cp1252-mojibake round-trips to the original;
    plain ASCII, genuine '€'/'Ã', and non-Latin text are untouched
    (their bytes don't re-decode as valid UTF-8); the fix is
    idempotent."""
    from sandcrawler_spark.functions.encoding import (
        fix_mojibake_col,
        make_mojibake_col,
        mojibake_py,
    )

    cases = [
        "café — that's €99, naïve déjà vu",
        "plain ascii text stays",
        "real euro € kept as-is",
        "Ã standalone kept",
        "日本語 unicode text stays",
        "curly “quotes” and – dashes",
    ]
    rows = [(c, mojibake_py(c)) for c in cases[:1] + cases[-1:]] + [
        (c, c) for c in cases[1:-1]
    ]
    df = spark.createDataFrame(rows, "clean string, input string")
    out = df.select(
        "clean",
        "input",
        fix_mojibake_col(F.col("input")).alias("fixed"),
        fix_mojibake_col(fix_mojibake_col(F.col("input"))).alias("fixed2"),
        make_mojibake_col(F.col("clean")).alias("remade"),
    ).collect()
    for r in out:
        assert r.fixed == r.clean, (r.input, r.fixed)
        assert r.fixed2 == r.fixed, ("not idempotent", r.input)
    # Spark's corruption synthesizer twins the python fixture tier
    for r in out:
        assert r.remade == mojibake_py(r.clean)


def test_host_lpa_two_communities(spark):
    """Weighted LPA: two tight cliques joined by a weak bridge resolve
    to two communities (the bridge's weight-1 vote never outweighs
    clique-internal weight-5 votes); result is partitioning-invariant."""
    from sandcrawler_spark.operators.linkgraph import host_lpa

    edges = [
        ("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5),
        ("b1", "b2", 5), ("b2", "b3", 5), ("b1", "b3", 5),
        ("a3", "b1", 1),  # weak bridge
    ]
    for parts in (1, 8):
        df = spark.createDataFrame(
            edges, "src_host string, dst_host string, weight long"
        ).repartition(parts)
        got = {r.host: r.community for r in host_lpa(df, n_rounds=3).collect()}
        assert got == {
            "a1": "a1", "a2": "a1", "a3": "a1",
            "b1": "b1", "b2": "b1", "b3": "b1",
        }, got


def test_containment_catches_embedded_doc(spark):
    """Directional containment finds a doc EMBEDDED in a larger one
    where symmetric Jaccard stays below threshold (|A ∩ B| / |A| = 1
    but the union is dominated by B)."""
    from sandcrawler_spark.operators.dedupe import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    words = [f"w{i}" for i in range(200)]
    big = " ".join(words)
    embedded = " ".join(words[80:110])  # a 30-word slice of big
    df = spark.createDataFrame(
        [(1, embedded), (2, big), (3, "totally unrelated text here today")],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(df, n_shingle=3, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.cont_a_in_b) for r in cont] == [(1, 2, 1.0)]
    # symmetric jaccard at the same threshold misses it
    jac = ngram_jaccard_pairs(df, n_shingle=3, threshold=0.9).collect()
    assert jac == []


def test_nfc_normalization(spark):
    """NFC: decomposed and composed forms of the same visible string
    hash identically after normalization; ASCII rows skip the Arrow
    crossing via the is_nfc fast path (and are unchanged)."""
    from sandcrawler_spark.functions.unicode_norm import is_nfc_col, nfc_col, nfc_py

    dec = "café naïve"
    com = "café naïve"
    assert dec != com and nfc_py(dec) == nfc_py(com)
    df = spark.createDataFrame(
        [(1, dec), (2, com), (3, "plain ascii")], "id long, s string"
    )
    out = {
        r.id: (r.n, r.fast)
        for r in df.select(
            "id",
            F.when(is_nfc_col(F.col("s")), F.col("s"))
            .otherwise(nfc_col(F.col("s")))
            .alias("n"),
            is_nfc_col(F.col("s")).alias("fast"),
        ).collect()
    }
    assert out[1][0] == out[2][0]  # forms converge
    assert out[3] == ("plain ascii", True)  # fast path, untouched
    assert out[1][1] is False and out[2][1] is False


def test_line_dedupe_within_doc(spark):
    """Within-doc line dedup keeps the FIRST occurrence of each exact
    line in order; other docs' identical lines are untouched (dedup is
    per-document); counts reconcile."""
    from sandcrawler_spark.operators.dedupe import dedupe_lines_within_doc

    a = "nav\nreal content one\nnav\n\nreal content two\n\nnav"
    b = "nav\ndifferent doc"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {r.doc_id: r for r in dedupe_lines_within_doc(df).collect()}
    assert out[1].text == "nav\nreal content one\n\nreal content two"
    assert (out[1].n_lines, out[1].n_removed) == (7, 3)  # 2 navs + 1 blank
    assert out[2].text == b and out[2].n_removed == 0
