"""Round-4 session-10 operators: HTML structure stats (tag density,
title clusters, meta-tag profile), postings varint-size planning,
multi-source frontier merge, outlink-target entropy, per-host circuit
breaker, WAT metadata-sidecar roundtrip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8") if isinstance(h, str) else h), t) for u, h, t in rows],
        "url string, html binary, text string",
    )


def test_tag_density_counts_and_binary_exclusion(spark):
    from sandcrawler_spark.functions.htmlstats import tag_density

    html = '<html><head><meta name="a" content="x"></head><body><p>hi</p><a href="/x">y</a></body></html>'
    rows = [
        ("https://h1.example.com/a", html, "hi y"),
        ("https://h1.example.com/b", html, "hi y"),
        # non-markup bodies must be excluded by the magic-byte gate
        ("https://h1.example.com/pdf", b"%PDF-1.4 xxxx", ""),
        ("https://h2.example.com/gz", b"\x1f\x8b\x08\x00junk", ""),
    ]
    got = {r.host: r for r in tag_density(_pages(spark, rows)).collect()}
    assert set(got) == {"h1.example.com"}
    r = got["h1.example.com"]
    assert r.n_pages == 2
    assert r.html_chars == 2 * len(html)
    assert r.text_chars == 2 * len("hi y")
    assert r.n_tags == 2 * html.count("<")
    assert r.n_para == 2 * html.count("<p>")
    assert r.n_anchor == 2 * html.count("<a ")
    assert r.n_meta == 2 * html.count("<meta ")
    assert r.text_permille == (1000 * r.text_chars) // r.html_chars


def test_title_clusters_spread(spark):
    from sandcrawler_spark.functions.htmlstats import title_clusters

    mk = lambda t: f"<html><head><title>{t}</title></head><body></body></html>"  # noqa: E731
    rows = [
        ("https://a.com/1", mk("cookieAbsent"), ""),
        ("https://b.com/2", mk("cookieAbsent"), ""),
        ("https://b.com/2", mk("cookieAbsent"), ""),  # recapture, same url
        ("https://c.com/3", mk("unique page"), ""),
        ("https://d.com/4", "<html><body>no title</body></html>", ""),
    ]
    got = {r.title: r for r in title_clusters(_pages(spark, rows), min_pages=2).collect()}
    assert set(got) == {"cookieAbsent"}
    r = got["cookieAbsent"]
    assert (r.n_pages, r.n_urls, r.n_hosts) == (3, 2, 2)
    assert r.exemplar_url == "https://a.com/1"


def test_meta_tag_profile(spark):
    from sandcrawler_spark.functions.htmlstats import meta_tag_profile

    h1 = '<meta name="citation_title" content="x"><meta name="citation_author" content="a"><meta name="citation_author" content="b">'
    h2 = '<meta name="citation_title" content="y">'
    rows = [("https://a.com/1", "<html>" + h1, ""), ("https://a.com/2", "<html>" + h2, "")]
    got = {r.meta_name: r for r in meta_tag_profile(_pages(spark, rows)).collect()}
    assert got["citation_title"].n_occurrences == 2 and got["citation_title"].n_pages == 2
    assert got["citation_author"].n_occurrences == 2 and got["citation_author"].n_pages == 1


def test_postings_compression_classes(spark):
    from sandcrawler_spark.operators.search import postings_compression

    # 'dense' in consecutive docs 1..5 (mean gap 1 -> 1 byte);
    # 'wide' in docs 0 and 40000 (mean gap 40000 -> 3 bytes);
    # 'lone' only in doc 300 (absolute id 300 -> 2 bytes)
    rows = [(i, "dense") for i in range(1, 6)]
    rows += [(0, "wide"), (40000, "wide"), (300, "lone")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.df_class, r.varint_bytes): r for r in postings_compression(docs).collect()}
    assert got[("2-9", 1)].n_terms == 1 and got[("2-9", 1)].n_postings == 5
    assert got[("2-9", 3)].n_postings == 2 and got[("2-9", 3)].est_bytes == 6
    assert got[("1", 2)].n_terms == 1 and got[("1", 2)].est_bytes == 2


def test_merge_frontiers_keep_best(spark):
    from sandcrawler_spark.operators.frontier import merge_frontiers

    a = spark.createDataFrame(
        [("u1", "h", 3, "2024-01-05 00:00:00", "fatcat"),
         ("u2", "h", 1, "2024-01-01 00:00:00", "fatcat")],
        "url string, host string, priority int, discovered_ts string, source string",
    ).withColumn("discovered_ts", F.col("discovered_ts").cast("timestamp"))
    b = spark.createDataFrame(
        [("u1", "h", 5, "2024-01-09 00:00:00", "spn"),
         ("u3", "h", 2, "2024-01-02 00:00:00", "spn")],
        "url string, host string, priority int, discovered_ts string, source string",
    ).withColumn("discovered_ts", F.col("discovered_ts").cast("timestamp"))
    c = spark.createDataFrame(
        [("u1", "h", 5, "2024-01-03 00:00:00", "bulk")],
        "url string, host string, priority int, discovered_ts string, source string",
    ).withColumn("discovered_ts", F.col("discovered_ts").cast("timestamp"))

    got = {r.url: r for r in merge_frontiers(a, b, c).collect()}
    assert set(got) == {"u1", "u2", "u3"}
    u1 = got["u1"]
    assert u1.priority == 5 and u1.n_sources == 3
    assert u1.discovered_ts.strftime("%Y-%m-%d") == "2024-01-03"
    # among the two priority-5 sources (spn, bulk) the lexicographically
    # first wins deterministically
    assert u1.best_source == "bulk"
    assert got["u2"].best_source == "fatcat" and got["u2"].n_sources == 1


def test_host_outlink_entropy_uniform_vs_funnel(spark):
    from sandcrawler_spark.operators.linkgraph import host_outlink_entropy

    # uniform: 4 targets x weight 2 -> H = ln(4); funnel: 99-vs-1
    rows = [("uni", f"t{i}", 2) for i in range(4)]
    rows += [("fun", "boost", 99), ("fun", "decoy", 1)]
    edges = spark.createDataFrame(rows, "src_host string, dst_host string, weight long")
    got = {r.src_host: r for r in host_outlink_entropy(edges).collect()}

    uni = got["uni"]
    assert (uni.n_targets, uni.n_outlinks) == (4, 8)
    # exact integer replay: ln(8)*1e6 rounded - sum(2*round(ln(2)*1e6)) div 8
    expect = round(math.log(8) * 1e6) - (4 * 2 * round(math.log(2) * 1e6)) // 8
    assert uni.entropy_micronat == expect
    assert abs(uni.entropy_micronat - round(math.log(4) * 1e6)) < 5
    assert not uni.funnel

    fun = got["fun"]
    assert fun.entropy_micronat < 200_000 and fun.funnel


def test_circuit_breaker_states(spark):
    from sandcrawler_spark.operators.breaker import circuit_breaker

    rows = [
        # ok: recent success, no trailing failures
        ("ok", "2024-01-01 00:00:00", True),
        ("ok", "2024-01-02 00:00:00", False),
        ("ok", "2024-01-03 00:00:00", True),
        # hot: 3 failures after last success, last attempt recent -> open
        ("hot", "2024-01-30 00:00:00", True),
        ("hot", "2024-01-31 10:00:00", False),
        ("hot", "2024-01-31 11:00:00", False),
        ("hot", "2024-01-31 12:00:00", False),
        # cold: tripped long ago, cooled off -> half_open
        ("cold", "2024-01-01 00:00:00", False),
        ("cold", "2024-01-02 00:00:00", False),
        ("cold", "2024-01-03 00:00:00", False),
        # never succeeded but below threshold -> closed
        ("new", "2024-01-29 00:00:00", False),
    ]
    log = spark.createDataFrame(rows, "host string, ts string, success boolean").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {r.host: r for r in circuit_breaker(
        log, now_expr="timestamp'2024-02-01 00:00:00'",
        fail_threshold=3, cooloff_s=86400,
    ).collect()}
    assert got["ok"].state == "closed" and got["ok"].trailing_failures == 0
    assert got["hot"].state == "open" and got["hot"].trailing_failures == 3
    assert got["cold"].state == "half_open" and got["cold"].last_success is None
    assert got["new"].state == "closed" and got["new"].trailing_failures == 1


def test_wat_metadata_record_roundtrip(spark):
    import hashlib
    import json

    from sandcrawler_spark.sources.warcfmt import parse_warc_blob_rows

    payload = json.dumps({"u": "https://a.com/1", "t": "T", "l": ["/x", "/y"]},
                         separators=(",", ":"))
    rec = (
        "WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: https://a.com/1\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Record-ID: <urn:md5:x>\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n{payload}\r\n\r\n"
    ).encode()
    rows = parse_warc_blob_rows(rec * 2, path="p")
    assert len(rows) == 2
    for r in rows:
        assert r["warc_type"] == "metadata"
        assert bytes(r["payload_bytes"]) == payload.encode()
        assert r["payload_md5"] == hashlib.md5(payload.encode()).hexdigest()
        assert json.loads(bytes(r["payload_bytes"]))["l"] == ["/x", "/y"]


def test_lsh_tuning_monotone_and_exact(spark):
    from sandcrawler_spark.operators.dedupe import lsh_tuning

    # 3 planted near-dup pairs (one swapped word in a 12-word doc ->
    # jaccard well above 1/2) + unrelated docs
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = []
    for i in range(3):
        rows.append((i, base + f" tail{i}"))
        rows.append((100 + i, base + f" tail{i} extra"))
    for i in range(10, 20):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.bands, r.rows_per_band): r for r in lsh_tuning(docs, n_shingle=3).collect()}
    assert set(got) == {(2, 4), (4, 2), (8, 1)}

    # python replay of the exact integer-jaccard truth
    def sh3(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh3(t) for i, t in rows if len(t.split()) >= 3}
    ids = sorted(sets)
    n_truth = sum(
        1
        for x in range(len(ids))
        for y in range(x + 1, len(ids))
        if 2 * len(sets[ids[x]] & sets[ids[y]])
        >= len(sets[ids[x]] | sets[ids[y]])
    )
    assert n_truth >= 3  # at least the planted pairs
    assert all(r.n_true_pairs == n_truth for r in got.values())
    # recall is monotone in bands (looser blocking finds at least as much)
    r2, r4, r8 = got[(2, 4)], got[(4, 2)], got[(8, 1)]
    assert r2.recall_ppm <= r4.recall_ppm <= r8.recall_ppm
    assert r8.recall_ppm == 1_000_000  # 1-row bands: any shared minhash pairs
    # candidate volume is monotone too
    assert r2.n_candidates <= r4.n_candidates <= r8.n_candidates
    # ppm arithmetic is the exact integer identity
    for r in got.values():
        assert r.recall_ppm == (1_000_000 * r.n_true_candidates) // max(1, r.n_true_pairs)
        assert r.precision_ppm == (1_000_000 * r.n_true_candidates) // max(1, r.n_candidates)


def test_mixture_epochs_integer_identities(spark):
    from sandcrawler_spark.operators.sampling import mixture_epochs

    rows = [(i, "w " * 100, "big") for i in range(20)]          # 2000 tokens
    rows += [(100 + i, "w " * 10, "small") for i in range(2)]   # 20 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in mixture_epochs(docs, group_col="source").collect()}

    import math
    w_big, w_small = math.isqrt(2000), math.isqrt(20)
    tot_w, tot_tok = w_big + w_small, 2020
    for src, w, tok in (("big", w_big, 2000), ("small", w_small, 20)):
        r = got[src]
        assert r.n_tokens == tok
        assert r.weight_ppm == (1_000_000 * w) // tot_w
        assert r.alloc_tokens == (tot_tok * r.weight_ppm) // 1_000_000
        assert r.epochs_milli == (1000 * r.alloc_tokens) // tok
    # sqrt-temperature upweights the small source past 1 epoch and
    # holds the big one under it
    assert got["small"].epochs_milli > 1000 > got["big"].epochs_milli


def test_cdx_export_roundtrip_parses_all(spark):
    from sandcrawler_spark.functions.cdxfmt import parse_cdx_lines

    lines = spark.createDataFrame(
        [("org,ex)/a 20240101000000 https://ex.org/a text/html 200 "
          "ABCDEFGHIJKLMNOPABCDEFGHIJKLMNOP - - 123 456 W/x.warc.gz",),
         ("malformed line",)],
        "value string",
    )
    got = parse_cdx_lines(lines).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.surt, r.http_status, r.warc_csize, r.warc_offset) == ("org,ex)/a", 200, 123, 456)
    assert r.sha1b32 == "ABCDEFGHIJKLMNOPABCDEFGHIJKLMNOP"


def test_anchor_stuffing_flags_template_host(spark):
    from sandcrawler_spark.operators.linkgraph import anchor_stuffing

    rows = [("https://spam.com/p%d" % i, "https://t.com/x", "click here") for i in range(12)]
    rows += [("https://spam.com/p0", "https://t.com/y", "other")]
    rows += [("https://ok.com/p%d" % i, "https://t.com/%d" % i, "text %d" % i) for i in range(12)]
    anchors = spark.createDataFrame(rows, "src_url string, dst_url string, anchor_text string")
    got = {r.src_host: r for r in anchor_stuffing(anchors).collect()}

    spam = got["spam.com"]
    assert (spam.n_anchors, spam.n_texts, spam.top_text, spam.top_n) == (13, 2, "click here", 12)
    assert spam.top_share_ppm == (1_000_000 * 12) // 13 and spam.stuffed
    ok = got["ok.com"]
    assert ok.n_texts == 12 and ok.top_n == 1 and not ok.stuffed
    # tie on counts -> lexicographically first text wins deterministically
    tie = spark.createDataFrame(
        [("https://h.com/1", "d", "beta"), ("https://h.com/2", "d", "alpha")],
        "src_url string, dst_url string, anchor_text string",
    )
    assert anchor_stuffing(tie).collect()[0].top_text == "alpha"


def test_keep_longest_rep_selection(spark):
    # compose: CC labels via the production operator, then the
    # keep-longest policy beats min-doc-id when the longer variant has
    # the bigger id
    from sandcrawler_spark.operators.dedupe import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    cc = connected_components(pairs)
    lens = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (9, 7)], "doc_id long, len long"
    )
    labeled = lens.join(cc, lens.doc_id == cc.id, "left").select(
        "doc_id", "len", F.coalesce("label", "doc_id").alias("rep_id")
    )
    kept = {
        r.rep_id: r
        for r in labeled.groupBy("rep_id")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.expr("min_by(doc_id, struct(-len, doc_id))").alias("kept_doc_id"),
            F.max("len").alias("kept_len"),
        )
        .collect()
    }
    cluster = kept[min(kept)]
    assert cluster.cluster_size == 3
    # ties on len=50 -> smaller doc_id (2) wins over 3; both beat 1
    assert cluster.kept_doc_id == 2 and cluster.kept_len == 50
    assert kept[9].cluster_size == 1 and kept[9].kept_doc_id == 9


def test_robots_delta_classification(spark):
    got = {
        r.host: r
        for r in __import__("__spark_entry__").queries()["robots_delta"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # edits keyed by site_id % 5: 0 -> +disallow (tightened),
    # 1 -> +allow (loosened), 2 -> both (mixed), else untouched
    r0 = got["site0.example.com"]
    assert r0.change == "tightened" and r0.dis_added == 1 and r0.alw_added == 0
    r1 = got["site1.example.com"]
    assert r1.change == "loosened" and r1.alw_added == 1
    r2 = got["site2.example.com"]
    assert r2.change == "mixed" and r2.dis_added == 1 and r2.alw_added == 1
    r4 = got["site4.example.com"]
    assert r4.change == "unchanged" and r4.dis_added == r4.dis_removed == 0
    # empty-ruleset hosts (site_id%4==3) untouched by edits are absent
    assert "site3.example.com" not in got
