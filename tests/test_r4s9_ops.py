"""Round-4 session-9 operators: UCB1 host scheduling, pagination-gap
mining, allocation Gini fairness, conditional-GET savings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_isqrt_exact(spark):
    from sandcrawler_spark.operators.bandit import isqrt_col

    # perfect squares, off-by-one neighbors, and big values near the
    # float-seed error zone
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**6, 10**6 - 1, 4 * 10**13, 4 * 10**13 + 1]
    vals += [k * k for k in (7, 1000, 6_324_555)] + [k * k - 1 for k in (7, 1000, 6_324_555)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.s for r in df.select("x", isqrt_col(F.col("x")).alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), (v, got[v], math.isqrt(v))


def test_ucb_scores_and_selection(spark):
    from sandcrawler_spark.operators.bandit import ucb_host_scores

    # host a: 8/10 success; host b: 1/2; host c: 0/1 (big bonus)
    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1), ("b", 0), ("c", 0)]
    trials = spark.createDataFrame(rows, ["host", "success"])
    got = {r.host: r for r in ucb_host_scores(trials, top_k=2).collect()}

    n_total = 13
    ln_micro = round(math.log(n_total) * 1_000_000)
    for host, n, s in (("a", 10, 8), ("b", 2, 1), ("c", 1, 0)):
        r = got[host]
        assert r.n_trials == n and r.n_success == s
        assert r.mean_micro == s * 1_000_000 // n
        assert r.bonus_micro == math.isqrt(2 * ln_micro * 1_000_000 // n)
        assert r.ucb_micro == r.mean_micro + r.bonus_micro

    # rarely-tried c has the largest exploration bonus and is selected
    assert got["c"].bonus_micro > got["a"].bonus_micro
    sel = {h for h, r in got.items() if r.selected}
    top2 = sorted(got, key=lambda h: (-got[h].ucb_micro, h))[:2]
    assert sel == set(top2) and len(sel) == 2


def test_ucb_fewer_hosts_than_k(spark):
    from sandcrawler_spark.operators.bandit import ucb_host_scores

    trials = spark.createDataFrame([("a", 1), ("b", 0)], ["host", "success"])
    got = ucb_host_scores(trials, top_k=10).collect()
    assert all(r.selected for r in got) and len(got) == 2


def test_pagination_gaps(spark):
    from sandcrawler_spark.operators.traps import pagination_gaps

    rows = [("a.org", f"https://a.org/page/{i}") for i in (1, 2, 3, 4, 5)]  # complete
    rows += [("a.org", f"https://a.org/item/{i}") for i in (10, 20, 30)]  # 18 holes
    rows += [("b.org", "https://b.org/p/1"), ("b.org", "https://b.org/p/2")]  # < min_pages
    rows += [("c.org", f"https://c.org/2024/{i}/post" ) for i in (1, 2, 3)]  # 2 digit runs: excluded
    rows += [("a.org", "https://a.org/page/3")]  # duplicate page: distinct-counted once
    df = spark.createDataFrame(rows, ["host", "url"])
    got = {(r.host, r.template): r for r in pagination_gaps(df, min_pages=3).collect()}

    assert set(got) == {("a.org", "/page/N"), ("a.org", "/item/N")}
    comp = got[("a.org", "/page/N")]
    assert (comp.n_pages, comp.min_page, comp.max_page, comp.n_missing, comp.complete) == (
        5, 1, 5, 0, True,
    )
    gap = got[("a.org", "/item/N")]
    assert (gap.n_pages, gap.n_missing, gap.complete) == (3, 18, False)


def test_allocation_gini(spark):
    from sandcrawler_spark.operators.budget import allocation_gini

    # equal split -> gini 0; one-host-takes-all over 4 hosts -> 3/4
    eq = spark.createDataFrame([(f"h{i}", 10) for i in range(5)], ["host", "alloc"])
    assert allocation_gini(eq).collect()[0].gini_ppm == 0

    uneq = spark.createDataFrame(
        [("h0", 0), ("h1", 0), ("h2", 0), ("h3", 100)], ["host", "alloc"]
    )
    r = allocation_gini(uneq).collect()[0]
    assert (r.n_keys, r.total, r.gini_ppm) == (4, 100, 750_000)


def test_gini_water_filling_compresses_inequality(spark):
    from sandcrawler_spark.operators.budget import allocate_budget, allocation_gini

    demands = spark.createDataFrame(
        [("h0", 5), ("h1", 10), ("h2", 200), ("h3", 1000)], ["host", "demand"]
    )
    alloc = allocate_budget(demands, 100)
    g_dem = allocation_gini(demands, value_col="demand").collect()[0].gini_ppm
    g_all = allocation_gini(alloc, value_col="alloc").collect()[0].gini_ppm
    assert g_all < g_dem  # the waterline flattens the split


def test_revalidation_savings(spark):
    from sandcrawler_spark.operators.recrawl import revalidation_savings

    # url u1 (html): digests A A B A -> 3 recaps, 1 unchanged (the 2nd A,
    # size 7); url u2 (pdf): single capture -> no recaps
    rows = [
        ("u1", "html", 100, "A", 5),
        ("u1", "html", 200, "A", 7),
        ("u1", "html", 300, "B", 9),
        ("u1", "html", 400, "A", 11),
        ("u2", "pdf", 100, "X", 99),
    ]
    df = spark.createDataFrame(rows, ["url", "mimetype", "epoch_s", "sha1hex", "warc_csize"])
    got = {r.grp: r for r in revalidation_savings(df).collect()}
    h = got["html"]
    assert (h.n_caps, h.n_recaps, h.n_unchanged, h.bytes_saved) == (4, 3, 1, 7)
    assert h.unchanged_ppm == 1_000_000 * 1 // 3
    p = got["pdf"]
    assert (p.n_caps, p.n_recaps, p.n_unchanged, p.bytes_saved, p.unchanged_ppm) == (
        1, 0, 0, 0, 0,
    )


def test_host_ktruss_star_vs_clique(spark):
    from sandcrawler_spark.operators.linkgraph import host_ktruss

    # 4-clique (every edge in 2 triangles) + star hub with 5 leaves
    # (no triangles, peeled by the 3-truss) + a lone triangle (each
    # edge support 1 — survives the 3-truss, falls to the 4-truss)
    clique = ["c0", "c1", "c2", "c3"]
    rows = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    rows += [("hub", f"leaf{i}") for i in range(5)]
    rows += [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    edges = spark.createDataFrame(rows, ["src_host", "dst_host"])
    got = {(r.a, r.b): r.support for r in host_ktruss(edges, k=3).collect()}

    # star edges gone; clique edges support 2; lone triangle support 1
    assert all(not a.startswith("hub") for a, _ in got)
    assert got[("c0", "c1")] == 2 and len([e for e in got if e[0].startswith("c")]) == 6
    assert got[("t1", "t2")] == 1

    # 4-truss: every edge needs >= 2 triangles -> only the clique stays
    got4 = {(r.a, r.b) for r in host_ktruss(edges, k=4).collect()}
    assert got4 == {(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]}


def test_ktruss_cascading_peel(spark):
    from sandcrawler_spark.operators.linkgraph import host_ktruss

    # K4 on {a,b,c,d} plus pendant triangle cde: triangles are
    # abc, abd, acd, bcd, cde — every edge is in >= 1 triangle, so the
    # whole graph survives the 3-truss with edge (a,b) at support 2
    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d"),
            ("c", "d"), ("c", "e"), ("d", "e")]
    edges = spark.createDataFrame(rows, ["src_host", "dst_host"])
    got3 = {(r.a, r.b): r.support for r in host_ktruss(edges, k=3).collect()}
    assert ("c", "e") in got3 and got3[("a", "b")] >= 2


def test_wet_record_roundtrip(spark):
    from sandcrawler_spark.sources.warcfmt import (
        parse_warc_blob_rows,
        wet_record_col,
    )

    df = spark.createDataFrame(
        [("https://x.org/a", "2024-01-01T00:00:00Z", "héllo wörld"),
         ("https://x.org/b", "2024-01-02T00:00:00Z", "")],
        ["url", "date", "text"],
    )
    blob = "".join(
        r.rec
        for r in df.select(
            wet_record_col(F.col("url"), F.col("date"), F.col("text")).alias("rec")
        ).collect()
    ).encode("utf-8")
    recs = parse_warc_blob_rows(blob, path="p")
    assert [r["warc_type"] for r in recs] == ["conversion", "conversion"]
    a, b = recs
    assert a["target_uri"] == "https://x.org/a"
    assert a["rec_content_length"] == len("héllo wörld".encode("utf-8"))
    assert bytes(a["payload_bytes"]).decode("utf-8") == "héllo wörld"
    assert b["rec_content_length"] == 0 and b["payload_md5"] is not None


def test_segment_coverage(spark):
    from sandcrawler_spark.operators.bpe import segment_coverage

    docs = spark.createDataFrame(
        [("X", "ab abc"), ("Y", "xyz")], ["source", "text"]
    )
    got = {r.stratum: r for r in segment_coverage(docs, [("a", "b")]).collect()}
    x = got["X"]  # ab -> 1 unit, abc -> ab|c = 2 units
    assert (x.n_words, x.n_tokens, x.fertility_ppm, x.one_unit_ppm) == (
        2, 3, 1_500_000, 500_000,
    )
    y = got["Y"]  # xyz: no merge applies -> 3 char units
    assert (y.n_words, y.n_tokens, y.fertility_ppm, y.one_unit_ppm) == (
        1, 3, 3_000_000, 0,
    )


def test_reshard_churn_strategies(spark):
    from sandcrawler_spark.operators.sharding import reshard_churn, ring_shard_col

    keys = spark.range(2000).select(F.concat(F.lit("host"), F.col("id")).alias("k"))
    got = {r.strategy: r for r in reshard_churn(keys, key_col="k", n_from=8, n_to=9).collect()}
    # mod reshuffles ~8/9 of the world; rendezvous moves ~1/9 and ONLY
    # onto the new shard; the ring approximates 1/9
    assert got["mod"].moved_ppm > 800_000
    assert got["rendezvous"].moved_ppm < 200_000
    assert got["ring"].moved_ppm < 250_000
    assert all(r.n_keys == 2000 for r in got.values())

    # ring ownership is total: every key gets a shard in [0, n)
    shards = keys.select(ring_shard_col(F.col("k"), 8, vnodes=8).alias("s"))
    lo, hi = shards.agg(F.min("s"), F.max("s")).collect()[0]
    assert 0 <= lo and hi <= 7


def test_rendezvous_growth_moves_only_to_new_shard(spark):
    from sandcrawler_spark.operators.sharding import rendezvous_shard_col

    keys = spark.range(1000).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    pair = keys.select(
        rendezvous_shard_col(F.col("k"), 8).alias("b"),
        rendezvous_shard_col(F.col("k"), 9).alias("a"),
    )
    moved = pair.filter(F.col("b") != F.col("a"))
    # minimal-disruption property: a key only ever moves to the NEW shard
    assert moved.filter(F.col("a") != 8).count() == 0
    assert 0 < moved.count() < 1000 * 25 // 100


def test_sq8_self_query_rank1(spark):
    from sandcrawler_spark.operators.pq import sq_bounds, sq_encode_col, sq_topk

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bounds = sq_bounds(e)
    assert len(bounds) == 8 and all(lo <= hi for lo, hi in bounds)
    codes = e.select("vec_id", sq_encode_col("embedding", bounds).alias("sq_codes"))
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = sq_topk(qs, codes, bounds, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in by_q.items():
        best = min(rs, key=lambda r: (r.sqdist_code, r.vec_id))
        # a vector quantized with the same bounds is code-identical to
        # itself: self-distance 0, rank 1
        assert best.vec_id == q_id and best.sqdist_code == 0
    # codes are bytes
    mx = codes.select(F.array_max("sq_codes").alias("m")).agg(F.max("m")).collect()[0][0]
    assert 0 <= mx <= 255


def test_host_wcc_query_islands(spark):
    # two disjoint islands in a crafted edge set -> two components with
    # the right sizes, labels = min 60-bit md5 id per island
    from sandcrawler_spark.operators.dedupe import connected_components

    def hid(h):
        import hashlib
        return int(hashlib.md5(h.encode()).hexdigest()[:15], 16)

    rows = [("a", "b"), ("b", "c"), ("x", "y")]
    pairs = spark.createDataFrame(
        [(hid(a), hid(b)) for a, b in rows], ["id_a", "id_b"]
    )
    got = {r.id: r.label for r in connected_components(pairs).collect()}
    assert got[hid("a")] == got[hid("b")] == got[hid("c")] == min(map(hid, "abc"))
    assert got[hid("x")] == got[hid("y")] == min(map(hid, "xy"))
    assert got[hid("a")] != got[hid("x")]


def test_pagination_fill(spark):
    from sandcrawler_spark.operators.traps import pagination_fill

    rows = [("a.org", f"https://a.org/page/{i}") for i in (1, 2, 4, 6)]  # missing 3, 5
    rows += [("a.org", f"https://a.org/doc/deadbeefcafe{i}/x") for i in (1, 2, 3)]  # hex: skipped
    rows += [("b.org", f"https://b.org/p/{i}") for i in (1, 1000,)]  # < min_pages
    df = spark.createDataFrame(rows, ["host", "url"])
    got = sorted(
        (r.host, r.page_n, r.url) for r in pagination_fill(df, min_pages=3).collect()
    )
    assert got == [
        ("a.org", 3, "https://a.org/page/3"),
        ("a.org", 5, "https://a.org/page/5"),
    ]


def test_pagination_fill_respects_max_fill(spark):
    from sandcrawler_spark.operators.traps import pagination_fill

    rows = [("a.org", f"https://a.org/item/{i}") for i in (1, 2, 5000)]  # 4997 holes
    df = spark.createDataFrame(rows, ["host", "url"])
    assert pagination_fill(df, min_pages=3, max_fill=200).count() == 0


def test_host_branching(spark):
    from sandcrawler_spark.operators.traps import host_branching

    rows = [
        ("a.org", "https://a.org/x/1"),
        ("a.org", "https://a.org/x/2"),
        ("a.org", "https://a.org/y/1"),
        ("a.org", "https://a.org/y/1"),  # dup URL: distinct-counted once
        ("a.org", "https://a.org/x/1/deep?q=1"),  # query stripped
    ]
    df = spark.createDataFrame(rows, ["host", "url"])
    got = {r.depth: r for r in host_branching(df).collect()}
    # depth 1: {x, y}; depth 2: {x/1, x/2, y/1} (3 nodes from 2 parents);
    # depth 3: {x/1/deep} from 1 parent
    assert (got[1].n_nodes, got[1].parent_nodes) == (2, 1)
    assert (got[2].n_nodes, got[2].parent_nodes) == (3, 2)
    assert got[2].branching_ppm == 1_500_000
    assert (got[3].n_nodes, got[3].parent_nodes, got[3].branching_ppm) == (1, 1, 1_000_000)


def test_parse_retry_after(spark):
    from sandcrawler_spark.operators.politeness import parse_retry_after_col

    now = 1_700_000_000  # epoch anchor for the http-date rows
    rows = [
        ("120", now, 120),                                  # delta-seconds
        ("0", now, 0),
        ("Tue, 14 Nov 2023 22:15:00 GMT", now, 100),        # now (22:13:20) + 100 s
        ("Tue, 14 Nov 2023 21:00:00 GMT", now, 0),          # past -> clamp 0
        ("soon", now, None),                                # unparseable
        ("12abc", now, None),
    ]
    df = spark.createDataFrame(
        [(v, n) for v, n, _ in rows], ["retry_after", "now_epoch"]
    )
    got = [
        r.d
        for r in df.select(
            parse_retry_after_col(F.col("retry_after"), F.col("now_epoch")).alias("d")
        ).collect()
    ]
    assert got == [want for _, _, want in rows]


def test_ring_balance_vnodes_smooth_load(spark):
    from sandcrawler_spark.operators.sharding import ring_balance

    keys = spark.range(4000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    got = ring_balance(keys, key_col="k", n_shards=8, vnode_counts=(2, 64)).collect()
    by = {}
    for r in got:
        by.setdefault(r.strategy, []).append(r.n_keys)
    # totals conserved per strategy; more vnodes => lower max/mean skew
    assert sum(by["ring_v2"]) == sum(by["ring_v64"]) == sum(by["rendezvous"]) == 4000
    skew = {s: max(v) * len(v) / sum(v) for s, v in by.items()}
    assert skew["ring_v64"] < skew["ring_v2"]
