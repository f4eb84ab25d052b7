"""Round-4 session-8 operators: SALSA closed-form hub/authority,
degree assortativity, bucketed interval join, Markov event
transitions, median+MAD rate anomalies, and SoftDeDup weights."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salsa_closed_form_star_graph(spark):
    # star: h1,h2,h3 all -> hub.example; hub.example -> h1.
    # Bipartite support is one connected component.
    from sandcrawler_spark.operators.linkgraph import salsa_scores

    edges = spark.createDataFrame(
        [("h1", "hub"), ("h2", "hub"), ("h3", "hub"), ("hub", "h1")],
        ["src_host", "dst_host"],
    )
    got = {r.host: r for r in salsa_scores(edges).collect()}
    # bipartite support: H:hub and A:hub are DIFFERENT nodes, so there
    # are two components: {H:h1,H:h2,H:h3,A:hub} and {H:hub,A:h1}.
    # Authorities: comp1 {hub} n=1 D=3, comp2 {h1} n=1 D=1, |A|=2 ->
    # a(hub) = (1/2)*(3/3) = 500000 ppm = a(h1)
    assert got["hub"].authority_ppm == 500_000
    assert got["h1"].authority_ppm == 500_000
    # hub side: {h1,h2,h3,hub} each d_out per edge count; D=4, |H|=4,
    # one component -> hub_ppm = d_out/4: h1..h3 = 250000, hub = 250000
    for h in ("h1", "h2", "h3", "hub"):
        assert got[h].hub_ppm == 250_000
    # mass conservation: each side's ppm sums to ~1e6 (floor-div slack)
    assert 1_000_000 - 4 <= sum(r.hub_ppm for r in got.values()) <= 1_000_000
    assert 1_000_000 - 4 <= sum(r.authority_ppm for r in got.values()) <= 1_000_000


def test_salsa_components_split_mass(spark):
    # two disconnected bipartite components; the 2-authority component
    # gets 2/3 of authority mass regardless of in-degree imbalance
    from sandcrawler_spark.operators.linkgraph import salsa_scores

    edges = spark.createDataFrame(
        [("a1", "t1"), ("a2", "t1"), ("a1", "t2"), ("b1", "u1")],
        ["src_host", "dst_host"],
    )
    got = {r.host: r for r in salsa_scores(edges).collect()}
    # authorities: comp A = {t1(2), t2(1)} n=2 D=3; comp B = {u1(1)} n=1 D=1; |A|=3
    assert got["t1"].authority_ppm == (2 * 2 * 1_000_000) // (3 * 3)
    assert got["t2"].authority_ppm == (2 * 1 * 1_000_000) // (3 * 3)
    assert got["u1"].authority_ppm == (1 * 1 * 1_000_000) // (3 * 1)
    # source-only hosts have zero authority, sink-only zero hub
    assert got["a1"].authority_ppm == 0 and got["t1"].hub_ppm == 0


def test_degree_assortativity_signs(spark):
    from sandcrawler_spark.operators.linkgraph import degree_assortativity

    # star graph: perfectly disassortative -> r = -1
    star = spark.createDataFrame(
        [("c", f"l{i}") for i in range(5)], ["src_host", "dst_host"]
    )
    r = degree_assortativity(star).collect()[0]
    assert r.r_micro == -1_000_000
    # regular graph (every degree equal): denominator 0 -> defined 0
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src_host", "dst_host"]
    )
    assert degree_assortativity(tri).collect()[0].r_micro == 0


def test_interval_join_boundaries_and_exactness(spark):
    from sandcrawler_spark.operators.intervals import interval_join

    points = spark.createDataFrame(
        [("h", 100, "p_start"), ("h", 199, "p_last"), ("h", 200, "p_end"),
         ("h", 99, "p_before"), ("g", 150, "p_otherhost")],
        ["host", "ts_sec", "tag"],
    )
    windows = spark.createDataFrame(
        [("h", 100, 200, 1), ("h", 300, 300, 2), ("h", 400, 350, 3)],
        ["host", "start_sec", "end_sec", "w_id"],
    )
    got = interval_join(points, windows, bucket_seconds=7).collect()
    tags = sorted((r.tag, r.w_id) for r in got)
    # half-open [100,200): start in, end-1 in, end out, before out,
    # other host out; empty/inverted windows dropped
    assert tags == [("p_last", 1), ("p_start", 1)]


def test_interval_join_matches_naive_range_join(spark):
    # bucketed plan == naive BETWEEN predicate, pair for pair, across
    # bucket widths that are smaller, comparable, and larger than spans
    from sandcrawler_spark.operators.intervals import interval_join

    pts = spark.createDataFrame(
        [(f"h{i % 3}", 50 * i + (i * i) % 37, i) for i in range(200)],
        ["host", "ts_sec", "pid"],
    )
    wins = spark.createDataFrame(
        [(f"h{j % 3}", 400 * j, 400 * j + 30 + 130 * (j % 5), j) for j in range(25)],
        ["host", "start_sec", "end_sec", "w_id"],
    )
    naive = sorted(
        pts.join(wins, "host")
        .filter((F.col("ts_sec") >= F.col("start_sec")) & (F.col("ts_sec") < F.col("end_sec")))
        .select("pid", "w_id")
        .collect()
    )
    assert naive, "fixture must produce matches"
    for b in (16, 256, 100_000):
        got = sorted(interval_join(pts, wins, bucket_seconds=b).select("pid", "w_id").collect())
        assert got == naive, f"bucket_seconds={b}"


def test_event_transitions_counts_and_ppm(spark):
    from sandcrawler_spark.operators.eventseq import event_transitions

    rows = [
        # user 1: a -> b -> a -> b   (a->b twice, b->a once)
        (1, 1, "a", 10), (1, 2, "b", 20), (1, 3, "a", 30), (1, 4, "b", 40),
        # user 2: a -> c             (a->c once)
        (2, 5, "a", 10), (2, 6, "c", 20),
        # user 3: single event, no transition
        (3, 7, "z", 10),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    got = {(r.prev_type, r.next_type): r for r in event_transitions(df).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert got[("a", "b")].n == 2 and got[("a", "b")].p_ppm == 666_666
    assert got[("a", "c")].n == 1 and got[("a", "c")].p_ppm == 333_333
    assert got[("b", "a")].p_ppm == 1_000_000


def test_event_transitions_ts_tie_uses_tiebreak(spark):
    from sandcrawler_spark.operators.eventseq import event_transitions

    rows = [(1, 2, "b", 10), (1, 1, "a", 10), (1, 3, "c", 10)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    got = {(r.prev_type, r.next_type) for r in event_transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}  # event_id order, deterministic


def test_rate_anomalies_flags_planted_burst(spark):
    import datetime as dt

    from sandcrawler_spark.operators.eventseq import hourly_rate_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    # host A: 2 events every hour for 48h, except hour 30 has 40 (burst)
    for h in range(48):
        n = 40 if h == 30 else 2
        for i in range(n):
            rows.append(("A", base + dt.timedelta(hours=h, seconds=i)))
    # host B: perfectly flat -> MAD 0, nothing above median -> no flags
    for h in range(48):
        for i in range(3):
            rows.append(("B", base + dt.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, ["host", "ts"])
    got = hourly_rate_anomalies(df, F.col("host"), k_mad=3).collect()
    flagged = {(r.host, r.hour.hour + 24 * (r.hour.day - 1)) for r in got if r.is_anomaly}
    assert flagged == {("A", 30)}
    a = next(r for r in got if r.host == "A" and r.cnt == 40)
    assert a.med2 == 4 and a.mad8 == 0  # median 2, MAD 0 (one outlier hour)


def test_soft_dedupe_weights_cluster_inverse(spark):
    from sandcrawler_spark.operators.dedupe import soft_dedupe_weights

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = (
        [(i, shared) for i in range(4)]  # 4-doc duplicate cluster
        + [(10, "completely different unique text about marine biology plankton"),
           (11, "another singleton document concerning medieval castle economics")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in
           soft_dedupe_weights(df, n_shingle=3, k=8, bands=4, threshold=0.5).collect()}
    assert len(got) == 6  # every doc kept — soft, not hard, dedupe
    for i in range(4):
        assert got[i].cluster_size == 4 and got[i].weight_ppm == 250_000
    for i in (10, 11):
        assert got[i].cluster_size == 1 and got[i].weight_ppm == 1_000_000


def test_hll_sliding_matches_windowed_rebuild(spark):
    # the trailing-window merge of daily partials must equal the HLL
    # built directly on each window's raw keys (merge == single-shot)
    from sandcrawler_spark.operators.sketches import (
        hll_cardinality,
        hll_sliding_estimate,
    )

    rows = [(f"h{i % 3}", d, f"k{(i * 13 + d * 7) % 40}")
            for i in range(120) for d in range(5)]
    df = spark.createDataFrame(rows, ["host", "day", "key"])
    got = {(r.host, r.day): r for r in
           hll_sliding_estimate(df, "key", "host", "day", window_buckets=3, p=6).collect()}
    anchors = {(r.host, r.day) for r in df.select("host", "day").distinct().collect()}
    assert set(got) == anchors
    for (h, d) in sorted(anchors)[:6]:
        direct = hll_cardinality(
            df.filter((F.col("host") == h) & F.col("day").between(d - 2, d)),
            "key", [], p=6,
        ).collect()[0]
        assert got[(h, d)].hll_registers_used == direct.hll_registers_used
        assert got[(h, d)].hll_estimate == direct.hll_estimate


def test_host_mirror_pairs_exact_sets(spark):
    from sandcrawler_spark.operators.mirrors import host_mirror_pairs

    rows = (
        [("m1", f"f{i}") for i in range(10)]
        + [("m2", f"f{i}") for i in range(10)]          # exact mirror of m1
        + [("sub", f"f{i}") for i in range(5)]          # subset mirror
        + [("other", f"g{i}") for i in range(10)]       # disjoint
        + [("m1", "f0"), ("m1", "f1")]                  # dup rows: distinct-safe
    )
    df = spark.createDataFrame(rows, ["host", "fp"])
    got = {(r.host_a, r.host_b): r for r in host_mirror_pairs(df, min_shared=2).collect()}
    assert set(got) == {("m1", "m2"), ("m1", "sub"), ("m2", "sub")}
    full = got[("m1", "m2")]
    assert full.shared == 10 and full.jaccard_ppm == 1_000_000
    sub = got[("m1", "sub")]
    assert sub.shared == 5 and sub.jaccard_ppm == 500_000
    assert sub.cont_a_ppm == 500_000 and sub.cont_b_ppm == 1_000_000


def test_host_mirror_hot_fp_cap(spark):
    # a boilerplate fp on every host is excluded before the join; pair
    # sizes still count it (cap removes candidates, never inflates)
    from sandcrawler_spark.operators.mirrors import host_mirror_pairs

    rows = [(f"h{i}", "boiler") for i in range(10)] + [
        ("h0", "x1"), ("h0", "x2"), ("h1", "x1"), ("h1", "x2")]
    df = spark.createDataFrame(rows, ["host", "fp"])
    got = host_mirror_pairs(df, min_shared=2, max_fp_hosts=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.host_a, r.host_b) == ("h0", "h1")
    assert r.shared == 2 and r.n_a == 3 and r.n_b == 3  # boiler still counted in n
    assert r.jaccard_ppm == 500_000


def test_ewma_trend_directions(spark):
    import datetime as dt

    from sandcrawler_spark.operators.eventseq import ewma_host_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    # rising: 1/hr for 30h then 20/hr for 10h -> EWMA near 20, mean ~5.75
    for h in range(40):
        for i in range(1 if h < 30 else 20):
            rows.append(("up", base + dt.timedelta(hours=h, seconds=i)))
    # falling: mirror image
    for h in range(40):
        for i in range(20 if h < 10 else 1):
            rows.append(("down", base + dt.timedelta(hours=h, seconds=i)))
    # flat: constant
    for h in range(40):
        for i in range(3):
            rows.append(("steady", base + dt.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, ["host", "ts"])
    got = {r.host: r for r in ewma_host_trend(df, F.col("host")).collect()}
    assert got["up"].trend == "rising"
    assert got["down"].trend == "falling"
    assert got["steady"].trend == "flat"
    assert got["steady"].ewma_scaled == 24 and got["steady"].mean_scaled == 24


def test_ewma_fold_exact_known_series(spark):
    # hand-computed integer fold, D=8: xs=[5,3,4] -> 40, 38, 38
    import datetime as dt

    from sandcrawler_spark.operators.eventseq import ewma_host_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate([5, 3, 4]):
        for i in range(n):
            rows.append(("h", base + dt.timedelta(hours=h, seconds=i)))
    r = ewma_host_trend(spark.createDataFrame(rows, ["host", "ts"]), F.col("host")).collect()[0]
    assert r.ewma_scaled == 38 and r.n_hours == 3 and r.sum_cnt == 12


def test_pct_normalize_rfc3986_cases(spark):
    from sandcrawler_spark.functions.urls import pct_normalize_col

    cases = [
        ("http://h/%7euser", "http://h/~user"),          # decode unreserved
        ("http://h/a%2fb", "http://h/a%2Fb"),            # uppercase reserved
        ("http://h/%41%4a%30%2d%2e%5f%7e", "http://h/AJ0-._~"),
        ("http://h/100%25", "http://h/100%25"),          # %25 stays encoded
        ("http://h/p%", "http://h/p%"),                  # trailing malformed
        ("http://h/%zz", "http://h/%zz"),                # invalid hex
        ("%", "%"),
        ("no-escapes", "no-escapes"),
        ("%2F%2f%2F", "%2F%2F%2F"),
    ]
    df = spark.createDataFrame(cases, ["u", "expect"]).select(
        "u", "expect", pct_normalize_col(F.col("u")).alias("got"))
    for r in df.collect():
        assert r.got == r.expect, f"{r.u!r}: {r.got!r} != {r.expect!r}"
    # idempotent: normalizing twice is a no-op
    df2 = df.select("got", pct_normalize_col(F.col("got")).alias("twice"))
    for r in df2.collect():
        assert r.twice == r.got


def test_kmv_pairwise_overlap_exact_below_k(spark):
    from sandcrawler_spark.operators.sketches import kmv_pairwise_overlap

    rows = (
        [("a", f"k{i}") for i in range(30)]
        + [("b", f"k{i}") for i in range(15, 45)]   # |a ∩ b| = 15, |a ∪ b| = 45
        + [("c", f"z{i}") for i in range(10)]       # disjoint from both
    )
    df = spark.createDataFrame(rows, ["stratum", "key"])
    got = {(r.stratum_a, r.stratum_b): r
           for r in kmv_pairwise_overlap(df, "key", "stratum", k=64).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    # all unions fit in k=64 -> exact counts
    assert ab.est_union == 45 and ab.est_intersection == 15
    assert ab.jaccard_ppm == 15 * 1_000_000 // 45
    assert got[("a", "c")].est_intersection == 0
    assert got[("b", "c")].jaccard_ppm == 0


def test_kmv_pairwise_matches_kmv_intersection(spark):
    # the pairwise matrix must agree with the two-source operator on
    # each pair, including in the estimated (n >= k) regime
    from sandcrawler_spark.operators.sketches import (
        kmv_intersection,
        kmv_pairwise_overlap,
    )

    rows = (
        [("x", f"u{i}") for i in range(300)]
        + [("y", f"u{i}") for i in range(150, 450)]
    )
    df = spark.createDataFrame(rows, ["stratum", "key"])
    pair = kmv_pairwise_overlap(df, "key", "stratum", k=32).collect()[0]
    two = kmv_intersection(
        df.filter(F.col("stratum") == "x").withColumn("g", F.lit(1)),
        df.filter(F.col("stratum") == "y").withColumn("g", F.lit(1)),
        "key", ["g"], k=32,
    ).collect()[0]
    assert pair.n_union_kept == two.n_union_kept == 32
    assert pair.est_union == two.est_union
    assert pair.est_intersection == two.est_intersection


def test_distance_profile_star_vs_path(spark):
    from sandcrawler_spark.operators.hyperball import distance_profile

    # star (hub -> leaves): everything reachable within 1 hop on the
    # 'in' direction -> effective diameter 1 (ball_0 covers only 1/row)
    star = spark.createDataFrame(
        [("hub", f"l{i}") for i in range(8)], ["src_host", "dst_host"]
    )
    rows = {r.t: r for r in distance_profile(star, n_iter=3, p=8).collect()}
    assert [rows[t].is_effective_diameter for t in range(4)].count(True) == 1
    assert rows[1].is_effective_diameter  # hop 1 reaches >= 90% of final
    assert rows[3].frac_ppm == 1_000_000
    # path a->b->c->d: balls keep growing through hop 3
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src_host", "dst_host"]
    )
    prows = {r.t: r for r in distance_profile(path, n_iter=3, p=8).collect()}
    assert prows[3].is_effective_diameter
    assert prows[0].pairs_cents < prows[1].pairs_cents < prows[2].pairs_cents < prows[3].pairs_cents


def test_extract_meta_refresh_forms(spark):
    from sandcrawler_spark.operators.linkgraph import extract_meta_refresh

    pages = [
        ("https://ex.com/a",
         b'<html><head><meta http-equiv="refresh" content="0;url=https://new.com/a"></head></html>'),
        ("https://ex.com/b",
         b"<html><head><meta content='7; URL=/b2' http-equiv=REFRESH></head></html>"),
        ("https://ex.com/c",  # no url= -> not a redirect
         b'<html><head><meta http-equiv="refresh" content="30"></head></html>'),
        ("https://ex.com/d", b"<html><head><meta charset='utf-8'></head></html>"),
        ("https://ex.com/e",  # two tags: first wins
         b'<html><head><meta http-equiv=refresh content="1;url=/first">'
         b'<meta http-equiv=refresh content="2;url=/second"></head></html>'),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])
    got = {r.url: r for r in extract_meta_refresh(df).collect()}
    assert set(got) == {"https://ex.com/a", "https://ex.com/b", "https://ex.com/e"}
    assert got["https://ex.com/a"].delay_sec == 0
    assert got["https://ex.com/a"].target_url == "https://new.com/a"
    assert got["https://ex.com/b"].delay_sec == 7
    assert got["https://ex.com/b"].target_url == "https://ex.com/b2"
    assert got["https://ex.com/e"].target_url == "https://ex.com/first"


def test_host_moves_majority_and_noise(spark):
    from sandcrawler_spark.operators.linkgraph import host_moves

    rows = (
        # moved.com: 9/10 redirects to new.com -> moved
        [(f"https://moved.com/p{i}", "https://new.com/p") for i in range(9)]
        + [("https://moved.com/x", "https://cdn.com/x")]
        + # scattered.com: 3 destinations, max share 2/4 -> not moved
        [("https://scattered.com/1", "https://a.com/"), ("https://scattered.com/2", "https://b.com/"),
         ("https://scattered.com/3", "https://c.com/"), ("https://scattered.com/4", "https://a.com/")]
        + # tiny.com: 100% but only 2 redirects -> below min_count
        [("https://tiny.com/1", "https://t2.com/"), ("https://tiny.com/2", "https://t2.com/")]
        + # self redirects excluded entirely
        [("https://self.com/a", "https://self.com/b")]
    )
    df = spark.createDataFrame(rows, ["src_url", "dst_url"])
    got = {r.src_host: r for r in host_moves(df, min_count=5, share_ppm=800_000).collect()}
    assert set(got) == {"moved.com", "scattered.com", "tiny.com"}
    m = got["moved.com"]
    assert m.moved and m.dst_host == "new.com" and m.share_ppm == 900_000
    assert not got["scattered.com"].moved
    assert not got["tiny.com"].moved and got["tiny.com"].share_ppm == 1_000_000


def test_host_capacity_plan_arithmetic(spark):
    from sandcrawler_spark.operators.politeness import host_capacity_plan

    frontier = spark.createDataFrame(
        [("fast", i) for i in range(10)] + [("slow", i) for i in range(10)]
        + [("nodelay", 0)],
        ["host", "i"],
    )
    delays = spark.createDataFrame(
        [("fast", 100), ("slow", 60_000), ("unqueued", 100)], ["host", "delay_ms"])
    got = {r.host: r for r in
           host_capacity_plan(frontier, delays, round_seconds=60).collect()}
    assert set(got) == {"fast", "slow", "nodelay"}  # unqueued host absent
    f = got["fast"]   # 60s/100ms = 600 capacity >= 10 demand
    assert f.capacity == 600 and f.deficit == 0 and f.rounds_to_drain == 1
    s = got["slow"]   # 60s/60s = 1 fetch/round
    assert s.capacity == 1 and s.deficit == 9 and s.rounds_to_drain == 10
    n = got["nodelay"]  # default 1000ms -> 60 capacity
    assert n.delay_ms == 1000 and n.capacity == 60 and n.rounds_to_drain == 1


def test_host_topic_affinity_known_geometry(spark):
    from sandcrawler_spark.operators.similarity import host_topic_affinity

    rows = [
        ("aligned", [1.0, 0.0, 0.0]), ("aligned", [1.0, 0.0, 0.0]),
        ("orthogonal", [0.0, 1.0, 0.0]),
        ("opposite", [-1.0, 0.0, 0.0]),
        ("mixed", [1.0, 1.0, 0.0]),
    ]
    docs = spark.createDataFrame(rows, ["host", "embedding"])
    seed = spark.createDataFrame([([1.0, 0.0, 0.0],)], ["embedding"])
    got = {r.host: r for r in host_topic_affinity(docs, seed=seed).collect()}
    assert got["aligned"].affinity == 1.0 and got["aligned"].n_docs == 2
    assert got["orthogonal"].affinity == 0.0
    assert got["opposite"].affinity == -1.0
    assert abs(got["mixed"].affinity - 0.707107) < 1e-6


def test_host_topic_affinity_partitioning_invariant(spark):
    # integer (host, dim) sums commute: any input partitioning gives
    # the identical affinity table
    from sandcrawler_spark.operators.similarity import host_topic_affinity

    rows = [(f"h{i % 5}", [((i * 7 + j) % 13) / 13.0 - 0.4 for j in range(8)])
            for i in range(200)]
    seed_rows = [([0.3] * 8,), ([0.1] * 8,)]
    seed = spark.createDataFrame(seed_rows, ["embedding"])
    a = spark.createDataFrame(rows, ["host", "embedding"]).repartition(1)
    b = spark.createDataFrame(rows, ["host", "embedding"]).repartition(17, "host")
    ra = sorted(host_topic_affinity(a, seed=seed).collect())
    rb = sorted(host_topic_affinity(b, seed=seed).collect())
    assert ra == rb


def test_shard_cut_accounting(spark):
    from sandcrawler_spark.operators.sharding import (
        assign_shards,
        shard_cut,
    )

    rows = [(f"a{i}", f"b{(i * 3) % 20}") for i in range(60)] + [("x", "x")]
    edges = spark.createDataFrame(rows, ["src_host", "dst_host"])
    got = shard_cut(edges, n_shards=4).collect()
    # every distinct non-self edge accounted exactly once
    n_distinct = edges.filter("src_host <> dst_host").distinct().count()
    assert sum(r.n_edges for r in got) == n_distinct
    for r in got:
        assert r.n_internal + r.n_cross == r.n_edges
        assert r.cross_ppm == r.n_cross * 1_000_000 // r.n_edges
    # internal flags agree with a join against the assignment map
    m = {r.host: r.shard for r in assign_shards(
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host"))).distinct(),
        "host", n_shards=4).collect()}
    expect_internal = sum(
        1 for (s, d) in set(map(tuple, rows)) if s != d and m[s] == m[d])
    assert sum(r.n_internal for r in got) == expect_internal


def test_community_shard_cut_beats_rendezvous_on_clusters(spark):
    # two dense 6-cliques joined by one bridge edge: community
    # sharding keeps each clique whole (cross traffic = at most the
    # bridge), rendezvous scatters them
    from sandcrawler_spark.operators.sharding import (
        community_shard_cut,
        shard_cut,
    )

    rows = []
    for base in ("a", "b"):
        for i in range(6):
            for j in range(6):
                if i != j:
                    rows.append((f"{base}{i}", f"{base}{j}", 5))
    rows.append(("a0", "b0", 1))  # bridge
    edges = spark.createDataFrame(rows, ["src_host", "dst_host", "weight"])
    comm = community_shard_cut(edges, n_shards=8, n_rounds=3).collect()
    rdv = shard_cut(edges, n_shards=8).collect()
    cross_comm = sum(r.n_cross for r in comm)
    cross_rdv = sum(r.n_cross for r in rdv)
    total = sum(r.n_edges for r in comm)
    assert total == sum(r.n_edges for r in rdv)  # same distinct edge set
    assert cross_comm <= 1  # at most the bridge (0 if labels collide)
    assert cross_rdv > cross_comm  # rendezvous scatters the cliques
    for r in comm:
        assert r.n_internal + r.n_cross == r.n_edges
