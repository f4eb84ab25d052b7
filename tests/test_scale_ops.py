"""Design-scale runs of the round-3 primitives: global cumsum at 10^8
rows and span dedupe at ~6M tokens. Gated behind
SPARK_GRAFT_BIG_TESTS=1 (minutes of wall-clock); timings recorded in
BENCH.md.

  SPARK_GRAFT_BIG_TESTS=1 python -m pytest tests/test_scale_ops.py -q -s
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BIG_TESTS") != "1",
    reason="design-scale test: set SPARK_GRAFT_BIG_TESTS=1",
)

N_CUMSUM = int(os.environ.get("SPARK_GRAFT_CUMSUM_ROWS", 100_000_000))


def test_global_cumsum_1e8(spark):
    from sandcrawler_spark.operators.cumsum import global_cumsum

    df = spark.range(N_CUMSUM).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101).cast("long").alias("v")
    )
    t0 = time.time()
    out = global_cumsum(df, [F.col("k").asc()], "v")
    # spot-check: the LAST cumulative value equals the exact total sum
    last = out.orderBy(F.col("k").desc()).limit(1).collect()[0]
    wall = time.time() - t0
    total = df.agg(F.sum("v")).collect()[0][0]
    assert last.cum_value == total
    # and a mid-stream point equals the closed-form prefix sum
    mid_k = N_CUMSUM // 2
    mid = out.filter(F.col("k") == mid_k).collect()[0]
    prefix = sum(((i * 37) % 101) for i in range(mid_k + 1))
    assert mid.cum_value == prefix
    print(f"\nglobal_cumsum: {N_CUMSUM:,} rows in {wall:.1f}s "
          f"({N_CUMSUM / wall / 1e6:.1f}M rows/s)")


def test_span_dedupe_6m_tokens(spark):
    from sandcrawler_spark.operators.dedupe import span_dedupe

    # 20k docs x 250 globally-unique tokens (w<id>_<j>: zero repeated
    # grams by construction) + every 10th doc embeds the same 40-token
    # boilerplate block -> ~5M tokens, ~2k planted duplicated spans —
    # the web-boilerplate shape ExactSubstr exists for
    block = " ".join(f"b{i}" for i in range(40))
    unique_part = (
        "array_join(transform(sequence(0, 249),"
        " j -> concat('w', cast(id as string), '_', cast(j as string))), ' ')"
    )
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 == 0) & (F.col("id") > 0),
            F.concat(F.expr(unique_part), F.lit(" " + block)),
        ).otherwise(F.expr(unique_part)).alias("text"),
    )
    t0 = time.time()
    out = span_dedupe(docs, n=13).localCheckpoint(eager=True)
    wall = time.time() - t0
    n_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
    dropped = {r.doc_id: r.n_dropped for r in out.filter(F.col("n_dropped") > 0).collect()}
    # every copier (id % 10 == 0, id > 0) loses its 40-token block...
    copiers = [i for i in range(10, 20_000, 10)]
    assert all(dropped.get(i, 0) >= 40 for i in copiers[1:])
    print(f"\nspan_dedupe: {n_tokens:,} tokens in {wall:.1f}s "
          f"({n_tokens / wall / 1e6:.2f}M tokens/s), "
          f"{len(dropped):,} docs with dropped spans")


def test_build_postings_stopword_skew(spark):
    """VERDICT r4 item 3 gate: one term ('the') planted in 50% of 10^6
    docs. The old Window.partitionBy(term) buffered its ~500k postings
    in ONE task; the aggregate+join shape streams them. Pass = correct
    doc_freq for the hot term + wall-clock in the same league as the
    uniform case."""
    from sandcrawler_spark.operators.search import build_postings

    n_docs = 1_000_000
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 2 == 0, F.lit("the")).otherwise(
                F.concat(F.lit("u"), F.col("id"))
            ),
            F.concat(F.lit("w"), (F.col("id") % 977)),
            F.concat(F.lit("x"), (F.col("id") % 9973)),
        ).alias("text"),
    )
    t0 = time.time()
    p = build_postings(df)
    hot = p.filter(F.col("term") == "the").agg(
        F.max("doc_freq").alias("df"), F.count("*").alias("n")
    ).collect()[0]
    wall = time.time() - t0
    assert hot.df == n_docs // 2 and hot.n == n_docs // 2
    print(f"\nbuild_postings skew: {n_docs:,} docs, hot-term df={hot.df:,} "
          f"in {wall:.1f}s")


def test_span_paragraph_dedupe_hot_gram_skew(spark):
    """VERDICT r4 item 7 gate: a boilerplate span/paragraph planted in
    50% of 10^6 docs. Rank-1-by-window buffered every occurrence of
    the hot key in one task; the min(struct) aggregate + composite-key
    anti-join shapes stay balanced."""
    from sandcrawler_spark.operators.dedupe import paragraph_dedupe, span_dedupe

    n_docs = 1_000_000
    boiler = " ".join(f"b{j}" for j in range(13))  # one full 13-gram
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit(boiler + " "), F.lit("u"), F.col("id")),
        ).otherwise(F.concat(F.lit("v"), F.col("id"))).alias("text"),
    )
    t0 = time.time()
    out = span_dedupe(docs, n=13)
    agg = out.agg(F.sum("n_dropped").alias("d")).collect()[0]
    span_wall = time.time() - t0
    # every copy of the boilerplate except doc 0's is dropped (13
    # tokens each); nothing else repeats
    assert agg.d == (n_docs // 2 - 1) * 13

    pdocs = docs.withColumn("text", F.regexp_replace("text", boiler + " ", boiler + "\n"))
    t0 = time.time()
    pagg = paragraph_dedupe(pdocs).agg(
        F.sum(F.col("n_paras") - F.col("n_kept")).alias("d")
    ).collect()[0]
    para_wall = time.time() - t0
    assert pagg.d == n_docs // 2 - 1
    print(f"\nhot-gram skew: span {span_wall:.1f}s, paragraph {para_wall:.1f}s "
          f"at {n_docs:,} docs (50% boilerplate)")


def test_hyperball_1e5_node_graph(spark):
    """HyperBall at design shape: 10^5 hosts, ~3x10^5 edges, p=6 (64
    registers/host -> 6.4M register rows per iteration). Two hops of
    ball growth + centrality in bounded wall-clock; hub node must rank
    above the median leaf."""
    from sandcrawler_spark.operators.hyperball import hyperball

    n = 100_000
    # ring + chords + one mega-hub that everything points at
    base = spark.range(n)
    e = (
        base.select(
            F.concat(F.lit("h"), F.col("id")).alias("src_host"),
            F.concat(F.lit("h"), (F.col("id") + 1) % n).alias("dst_host"),
        )
        .unionByName(base.select(
            F.concat(F.lit("h"), F.col("id")).alias("src_host"),
            F.concat(F.lit("h"), (F.col("id") * 7919) % n).alias("dst_host"),
        ))
        .unionByName(base.filter(F.col("id") % 3 == 0).select(
            F.concat(F.lit("h"), F.col("id")).alias("src_host"),
            F.lit("h0").alias("dst_host"),
        ))
        .withColumn("weight", F.lit(1))
        .filter(F.col("src_host") != F.col("dst_host"))
    )
    t0 = time.time()
    out = hyperball(e, n_iter=2, p=6, direction="in")
    rows = {r.host: r for r in out.filter(F.col("host").isin("h0", "h77777")).collect()}
    wall = time.time() - t0
    hub, leaf = rows["h0"], rows["h77777"]
    assert hub.harmonic_micro > 100 * leaf.harmonic_micro
    assert hub.ball_1 > 10_000  # ~n/3 in-neighbors sketch-estimated
    print(f"\nhyperball: {n:,} hosts, 2 hops in {wall:.1f}s "
          f"(hub ball_1≈{hub.ball_1:,.0f})")


def test_anchor_summary_mega_target_skew(spark):
    """Skew gate for anchor_summary: one target ('home' page) receives
    5x10^5 anchors from distinct sources (half 'home', half 'start'),
    next to 10^5 uniform targets. The min(struct) aggregate must
    reduce tree-style — no per-key window buffering the mega-target's
    full anchor list in one task."""
    from sandcrawler_spark.operators.linkgraph import anchor_summary

    n_hot, n_uniform = 500_000, 100_000
    hot = spark.range(n_hot).select(
        F.concat(F.lit("https://s"), F.col("id")).alias("src_url"),
        F.lit("https://mega.example.com/").alias("dst_url"),
        F.when(F.col("id") % 2 == 0, F.lit("home")).otherwise(F.lit("start")).alias("anchor_text"),
    )
    uni = spark.range(n_uniform).select(
        F.concat(F.lit("https://u"), F.col("id")).alias("src_url"),
        F.concat(F.lit("https://t"), F.col("id"), F.lit(".example.com/")).alias("dst_url"),
        F.lit("link").alias("anchor_text"),
    )
    t0 = time.time()
    out = anchor_summary(hot.unionByName(uni).repartition(64))
    mega = out.filter(F.col("dst_url") == "https://mega.example.com/").collect()[0]
    n_rows = out.count()
    wall = time.time() - t0
    assert (mega.n_anchors, mega.n_texts, mega.top_text) == (n_hot, 2, "home")
    assert n_rows == n_uniform + 1
    print(f"\nanchor_summary skew: {n_hot + n_uniform:,} anchors, "
          f"mega-target {n_hot:,} in {wall:.1f}s")


def test_host_lpa_celebrity_skew(spark):
    """LPA argmax under skew: one celebrity host with 5x10^5 distinct
    neighbors (each carrying its own label into the vote) must not
    serialize — the min(struct) aggregate keeps the per-round work
    partial-aggregatable. Also plants a clique to check labels still
    resolve correctly next to the hub."""
    import time as _t

    from sandcrawler_spark.operators.linkgraph import host_lpa

    n = 500_000
    spokes = spark.range(n).select(
        F.concat(F.lit("spoke"), F.col("id").cast("string")).alias("src_host"),
        F.lit("celebrity.example.com").alias("dst_host"),
        F.lit(1).cast("long").alias("weight"),
    )
    clique = spark.createDataFrame(
        [("c1", "c2", 50), ("c2", "c3", 50), ("c1", "c3", 50)],
        "src_host string, dst_host string, weight long",
    )
    t0 = _t.time()
    got = {r.host: r.community for r in host_lpa(spokes.unionByName(clique), n_rounds=2).collect()}
    wall = _t.time() - t0
    print(f"\nhost_lpa celebrity: {n} spokes, 2 rounds in {wall:.1f}s")
    # sync LPA on a star oscillates (documented): after round 1 the hub
    # holds min(spoke labels)='spoke0' and every spoke holds the hub's
    # label; round 2 swaps them back — so at n_rounds=2 the hub carries
    # its own label and all spokes carry 'spoke0'. The clique converges.
    assert got["celebrity.example.com"] == "celebrity.example.com"
    assert got["spoke123"] == "spoke0"
    assert got["c1"] == got["c2"] == got["c3"] == "c1"
    assert wall < 120


def test_host_boilerplate_hot_line_skew(spark):
    """10^6 docs on ONE host all sharing a planted template line: the
    (host, line) doc-frequency group holds 10^6 members, but the
    distinct is keyed (host, doc, line) and the count agg partial-
    aggregates map-side — no single task materializes the cluster."""
    from sandcrawler_spark.operators.boilerplate import host_boilerplate_lines

    n = 1_000_000
    df = spark.range(n).select(
        F.lit("mega.example").alias("host"),
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("COOKIE WALL\nunique line "), F.col("id").cast("string")
        ).alias("text"),
    )
    t0 = time.time()
    bp = host_boilerplate_lines(df, min_pct=50, min_docs=3).collect()
    wall = time.time() - t0
    assert {(r.line, r.n_docs) for r in bp} == {("COOKIE WALL", n)}
    print(f"\nhost_boilerplate 1e6-doc hot line: {wall:.1f}s")
    assert wall < 120


def test_kmv_celebrity_group_skew(spark):
    """One group holding 10^6 distinct keys next to tiny groups: the
    two-level bottom-k never ranks the celebrity group in one task
    (level 1 is (group, partition)-keyed), and the estimator lands
    within the k=256 KMV error envelope (~3/sqrt(k) ≈ 19%)."""
    from sandcrawler_spark.operators.sketches import kmv_cardinality

    n = 1_000_000
    big = spark.range(n).select(
        F.lit("celebrity").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("k")
    )
    small = spark.range(100).select(
        F.lit("tiny").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("k")
    )
    t0 = time.time()
    got = {
        r.g: r
        for r in kmv_cardinality(
            big.unionByName(small).repartition(64), "k", ["g"], k=256
        ).collect()
    }
    wall = time.time() - t0
    assert got["tiny"].est_distinct == 100  # below k -> exact
    err = abs(got["celebrity"].est_distinct - n) / n
    print(f"\nkmv 1e6-key celebrity group: {wall:.1f}s, err {err:.3f}")
    assert err < 0.19
    assert wall < 120


def test_cdc_hot_chunk_skew(spark):
    """10^5 docs all sharing one boilerplate chunk content: the
    md5(chunk)-keyed groupBy partial-aggregates map-side, so the
    ~10^5-member hot group arrives as per-partition partials, never a
    materialized cluster. Also exercises the per-doc array transform
    at ~350-char docs."""
    from sandcrawler_spark.operators.cdc import cdc_dedupe_stats

    n = 100_000
    tpl = "subscribe to our newsletter for daily updates on everything "
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(tpl * 4),
            F.lit("unique tail "),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
    ).repartition(64)
    t0 = time.time()
    stats = cdc_dedupe_stats(df, min_occurrences=n // 2).collect()
    wall = time.time() - t0
    # at least one template chunk is shared by (nearly) all docs
    assert any(s.n_docs >= n * 9 // 10 for s in stats)
    print(f"\ncdc 1e5-doc hot chunk: {wall:.1f}s")
    assert wall < 180


def test_novelty_hot_gram_skew(spark):
    """A planted 8-gram present in 50% of 2*10^5 docs: first-bucket
    aggregate partials map-side and the join-back streams per key —
    no straggler task; novelty ratios stay exact."""
    from sandcrawler_spark.operators.novelty import novelty_curve

    n = 200_000
    hot = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0, F.lit(hot)
        ).otherwise(
            F.concat(F.lit("w"), F.col("id").cast("string"),
                     F.lit(" two three four five six seven eight"))
        ).alias("text"),
    ).repartition(64)
    t0 = time.time()
    rows = novelty_curve(df, n=8, bucket_size=1000).collect()
    wall = time.time() - t0
    by_bucket = {r.bucket: r for r in rows}
    # bucket 0 is all-novel; later buckets: the hot gram (half the
    # instances) is never novel again, the unique grams always are
    assert by_bucket[0].novelty_ppm == 1_000_000
    assert all(r.novelty_ppm == 500_000 for b, r in by_bucket.items() if b > 0)
    print(f"\nnovelty 2e5-doc 50% hot gram: {wall:.1f}s")
    assert wall < 180


def test_interval_join_hot_host_1e6(spark):
    # ONE host holds every point and every window: the bucket explode
    # spreads the hot key over (key, bucket) cells, so the join stays
    # an ordinary hash join — the naive BNLJ would be 1e6 * 2e4 = 2e10
    # range compares. Verified against a closed-form pair count.
    from sandcrawler_spark.operators.intervals import interval_join

    n_pts, n_win, span, stride = 1_000_000, 20_000, 500, 1_000
    pts = spark.range(n_pts).select(
        F.lit("hot.example.com").alias("host"),
        (F.col("id") * 20).cast("long").alias("ts_sec"),  # every 20s
        F.col("id").alias("pid"),
    )
    wins = spark.range(n_win).select(
        F.lit("hot.example.com").alias("host"),
        (F.col("id") * stride).cast("long").alias("start_sec"),
        (F.col("id") * stride + span).cast("long").alias("end_sec"),
        F.col("id").alias("w_id"),
    )
    t0 = time.time()
    got = interval_join(pts, wins, bucket_seconds=3600).count()
    wall = time.time() - t0
    # windows [1000w, 1000w+500) catch points ts=20p in [50w, 50w+25):
    # exactly 25 points per window while both ranges overlap
    full_windows = min(n_win, (n_pts * 20) // stride)
    expect = full_windows * (span // 20)
    assert got == expect
    print(f"\ninterval_join hot host: {n_pts} pts x {n_win} wins -> "
          f"{got} pairs in {wall:.1f}s")
    assert wall < 120


def test_host_mirrors_hot_fp_1e5(spark):
    # a boilerplate fingerprint shared by 1e5 hosts would explode the
    # fp self-join quadratically (1e10 pairs); the hot-fp cap excises
    # it while the planted true mirror pair still surfaces exactly.
    from sandcrawler_spark.operators.mirrors import host_mirror_pairs

    n_hosts = 100_000
    boiler = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.lit("BOILERPLATE").alias("fp"),
    )
    mirror = spark.range(40).select(
        F.explode(F.array(F.lit("h7"), F.lit("h8"))).alias("host"),
        F.concat(F.lit("doc"), F.col("id").cast("string")).alias("fp"),
    )
    df = boiler.unionByName(mirror)
    t0 = time.time()
    got = host_mirror_pairs(df, min_shared=2, max_fp_hosts=256).collect()
    wall = time.time() - t0
    assert len(got) == 1
    r = got[0]
    assert (r.host_a, r.host_b) == ("h7", "h8") and r.shared == 40
    # sizes still count the capped fp (41 each): jaccard = 40/42
    assert r.n_a == r.n_b == 41 and r.jaccard_ppm == 40 * 1_000_000 // 42
    print(f"\nhost_mirrors hot fp: {n_hosts} hosts sharing one fp -> "
          f"{len(got)} pair in {wall:.1f}s")
    assert wall < 120


def test_ktruss_hot_hub_star(spark):
    """k-truss hub safety: a 10^5-leaf star (zero triangles) plus a
    30-clique. The degree-oriented wedge enumeration must not explode
    the hub — orientation gives the hub out-degree 0/1 per wedge
    source, so the wedge join stays clique-sized. The star must peel
    in round 1, the clique must survive with support k-2 at every
    edge."""
    from sandcrawler_spark.operators.linkgraph import host_ktruss

    n_leaves = int(os.environ.get("SPARK_GRAFT_KTRUSS_LEAVES", 100_000))
    clique = [f"c{i:02d}" for i in range(30)]
    star = spark.range(n_leaves).select(
        F.lit("hub.example.net").alias("src_host"),
        F.concat(F.lit("leaf"), F.col("id").cast("string"), F.lit(".net")).alias("dst_host"),
    )
    cl = spark.createDataFrame(
        [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]],
        ["src_host", "dst_host"],
    )
    t0 = time.time()
    got = host_ktruss(star.unionByName(cl), k=4, max_rounds=4).collect()
    wall = time.time() - t0
    print(f"\n# ktruss star({n_leaves})+K30: {len(got)} edges in {wall:.1f}s")
    assert len(got) == 30 * 29 // 2
    assert all(r.support == 28 for r in got)
    assert wall < 120


def test_postings_compression_hot_stopword_1e6(spark):
    """Planted stopword in 90% of 10^6 docs: the varint-sizing rollup
    must stay aggregate-only (min/max/count partials per partition),
    no straggler task holding one term's full posting list. Also
    asserts the exact closed-form output for the synthetic corpus."""
    from sandcrawler_spark.operators.search import postings_compression

    n = 1_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # 90%: "the w<i>"; 10%: "w<i>" only -> 'the' has 900k postings,
        # every w<i> is a singleton
        F.when(F.col("id") % 10 < 9, F.concat(F.lit("the w"), F.col("id")))
        .otherwise(F.concat(F.lit("w"), F.col("id")))
        .alias("text"),
    )
    t0 = time.time()
    got = {(r.df_class, r.varint_bytes): r for r in postings_compression(docs).collect()}
    wall = time.time() - t0
    print(f"postings_compression 1e6 docs, 90% hot term: {wall:.1f}s")

    # 'the': 900k docs, ids 0..999998 -> mean gap (999998-0)/899999 = 1
    hot = got[("1000+", 1)]
    assert hot.n_terms == 1 and hot.n_postings == 900_000
    # singletons: 10^6 'w<i>' terms, absolute-id classes by id magnitude
    n_singleton = sum(r.n_postings for (dc, _), r in got.items() if dc == "1")
    assert n_singleton == n
    assert wall < 120


def test_maxscore_prune_1e6_docs(spark):
    # design-scale MaxScore receipt: 10^6 docs all matching a
    # stopword-grade term, a few thousand matching the rare term —
    # the ceiling prune must keep the fully-scored set within ~the
    # rare posting list, and the result must equal exact BM25
    import time

    from sandcrawler_spark.operators.search import bm25_topk, maxscore_topk

    n = int(os.environ.get("SPARK_GRAFT_MAXSCORE_DOCS", 1_000_000))
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common filler pad"), (F.col("id") % 17).cast("string"),
            F.when(F.col("id") % 500 == 0, F.lit(" rareterm")).otherwise(F.lit("")),
            F.lit(" tail words here"),
        ).alias("text"),
    )
    df = df.localCheckpoint(eager=True)
    terms = ["rareterm", "common"]
    t0 = time.time()
    counters: dict = {}
    pruned = [tuple(r) for r in maxscore_topk(df, terms, k=10, _counters=counters).collect()]
    t_pruned = time.time() - t0
    t0 = time.time()
    exact = [tuple(r) for r in bm25_topk(df, terms, k=10).collect()]
    t_exact = time.time() - t0
    assert pruned == exact
    assert counters["n_matching"] == n
    assert counters["n_scored"] <= n // 100  # ~rare posting list only
    print(
        f"maxscore 1e6: scored {counters['n_scored']}/{counters['n_matching']} "
        f"({t_pruned:.1f}s) vs exact ({t_exact:.1f}s)"
    )


def test_cdx_collapse_2e7_captures_hot_url(spark):
    """Design-scale shape proof for collapse_captures: 2*10^7 captures
    where ONE url holds 10M rows (the hot-URL case a per-URL window
    would serialize into a single task). The min(struct) aggregate
    must stay partition-parallel; exact expected bucket counts from
    the generator's closed form."""
    from sandcrawler_spark.operators.cdxslice import collapse_captures

    n = 20_000_000
    half = n // 2
    df = spark.range(n).select(
        F.when(F.col("id") < half, F.lit("https://hot.example.com/"))
        .otherwise(
            F.concat(F.lit("https://cold"), (F.col("id") % 1_000_000).cast("string"),
                     F.lit(".example.com/"))
        ).alias("url"),
        F.concat(
            F.lit("2020"),
            F.lpad(((F.col("id") % 12) + 1).cast("string"), 2, "0"),
            F.lpad(((F.col("id") % 28) + 1).cast("string"), 2, "0"),
            F.lpad((F.col("id") % 86400).cast("string"), 6, "0"),
        ).alias("datetime"),
        F.lit(200).alias("status_code"),
        F.lit("text/html").alias("mimetype"),
    )
    t0 = time.time()
    out = collapse_captures(df.dropDuplicates(["url", "datetime"]), digits=8)
    hot = out.filter(F.col("url") == "https://hot.example.com/")
    n_hot_buckets = hot.count()
    total_collapsed = hot.agg(F.sum("n_collapsed")).collect()[0][0]
    wall = time.time() - t0
    # (id%12, id%28) cycles with period lcm(12,28)=84: the hot url
    # lands in exactly 84 distinct (month, day) buckets
    assert n_hot_buckets == 84
    # and its collapsed rows sum to its distinct (url, datetime) count
    expect = (
        df.filter(F.col("url") == "https://hot.example.com/")
        .select("datetime").distinct().count()
    )
    assert total_collapsed == expect
    print(f"\ncdx_collapse: {n:,} captures (10M on one url) in {wall:.1f}s")
