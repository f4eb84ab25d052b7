"""Round-4 session-14 operators: redirect closure, fuzzy URL join,
PMI token pairs, k-center coreset selection.

Reference parity anchors:
- redirect closure: batch/index-side form of the reference's per-fetch
  redirect following + hop caps (reference python/sandcrawler/ia.py
  redirect handling, ingest.py hop-cap 'redirect-loop' verdict).
- fuzzy URL join: scalable form of the reference's fuzzy URL matching
  (url_fuzzy_equal in python/sandcrawler/misc.py) — q-gram blocking
  instead of pairwise comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=32):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = resolve_redirects(df, max_hops=max_hops)
    return {r["src_url"]: (r["final_url"], r["n_hops"]) for r in out.collect()}


def test_redirects_simple_chain(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": ("d", 3), "b": ("d", 2), "c": ("d", 1)}


def test_redirects_cycle_and_feeder(spark):
    # x -> y -> z -> x is a 3-cycle; w feeds into it; t terminates
    got = _resolve(spark, [("x", "y"), ("y", "z"), ("z", "x"), ("w", "x"), ("t", "end")])
    assert got["t"] == ("end", 1)
    for n in ("x", "y", "z", "w"):
        assert got[n] == (None, -1)


def test_redirects_self_loop(spark):
    got = _resolve(spark, [("s", "s"), ("a", "s")])
    assert got["s"] == (None, -1)
    assert got["a"] == (None, -1)


def test_redirects_hop_cap_boundary(spark):
    # chain of exactly 8 hops resolves under cap 8; under cap 4 the
    # deep srcs exceed 2^ceil(log2(4)) = 4 hops and report -1
    chain = [(f"n{i}", f"n{i + 1}") for i in range(8)]  # n0..n7 -> n8
    got = _resolve(spark, chain, max_hops=8)
    assert got["n0"] == ("n8", 8)
    assert got["n7"] == ("n8", 1)
    got4 = _resolve(spark, chain, max_hops=4)
    assert got4["n4"] == ("n8", 4)
    assert got4["n0"] == (None, -1)


def _brute_pairs(ls, rs, k):
    def lev(a, b):
        # classic DP, small strings only (test oracle)
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    return {(a, b, lev(a, b)) for a in ls for b in rs if lev(a, b) <= k}


def test_fuzzy_join_matches_brute_force(spark):
    from sandcrawler_spark.operators.fuzzyjoin import fuzzy_join

    # long-enough strings (precondition: > k*q distinct grams) with
    # planted 1- and 2-edit variants plus unrelated strings
    base = [f"https://host{i}.example.org/path/to/page/{i * 7}" for i in range(30)]
    variants = [b[:20] + "Z" + b[21:] for b in base[:10]]  # 1 sub
    variants += [b[:20] + "Z" + b[22:] for b in base[10:20]]  # sub+del = 2
    ldf = spark.createDataFrame([(v,) for v in variants], ["a"])
    rdf = spark.createDataFrame([(b,) for b in base], ["b"])
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_join(ldf, rdf, "a", "b", k=2, q=3).collect()
    }
    assert got == _brute_pairs(variants, base, 2)
    assert len(got) >= 20  # every variant found its original


def test_fuzzy_join_k1_excludes_2edit(spark):
    from sandcrawler_spark.operators.fuzzyjoin import fuzzy_join

    base = ["abcdefghijklmnopqrstuvwxyz0123456789"]
    one = ["abcdefghijklmnopqrstuvwxyz012345678X"]
    two = ["abcdefghijklmnopqrstuvwxyz01234567XY"]
    ldf = spark.createDataFrame([(s,) for s in one + two], ["a"])
    rdf = spark.createDataFrame([(s,) for s in base], ["b"])
    got = {(r["a"], r["dist"]) for r in fuzzy_join(ldf, rdf, "a", "b", k=1).collect()}
    assert got == {(one[0], 1)}


def test_redirects_hops_exact_mid_chain(spark):
    # every src reports its exact distance to the shared terminal
    chain = [(f"m{i}", f"m{i + 1}") for i in range(6)]
    got = _resolve(spark, chain)
    for i in range(6):
        assert got[f"m{i}"] == ("m6", 6 - i)


def test_pmi_pairs_hand_computed(spark):
    import math

    from sandcrawler_spark.operators.collocations import pmi_pairs

    # a in 4 docs, b in 3, both in 2; c rides along everywhere
    docs = [
        (0, "a b c"), (1, "a b c"), (2, "a c"), (3, "a c"),
        (4, "b c"), (5, "c"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["term_a"], r["term_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["pmi_micro"])
        for r in pmi_pairs(df, top_v=10, min_pair=2).collect()
    }
    assert got[("a", "b")] == (2, 4, 3, round(1e6 * math.log(2 * 6 / (4 * 3))))
    assert got[("a", "c")] == (4, 4, 6, round(1e6 * math.log(4 * 6 / (4 * 6))))
    assert got[("b", "c")] == (3, 3, 6, round(1e6 * math.log(3 * 6 / (3 * 6))))


def test_pmi_top_v_restricts_vocab(spark):
    from sandcrawler_spark.operators.collocations import pmi_pairs

    # top-2 vocab by doc freq = c (4 docs) and a (3); b excluded
    docs = [(0, "a b c"), (1, "a b c"), (2, "a c"), (3, "c")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {(r["term_a"], r["term_b"]) for r in pmi_pairs(df, top_v=2, min_pair=1).collect()}
    assert pairs == {("a", "c")}


def _brute_kcenter(vecs, k):
    # numpy twin with the engine's contract: round(cos, 6), argmin
    # (ms, id), seed = min id
    import numpy as np

    ids = sorted(vecs)
    sel = [ids[0]]
    out = [(1, ids[0], -2.0)]
    ms = {i: -2.0 for i in ids}

    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    for rank in range(2, k + 1):
        c = vecs[sel[-1]]
        for i in ids:
            ms[i] = max(ms[i], cos(vecs[i], c))
        nxt = min((i for i in ids if i not in sel), key=lambda i: (ms[i], i))
        out.append((rank, nxt, ms[nxt]))
        sel.append(nxt)
    return out


def test_kcenter_matches_brute_force(spark):
    from sandcrawler_spark.operators.kcenter import kcenter_select

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).tolist() for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["sel_rank"], r["vec_id"], r["far_cos"])
        for r in kcenter_select(df, k=6).orderBy("sel_rank").collect()
    ]
    # float32 storage: brute twin must read back the same float32 values
    f32 = {i: np.asarray(v, np.float32).tolist() for i, v in vecs.items()}
    want = _brute_kcenter(f32, 6)
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_cache_plan_semantics(spark):
    from pyspark.sql import functions as F

    from sandcrawler_spark.functions.cachectl import cache_plan_cols

    rows = [
        # (cc, fetched, expires, etag, lm) -> expected (ttl, verdict, cond)
        ("public, max-age=3600", 1000, None, None, None, 3600, "fresh", False),
        ("no-store", 1000, 5000, "e", None, 0, "no_store", True),
        ("no-cache, private", 1000, 5000, None, None, 0, "revalidate", False),
        ("max-age=0, must-revalidate", 1000, None, None, 500, 0, "revalidate", True),
        ("public", 1000, 87400, None, None, 86400, "fresh", False),
        ("", 1000, None, None, 0, 100, "heuristic", True),
        ("", 1000, None, None, None, 0, "no_policy", False),
        # stale Expires clamps to 0 but stays 'fresh' policy class
        ("public", 1000, 500, None, None, 0, "fresh", False),
        # max-age wins over Expires; must-revalidate with ttl>0 is fresh
        ("max-age=10, must-revalidate", 1000, 99999, None, None, 10, "fresh", False),
        # token guard: 'no-cachex' is NOT no-cache
        ("no-cachex, max-age=7", 1000, None, None, None, 7, "fresh", False),
    ]
    df = spark.createDataFrame(
        [(i, cc, f, ex, et, lm) for i, (cc, f, ex, et, lm, *_ ) in enumerate(rows)],
        "i int, cc string, fetched long, expires long, etag string, lm long",
    )
    got = {
        r["i"]: (r["ttl_s"], r["verdict"], r["cond_get"], r["stale_epoch"])
        for r in df.select(
            "i",
            *cache_plan_cols(
                F.col("cc"), F.col("fetched"), F.col("expires"), F.col("etag"), F.col("lm")
            ),
        ).collect()
    }
    for i, (_, f, _, _, _, ttl, verdict, cond) in enumerate(rows):
        assert got[i] == (ttl, verdict, cond, f + ttl), (i, got[i])


def test_kcenter_picks_spread_points(spark):
    from sandcrawler_spark.operators.kcenter import kcenter_select

    # three orthogonal directions + jitter copies: the first three
    # selections must cover all three directions
    base = {0: [1, 0, 0], 10: [0, 1, 0], 20: [0, 0, 1]}
    rows = []
    for bid, v in base.items():
        for j in range(5):
            rows.append((bid + j, [x + (0.01 * j if x else 0.0) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = [r["vec_id"] for r in kcenter_select(df, k=3).orderBy("sel_rank").collect()]
    assert {i // 10 for i in sel} == {0, 1, 2}
