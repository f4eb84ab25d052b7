"""Adaptive recrawl scheduling (change-rate estimation) + rendezvous
crawler-fleet sharding."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_change_rate_schedule_goldens(spark):
    from sandcrawler_spark.operators.recrawl import change_rate_schedule

    day = 86400
    rows = [
        # u1: 3 captures over 2 days, digest flips once -> one change
        ("u1", 0 * day, "a"), ("u1", 1 * day, "a"), ("u1", 2 * day, "b"),
        # u2: static page, 5 captures over 8 days, never changes
        *[("u2", i * 2 * day, "x") for i in range(5)],
        # u3: churns every capture, 4 captures over 3 days
        ("u3", 0, "p"), ("u3", 1 * day, "q"), ("u3", 2 * day, "r"), ("u3", 3 * day, "s"),
        # u4: single capture (no span, no signal)
        ("u4", 5 * day, "z"),
    ]
    df = spark.createDataFrame(rows, "url string, epoch_s long, sha1hex string")
    got = {r.url: r for r in change_rate_schedule(df, "url", "epoch_s", "sha1hex").collect()}

    assert got["u1"].n_caps == 3 and got["u1"].n_changes == 1
    assert got["u1"].span_s == 2 * day
    assert got["u1"].rate_micro_per_day == 500_000  # 0.5 changes/day
    assert got["u1"].interval_days == 2  # mean inter-change time

    assert got["u2"].n_changes == 0
    assert got["u2"].interval_days == 64  # backoff ceiling
    assert got["u2"].rate_micro_per_day == 0

    assert got["u3"].n_changes == 3 and got["u3"].interval_days == 1
    assert got["u3"].rate_micro_per_day == 1_000_000

    assert got["u4"].n_caps == 1 and got["u4"].span_s == 0
    assert got["u4"].rate_micro_per_day == 0 and got["u4"].interval_days == 64


def test_change_rate_interval_clamps(spark):
    from sandcrawler_spark.operators.recrawl import change_rate_schedule

    rows = [
        # one change over 200 days -> mean inter-change 200d, clamped to 64
        ("slow", 0, "a"), ("slow", 200 * 86400, "b"),
        # 10 changes within one hour -> round(span_days/changes) = 0, floored to 1
        *[("fast", i * 360, f"v{i}") for i in range(11)],
    ]
    df = spark.createDataFrame(rows, "url string, epoch_s long, sha1hex string")
    got = {r.url: r for r in change_rate_schedule(df, "url", "epoch_s", "sha1hex").collect()}
    assert got["slow"].interval_days == 64
    assert got["fast"].interval_days == 1


def test_rendezvous_sharding_uniform_and_minimal_disruption(spark):
    from sandcrawler_spark.operators.sharding import assign_shards, shard_balance

    hosts = spark.range(2000).select(
        F.concat(F.lit("site"), F.col("id"), F.lit(".example.org")).alias("host")
    )
    n = 8
    a8 = {r.host: r.shard for r in assign_shards(hosts, "host", n).collect()}
    # every shard populated, roughly uniform (md5 weights)
    per = [list(a8.values()).count(s) for s in range(n)]
    assert all(p > 0 for p in per)
    assert max(per) < 2.2 * (2000 / n)

    # determinism: same assignment on re-run and under other layouts
    a8b = {r.host: r.shard for r in assign_shards(hosts.repartition(13), "host", n).collect()}
    assert a8 == a8b

    # minimal disruption: growing 8 -> 9 moves keys ONLY to the new shard
    a9 = {r.host: r.shard for r in assign_shards(hosts, "host", n + 1).collect()}
    moved = {h for h in a8 if a9[h] != a8[h]}
    assert all(a9[h] == n for h in moved)
    # and about 1/9 of keys move (binomial; generous bounds)
    assert 2000 / 9 * 0.5 < len(moved) < 2000 / 9 * 1.8

    bal = {r.shard: (r.n_keys, r.n_rows) for r in shard_balance(hosts, "host", n).collect()}
    assert sum(k for k, _ in bal.values()) == 2000


def test_adapt_crawl_delays_aimd(spark):
    from sandcrawler_spark.operators.politeness import adapt_crawl_delays

    results = spark.createDataFrame(
        [
            ("throttled.org", 200), ("throttled.org", 429),
            ("clean.org", 200), ("clean.org", 226),
            ("flaky.org", 200), ("flaky.org", 404),
            ("dead.org", 503),
            ("floor.org", 200),
            ("ceil.org", 429),
        ],
        "host string, status_code int",
    )
    current = spark.createDataFrame(
        [
            ("throttled.org", 1000), ("clean.org", 1000), ("flaky.org", 1000),
            ("dead.org", 2000), ("idle.org", 3000),
            ("floor.org", 250), ("ceil.org", 50_000),
        ],
        "host string, crawl_delay_ms long",
    )
    got = {r.host: r.crawl_delay_ms for r in adapt_crawl_delays(results, current).collect()}
    assert got["throttled.org"] == 2000   # x2 on 429
    assert got["dead.org"] == 4000        # x2 on 503
    assert got["clean.org"] == 750        # -250 on clean round
    assert got["flaky.org"] == 1000       # plain failures: hold
    assert got["idle.org"] == 3000        # no traffic: hold
    assert got["floor.org"] == 250        # clamped at the floor
    assert got["ceil.org"] == 64_000      # clamped at the ceiling

    # monotone convergence: repeated clean rounds walk down to the floor
    d = current.select("host", "crawl_delay_ms")
    clean = results.filter(F.col("status_code") < 400)
    for _ in range(4):
        d = adapt_crawl_delays(clean, d)
    final = {r.host: r.crawl_delay_ms for r in d.collect()}
    assert final["clean.org"] == 250 and final["floor.org"] == 250


def test_decimal_histogram_quantiles(spark):
    """Sketch quantiles land within one 2-significant-digit bucket of
    the exact order statistic; shard-merge == whole-stream sketch."""
    from sandcrawler_spark.operators.histq import (
        decimal_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    vals = [(i % 3, (i * 37) % 9973 + 1) for i in range(6000)]
    df = spark.createDataFrame(vals, "g int, v long")
    h = decimal_histogram(df, "v", ["g"])
    got = {(r.g, r.q): r for r in histogram_quantiles(h, [0.5, 0.99], ["g"]).collect()}
    import math

    per_g = {}
    for g, v in vals:
        per_g.setdefault(g, []).append(v)
    for g, xs in per_g.items():
        xs.sort()
        for q in (0.5, 0.99):
            exact = xs[max(math.ceil(q * len(xs)), 1) - 1]
            est = got[(g, q)].est
            assert est <= exact  # bucket lower bound never overshoots
            assert exact <= est * 1.1 + 10  # within one 2-digit bucket
            assert got[(g, q)].n == len(xs)

    # mergeability: two shard sketches merge to the whole-stream sketch
    a = decimal_histogram(df.filter(F.col("v") % 2 == 0), "v", ["g"])
    b = decimal_histogram(df.filter(F.col("v") % 2 == 1), "v", ["g"])
    merged = sorted((r.g, r.e, r.sub, r.cnt) for r in merge_histograms(a, b).collect())
    whole = sorted((r.g, r.e, r.sub, r.cnt) for r in h.collect())
    assert merged == whole

    # singleton low buckets are exact
    tiny = spark.createDataFrame([(0, v) for v in [0, 1, 2, 3, 9]], "g int, v long")
    th = decimal_histogram(tiny, "v", ["g"])
    tq = {r.q: r.est for r in histogram_quantiles(th, [0.5, 1.0], ["g"]).collect()}
    assert tq[0.5] == 2 and tq[1.0] == 9
