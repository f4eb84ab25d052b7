"""Event-time streaming: watermarked windowed host rates + the
applyInPandasWithState host-budget operator, across checkpointed
availableNow micro-batch runs (kill/resume = new run, same checkpoint).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F


def _write_pages(spark, path, rows):
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, host string")
    df.coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, pages_dir, ckpt, name, build):
    # foreachBatch sink: unlike the memory sink it supports resuming
    # from an existing checkpoint (the whole point of these tests)
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, host string").parquet(pages_dir)
    )
    out = []

    def sink(batch_df, _bid):
        out.extend(batch_df.collect())

    q = (
        build(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_windowed_host_rates_watermark(spark, tmp_path):
    from sandcrawler_spark.streaming.eventtime import windowed_host_rates

    pages = os.path.join(str(tmp_path), "pages")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes, seconds=0):
        return t0 + dt.timedelta(minutes=minutes, seconds=seconds)

    # batch 1: two hosts over minutes 0-10
    _write_pages(spark, pages, [
        ("u1", ts(0, 10), "a.org"), ("u2", ts(0, 40), "a.org"),
        ("u3", ts(0, 20), "b.org"), ("u4", ts(10, 0), "a.org"),
    ])
    got1 = _run_stream(spark, pages, ckpt, "rates1",
                       lambda s: windowed_host_rates(s, host_col="host"))
    r1 = {(r.window_start.minute, r.host): r.n_fetched for r in got1}
    assert r1[(0, "a.org")] == 2 and r1[(0, "b.org")] == 1 and r1[(10, "a.org")] == 1

    # batch 2 (resume from checkpoint; watermark now 12:08): one row
    # within the watermark lands in its window, one 10-minutes-late row
    # is dropped deterministically
    _write_pages(spark, pages, [
        ("u5", ts(9, 30), "b.org"),   # >= watermark: accepted into win 9
        ("u6", ts(0, 50), "a.org"),   # far below watermark: dropped
    ])
    got2 = _run_stream(spark, pages, ckpt, "rates2",
                       lambda s: windowed_host_rates(s, host_col="host"))
    r2 = {(r.window_start.minute, r.host): r.n_fetched for r in got2}
    assert r2 == {(9, "b.org"): 1}  # no update for window 0 / a.org


def test_crawl_runner_feeds_stateful_budget(spark, corpus, tmp_path):
    """Integration: CrawlRunner rounds drive the streaming host-budget
    tracker. Each round's fetch attempts become events; the
    applyInPandasWithState operator accumulates per-host totals across
    rounds (checkpointed resume between rounds) and its over_budget
    flags must match a batch recount of the SAME CrawlRunner output."""
    from sandcrawler_spark.functions.urls import host_of_py
    from sandcrawler_spark.streaming.eventtime import stateful_host_budget
    from sandcrawler_spark.streaming.rounds import CrawlRunner

    spark.conf.set("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
    small = {
        "ingest_request": corpus["ingest_request"].limit(40),
        "cdx": corpus["cdx"],
        "pages": corpus["pages"],
        "robots": corpus["robots"],
    }
    runner = CrawlRunner(spark, small, str(tmp_path / "st"))
    events_dir = os.path.join(str(tmp_path), "events")
    ckpt = os.path.join(str(tmp_path), "budget_ckpt")
    t0 = dt.datetime(2024, 2, 1, 0, 0, 0)
    budget = 4
    seen_keys: set = set()
    cumulative: dict[str, int] = {}
    rounds_with_events = 0
    for _ in range(3):
        entry = runner.run_round()
        if entry.get("done"):
            break
        rows = [
            (r.ingest_type, r.base_url)
            for r in runner.results.read().select("ingest_type", "base_url").collect()
        ]
        new = [k for k in rows if k not in seen_keys]
        seen_keys.update(rows)
        if not new:
            continue
        rounds_with_events += 1
        _write_pages(
            spark, events_dir,
            [(base_url, t0, host_of_py(base_url)) for _, base_url in new],
        )
        got = _run_stream(spark, events_dir, ckpt, "crawlbudget",
                          lambda s: stateful_host_budget(s, budget=budget))
        for base_url_host in (host_of_py(u) for _, u in new):
            cumulative[base_url_host] = cumulative.get(base_url_host, 0) + 1
        flags = {r.host: (r.total_fetched, r.over_budget) for r in got}
        # every host updated this round reports its cumulative total
        for _, u in new:
            h = host_of_py(u)
            assert flags[h] == (cumulative[h], cumulative[h] > budget)
    assert rounds_with_events >= 2, "need multiple rounds to exercise cross-round state"
    # at least one host must have crossed the budget by the end
    assert any(n > budget for n in cumulative.values())


def test_stateful_host_budget_accumulates(spark, tmp_path):
    from sandcrawler_spark.streaming.eventtime import stateful_host_budget

    # Spark 4.1's foreachBatch state-commit validation false-positives
    # with applyInPandasWithState driven from Python (the inner action's
    # state commits are not tracked against the streaming execution);
    # the computation itself is correct — disable the validator here
    spark.conf.set("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
    pages = os.path.join(str(tmp_path), "pages")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    _write_pages(spark, pages, [
        ("u1", t0, "a.org"), ("u2", t0, "a.org"), ("u3", t0, "b.org"),
    ])
    got1 = _run_stream(spark, pages, ckpt, "budget1",
                       lambda s: stateful_host_budget(s, budget=3))
    r1 = {r.host: (r.total_fetched, r.over_budget) for r in got1}
    assert r1 == {"a.org": (2, False), "b.org": (1, False)}

    # resume: state carries across runs; a.org crosses its budget
    _write_pages(spark, pages, [
        ("u4", t0, "a.org"), ("u5", t0, "a.org"),
    ])
    got2 = _run_stream(spark, pages, ckpt, "budget2",
                       lambda s: stateful_host_budget(s, budget=3))
    r2 = {r.host: (r.total_fetched, r.over_budget) for r in got2}
    assert r2 == {"a.org": (4, True)}


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from sandcrawler_spark.streaming.eventtime import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: a 30-min gap (exactly the gap) still MERGES — the
        # split needs ts - prev_ts strictly greater than the gap
        (1, ts(0), 1.0), (1, ts(29), 2.0),
        (1, ts(59), 4.0),                            # exactly 30 min after: merges
        (1, ts(90), 8.0),                            # 31-min gap: NEW session
        # user 2: single event
        (2, ts(5), 10.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sorted(
        sessionize(df, gap="30 minutes", value_col="value").collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    assert len(got) == 3
    a, b, c = got
    assert (a.user_id, a.n_events, a.sum_value) == (1, 3, 7.0)
    assert a.session_start == ts(0) and a.last_event == ts(59)
    assert a.session_end == ts(89)  # last event + gap
    assert (b.user_id, b.n_events, b.sum_value) == (1, 1, 8.0)
    assert b.session_start == ts(90)
    assert (c.user_id, c.n_events, c.sum_value) == (2, 1, 10.0)
