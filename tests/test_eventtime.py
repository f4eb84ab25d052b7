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
