"""Streaming dedupe: dropDuplicatesWithinWatermark horizon semantics +
the stateful first-seen operator across checkpointed resume runs."""

from __future__ import annotations

import datetime as dt
import os


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, "sha1hex string, warc_ts timestamp, url string")
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, src_dir, ckpt, build, mode="update"):
    stream = spark.readStream.schema(
        "sha1hex string, warc_ts timestamp, url string"
    ).parquet(src_dir)
    out = []

    def sink(batch_df, _bid):
        out.extend(batch_df.collect())

    q = (
        build(stream)
        .writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_stream_dedupe_watermarked(spark, tmp_path):
    from sandcrawler_spark.streaming.dedupe_stream import stream_dedupe_watermarked

    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: key A twice (in-horizon dup suppressed), key B once
    _write(spark, src, [
        ("A", ts(0), "u1"), ("A", ts(1), "u1b"), ("B", ts(2), "u2"),
    ])
    got1 = _run(
        spark, src, ckpt,
        lambda s: stream_dedupe_watermarked(s, ["sha1hex"], "warc_ts", "10 minutes"),
        mode="append",
    )
    assert sorted(r.sha1hex for r in got1) == ["A", "B"]

    # batch 2: A again within horizon -> suppressed by checkpointed state;
    # C is new -> emitted
    _write(spark, src, [("A", ts(3), "u1c"), ("C", ts(4), "u3")])
    got2 = _run(
        spark, src, ckpt,
        lambda s: stream_dedupe_watermarked(s, ["sha1hex"], "warc_ts", "10 minutes"),
        mode="append",
    )
    assert sorted(r.sha1hex for r in got2) == ["C"]


def test_stream_dedupe_batch_fallback(spark):
    from sandcrawler_spark.streaming.dedupe_stream import stream_dedupe_watermarked

    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1), "u1"), ("A", dt.datetime(2024, 1, 2), "u2")],
        "sha1hex string, warc_ts timestamp, url string",
    )
    assert stream_dedupe_watermarked(df, ["sha1hex"], "warc_ts").count() == 1


def test_stream_first_seen_across_runs(spark, tmp_path):
    from sandcrawler_spark.streaming.dedupe_stream import stream_first_seen

    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    t = dt.datetime(2024, 1, 1)

    _write(spark, src, [("A", t, "u1"), ("A", t, "u1b"), ("B", t, "u2")])
    got1 = {r.key: r for r in _run(
        spark, src, ckpt, lambda s: stream_first_seen(s, "sha1hex")
    )}
    assert got1["A"].is_first and got1["A"].n_dups_suppressed == 1
    assert got1["B"].is_first and got1["B"].n_dups_suppressed == 0

    # resume run: A is a known key now (is_first=false, counter grows);
    # D is brand new
    _write(spark, src, [("A", t, "u1c"), ("D", t, "u4")])
    got2 = {r.key: r for r in _run(
        spark, src, ckpt, lambda s: stream_first_seen(s, "sha1hex")
    )}
    assert not got2["A"].is_first and got2["A"].n_dups_suppressed == 2
    assert got2["D"].is_first and got2["D"].n_dups_suppressed == 0
    assert "B" not in got2  # untouched keys emit nothing
