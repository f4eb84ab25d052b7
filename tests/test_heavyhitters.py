"""Streaming decayed heavy hitters (sharded Space-Saving + foreachBatch
state store): detection, decay semantics, SS bounds, replay idempotence,
pruning safety."""

from __future__ import annotations

from sandcrawler_spark.streaming.heavyhitters import (
    HH_SCALE,
    process_batch,
    prune_hh_store,
    read_hh_store,
    top_hitters,
)


def _batch(spark, pairs):
    # pairs: list of (host, n_rows)
    rows = [(h,) for h, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, ["host"])


def test_heavy_hitter_detected_and_bounds(spark, tmp_path):
    sd = str(tmp_path)
    process_batch(
        spark,
        _batch(spark, [("big.com", 50), ("mid.com", 10)] + [(f"s{i}.com", 1) for i in range(12)]),
        0, sd, m=4, n_shards=2,
    )
    top = top_hitters(spark, sd, k=3)
    assert top.iloc[0]["item"] == "big.com"
    # SS bound: upper >= true scaled count >= lower
    big = top[top["item"] == "big.com"].iloc[0]
    assert big["lower"] <= 50 * HH_SCALE <= big["cnt"]


def test_decay_demotes_stale_hitters(spark, tmp_path):
    sd = str(tmp_path)
    # batch 0: old.com floods; batches 1..14: new.com steadily present
    process_batch(spark, _batch(spark, [("old.com", 40)]), 0, sd, m=4, n_shards=1)
    for b in range(1, 15):
        process_batch(spark, _batch(spark, [("new.com", 10)]), b, sd, m=4, n_shards=1)
    top = top_hitters(spark, sd, k=2)
    assert top.iloc[0]["item"] == "new.com"
    # old.com decayed by 0.9^14 from 40k-scale: below new.com's fresh mass
    old = top[top["item"] == "old.com"]
    assert old.empty or old.iloc[0]["cnt"] < top.iloc[0]["cnt"]


def test_replay_is_idempotent(spark, tmp_path):
    sd = str(tmp_path)
    b0 = _batch(spark, [("a.com", 5), ("b.com", 3)])
    b1 = _batch(spark, [("b.com", 7), ("c.com", 2)])
    process_batch(spark, b0, 0, sd, m=4, n_shards=2)
    process_batch(spark, b1, 1, sd, m=4, n_shards=2)
    after_first, latest = read_hh_store(spark, sd)
    assert latest == 1
    # crash-replay of batch 1: must rebuild from batch 0's store and
    # produce the identical table
    process_batch(spark, b1, 1, sd, m=4, n_shards=2)
    after_replay, latest2 = read_hh_store(spark, sd)
    assert latest2 == 1
    k = ["shard", "item", "cnt", "err", "last_batch"]
    a = sorted(map(tuple, after_first[k].itertuples(index=False)))
    b = sorted(map(tuple, after_replay[k].itertuples(index=False)))
    assert a == b


def test_prune_keeps_replayable_prefix(spark, tmp_path):
    sd = str(tmp_path)
    for b in range(5):
        process_batch(spark, _batch(spark, [(f"h{b}.com", b + 1)]), b, sd, m=4, n_shards=1)
    prune_hh_store(sd)
    # newest two survive; replay of batch 4 still works from batch 3
    process_batch(spark, _batch(spark, [("h4.com", 5)]), 4, sd, m=4, n_shards=1)
    stored, latest = read_hh_store(spark, sd)
    assert latest == 4 and len(stored) > 0


def test_run_split_equals_run_whole(spark, tmp_path):
    # 2+2 batches == same 4 batches in one pass (state determinism)
    batches = [
        [("x.com", 9), ("y.com", 2)],
        [("y.com", 6)],
        [("z.com", 4), ("x.com", 1)],
        [("w.com", 3)],
    ]
    sd_a, sd_b = str(tmp_path / "a"), str(tmp_path / "b")
    for b, pairs in enumerate(batches):
        process_batch(spark, _batch(spark, pairs), b, sd_a, m=3, n_shards=2)
    for b, pairs in enumerate(batches[:2]):
        process_batch(spark, _batch(spark, pairs), b, sd_b, m=3, n_shards=2)
    for b, pairs in enumerate(batches[2:], start=2):
        process_batch(spark, _batch(spark, pairs), b, sd_b, m=3, n_shards=2)
    ta = top_hitters(spark, sd_a, k=4)
    tb = top_hitters(spark, sd_b, k=4)
    assert ta.values.tolist() == tb.values.tolist()
