"""Incremental streaming near-dup detection (band store + foreachBatch)."""

from __future__ import annotations

import time


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BASE = ("the quick brown fox jumps over the lazy dog and keeps on running "
        "through the wide green field toward the distant river bank")
OTHER = ("completely unrelated text about database engines shuffling "
         "partitions across executors with adaptive query execution enabled")


def test_process_batch_flags_cross_batch_dup(spark, tmp_path):
    from sandcrawler_spark.streaming.lsh_stream import process_batch

    state = str(tmp_path / "state")
    d0 = process_batch(_mk(spark, [(1, BASE), (2, OTHER)]), 0, state)
    got0 = {r.doc_id: r for r in d0.collect()}
    assert not got0[1].is_dup_candidate and not got0[2].is_dup_candidate

    # batch 1: copy of doc 1 (tail-appended — the same planted-dup
    # shape the batch LSH tests use; a mid-text rewrite would not be
    # guaranteed a band collision, which is verification's job) + a
    # fresh doc
    near = BASE + " with appended tail words"
    d1 = process_batch(
        _mk(spark, [(10, near), (11, "fresh content entirely new words here today")]),
        1, state,
    )
    got1 = {r.doc_id: r for r in d1.collect()}
    assert got1[10].is_dup_candidate and got1[10].first_match == 1
    assert not got1[11].is_dup_candidate

    # batch 2: copy of the QUARANTINED doc 10 — doc 10 was never
    # admitted to the store, so the copy can only match the original
    d2 = process_batch(_mk(spark, [(20, near)]), 2, state)
    got2 = {r.doc_id: r for r in d2.collect()}
    assert got2[20].is_dup_candidate and got2[20].first_match == 1


def test_process_batch_in_batch_dups_and_idempotent_replay(spark, tmp_path):
    from sandcrawler_spark.streaming.lsh_stream import process_batch, read_band_store

    state = str(tmp_path / "state")
    rows = [(1, BASE), (2, BASE), (3, OTHER)]
    d = {r.doc_id: r for r in process_batch(_mk(spark, rows), 0, state).collect()}
    # same-batch dup: larger id flagged against smaller
    assert not d[1].is_dup_candidate
    assert d[2].is_dup_candidate and d[2].first_match == 1
    assert not d[3].is_dup_candidate
    n_store = read_band_store(spark, state).count()
    # replaying the SAME batch id must not grow the store
    process_batch(_mk(spark, rows), 0, state).collect()
    assert read_band_store(spark, state).count() == n_store


def test_neardup_stream_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from sandcrawler_spark.streaming.lsh_stream import neardup_stream

    src = str(tmp_path / "src")
    _mk(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = neardup_stream(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        result_dir=str(tmp_path / "res"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # second file arrives: near-copy of doc 1; resume from checkpoint
    _mk(spark, [(10, BASE + " and one appended tail")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = neardup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        result_dir=str(tmp_path / "res"),
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    time.sleep(0.5)

    res = spark.read.parquet(str(tmp_path / "res"))
    flagged = {r.doc_id: r for r in res.filter(F.col("is_dup_candidate")).collect()}
    assert set(flagged) == {10} and flagged[10].first_match == 1
    assert res.filter(~F.col("is_dup_candidate")).count() == 2  # docs 1, 2


def test_band_store_compaction_preserves_detection(spark, tmp_path):
    import os

    from sandcrawler_spark.streaming.lsh_stream import (
        compact_band_store,
        process_batch,
        read_band_store,
    )

    state = str(tmp_path / "state")
    texts = [f"unique doc number {i} " + " ".join(f"w{i}_{j}" for j in range(8))
             for i in range(6)]
    for i, t in enumerate(texts):
        process_batch(_mk(spark, [(i, t)]), i, state)
    n_before = read_band_store(spark, state).count()

    folded = compact_band_store(spark, state, keep_if_under=4)
    assert folded == 6
    store_dirs = os.listdir(os.path.join(state, "band_store"))
    assert store_dirs == ["compacted-0"]
    assert read_band_store(spark, state).count() == n_before

    # detection against compacted history still works
    d = process_batch(_mk(spark, [(100, texts[2])]), 100, state)
    got = {r.doc_id: r for r in d.collect()}
    assert got[100].is_dup_candidate and got[100].first_match == 2

    # below threshold: no-op; above: folds compacted + new batch dirs
    assert compact_band_store(spark, state, keep_if_under=4) == 0
    assert compact_band_store(spark, state, keep_if_under=0) == 1
    assert os.listdir(os.path.join(state, "band_store")) == ["compacted-1"]
    assert read_band_store(spark, state).count() == n_before  # doc 100 quarantined


def test_replay_excludable_after_compaction(spark, tmp_path):
    """ADVICE r3: compaction may fold the newest batch's dir before the
    stream checkpointed it; the replayed batch must still not see its
    own previous attempt (else its docs match themselves and get
    wrongly quarantined). Compacted rows carry batch_id for this."""
    from sandcrawler_spark.streaming.lsh_stream import (
        compact_band_store,
        process_batch,
        read_band_store,
    )

    state = str(tmp_path / "state")
    process_batch(_mk(spark, [(1, BASE)]), 0, state)
    # batch 1 writes its store dir, then the stream dies BEFORE the
    # checkpoint commits — and compaction runs in between
    process_batch(_mk(spark, [(2, OTHER)]), 1, state)
    assert compact_band_store(spark, state, keep_if_under=0) == 2
    # replay of batch 1: its own previous rows are excluded even
    # though they now live inside compacted-0
    full = read_band_store(spark, state).count()
    assert read_band_store(spark, state, exclude_batch=1).count() == full // 2
    d = {r.doc_id: r for r in process_batch(_mk(spark, [(2, OTHER)]), 1, state).collect()}
    assert not d[2].is_dup_candidate  # would self-match without the fix
    # and a genuinely new copy of doc 2 afterwards IS flagged
    d2 = {r.doc_id: r for r in process_batch(_mk(spark, [(3, OTHER)]), 2, state).collect()}
    assert d2[3].is_dup_candidate and d2[3].first_match == 2


def test_string_doc_id_rejected(spark, tmp_path):
    import pytest

    from sandcrawler_spark.streaming.lsh_stream import process_batch

    df = spark.createDataFrame([("a", BASE)], ["doc_id", "text"])
    with pytest.raises(TypeError, match="integral"):
        process_batch(df, 0, str(tmp_path / "state"))
