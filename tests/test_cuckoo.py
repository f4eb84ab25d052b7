"""Cuckoo-filter seen set: build/probe equivalence with the exact
anti-join, deletion semantics, overflow kicks, and strategy parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _urls(spark, n, prefix="https://example.org/p"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("u")
    )


def test_cuckoo_equals_exact_antijoin(spark):
    from sandcrawler_spark.operators.cuckoo import build_cuckoo, unseen_cuckoo_exact
    from sandcrawler_spark.operators.seen import unseen_exact

    frontier = _urls(spark, 3000)
    seen = _urls(spark, 3000).filter(F.xxhash64("u") % 3 == 0)
    ck = build_cuckoo(seen, "u", n_buckets=8)
    got = unseen_cuckoo_exact(frontier, seen, ck, "u", 8)
    want = unseen_exact(frontier, seen, "u")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cuckoo_no_false_negatives_and_low_fpr(spark):
    from sandcrawler_spark.operators.cuckoo import build_cuckoo, probe_cuckoo

    seen = _urls(spark, 5000)
    other = _urls(spark, 5000, prefix="https://other.net/q")
    ck = build_cuckoo(seen, "u", n_buckets=8)
    # every inserted key must probe positive
    hits = probe_cuckoo(seen, ck, "u", 8).filter(~F.col("maybe_seen")).count()
    assert hits == 0
    # 16-bit fingerprints, 2 slot-rows x 4 slots: FPR ~ 8/65535 ~ 0.012%
    fpr = probe_cuckoo(other, ck, "u", 8).filter(F.col("maybe_seen")).count() / 5000
    assert fpr < 0.01


def test_cuckoo_strategy_parity(spark):
    from sandcrawler_spark.operators.cuckoo import build_cuckoo, probe_cuckoo

    cand = _urls(spark, 2000)
    seen = _urls(spark, 2000).filter(F.xxhash64("u") % 2 == 0)
    ck = build_cuckoo(seen, "u", n_buckets=4)
    a = set(
        r.u for r in probe_cuckoo(cand, ck, "u", 4, strategy="broadcast")
        .filter("maybe_seen").collect()
    )
    b = set(
        r.u for r in probe_cuckoo(cand, ck, "u", 4, strategy="cogroup")
        .filter("maybe_seen").collect()
    )
    assert a == b


def test_cuckoo_delete_evicts_exactly(spark):
    from sandcrawler_spark.operators.cuckoo import (
        build_cuckoo,
        delete_cuckoo,
        probe_cuckoo,
        unseen_cuckoo_exact,
    )
    from sandcrawler_spark.operators.seen import unseen_exact

    frontier = _urls(spark, 4000)
    seen0 = frontier.filter(F.xxhash64("u") % 3 == 0)
    evicted = seen0.filter(F.xxhash64("u") % 9 == 0)  # recrawl-due ⊆ seen
    seen1 = seen0.exceptAll(evicted)

    ck0 = build_cuckoo(seen0, "u", n_buckets=8)
    ck1 = delete_cuckoo(ck0, evicted, "u", 8)

    # evicted keys now pass the filter (no false positives pinned on them
    # beyond base FPR); non-evicted seen keys still probe positive
    still = probe_cuckoo(seen1, ck1, "u", 8).filter(~F.col("maybe_seen")).count()
    assert still == 0
    # end-to-end: unseen after eviction == exact anti-join vs seen1
    got = unseen_cuckoo_exact(frontier, seen1, ck1, "u", 8)
    want = unseen_exact(frontier, seen1, "u")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the filter's bookkeeping saw the removals
    n0 = ck0.agg(F.sum("n_keys")).collect()[0][0]
    n1 = ck1.agg(F.sum("n_keys")).collect()[0][0]
    assert n1 == n0 - evicted.count()


def test_cuckoo_incremental_insert_then_delete(spark):
    from sandcrawler_spark.operators.cuckoo import (
        build_cuckoo,
        delete_cuckoo,
        insert_cuckoo,
        probe_cuckoo,
    )

    base = _urls(spark, 2000)
    increment = _urls(spark, 1000, prefix="https://inc.example.net/r")
    ck = build_cuckoo(base, "u", n_buckets=8)
    ck2 = insert_cuckoo(ck, increment, "u", 8)
    # all keys from both generations probe positive
    both = base.union(increment)
    assert probe_cuckoo(both, ck2, "u", 8).filter(~F.col("maybe_seen")).count() == 0
    # delete the increment again: base unaffected
    ck3 = delete_cuckoo(ck2, increment, "u", 8)
    assert probe_cuckoo(base, ck3, "u", 8).filter(~F.col("maybe_seen")).count() == 0
    n_keys = ck3.agg(F.sum("n_keys")).collect()[0][0]
    assert n_keys == 2000


def test_cuckoo_kick_path_numpy():
    """Force a near-full table so the vectorized rounds overflow into
    the per-key kick loop; all keys must still be present."""
    from sandcrawler_spark.operators.cuckoo import (
        SLOT_WIDTH,
        _fingerprints,
        _index1,
        _insert_with_kicks,
        _membership,
        _place_round,
        _alt_index,
    )

    rng = np.random.RandomState(7)
    n_slots = 64
    n_keys = int(n_slots * SLOT_WIDTH * 0.90)  # above the vectorized-round comfort zone
    h1 = rng.randint(-(2**62), 2**62, size=n_keys).astype(np.int64)
    h2 = rng.randint(-(2**62), 2**62, size=n_keys).astype(np.int64)
    fp = _fingerprints(h2)
    idx = _index1(h1, n_slots)

    table = np.zeros((n_slots, SLOT_WIDTH), dtype=np.uint16)
    occ = np.zeros(n_slots, dtype=np.int64)
    pending = np.ones(n_keys, dtype=bool)
    use_alt = False
    for _ in range(8):
        if not pending.any():
            break
        cand = _alt_index(idx, fp, n_slots) if use_alt else idx
        placed = _place_round(table, occ, cand[pending], fp[pending])
        live = np.flatnonzero(pending)
        pending[live[placed]] = False
        use_alt = not use_alt
    overflow = int(pending.sum())
    for j in np.flatnonzero(pending):
        _insert_with_kicks(table, occ, idx[j], fp[j], n_slots)
    assert overflow > 0  # the test actually exercised the kick loop
    assert _membership(table, n_slots, h1, h2).all()


def test_cuckoo_overfull_raises():
    from sandcrawler_spark.operators.cuckoo import (
        SLOT_WIDTH,
        _insert_with_kicks,
    )

    n_slots = 8
    table = np.full((n_slots, SLOT_WIDTH), 1, dtype=np.uint16)  # saturated
    occ = np.full(n_slots, SLOT_WIDTH, dtype=np.int64)
    with pytest.raises(ValueError, match="overfull"):
        _insert_with_kicks(table, occ, np.int64(3), np.uint16(99), n_slots)
