"""Round-4 session-13 operators: shared skew advisor + WARC/CDX audit.

Reference parity anchors:
- skew advisor: generalizes the hot-key disciplines the engine already
  uses (politeness.py hot_threshold, dedupe.py max_band_size) into one
  queryable prescription, per VERDICT r3's "same disease, same cure"
  across operators.
- warc_cdx_audit: batch form of the per-lookup digest/offset agreement
  the reference asserts in ia.py fetch_petabox (reference
  python/sandcrawler/ia.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sandcrawler_spark.operators.skew import apply_salts, key_counts, order_statistic, skew_advisor


def test_skew_advisor_prescribes_only_hot_keys(spark):
    # 20 uniform keys x 10 rows + one hot key x 400 rows
    rows = [(f"k{i % 20}",) for i in range(200)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, ["k"])
    advice = skew_advisor(df, "k", skew_factor=4).collect()
    assert len(advice) == 1
    a = advice[0]
    assert a["k"] == "hot"
    assert a["n_rows"] == 400
    assert a["ref_rows"] == 10
    assert a["ratio_centi"] == 4000
    assert a["n_salts"] == 40


def test_skew_advisor_salt_cap_and_empty(spark):
    df = spark.createDataFrame([("a",)] * 1000 + [("b",)], ["k"])
    advice = skew_advisor(df, "k", q_permille=500, skew_factor=2, salt_cap=8).collect()
    assert [(r["k"], r["n_salts"]) for r in advice] == [("a", 8)]
    empty = spark.createDataFrame([], "k string")
    assert skew_advisor(empty, "k").count() == 0


def test_order_statistic_exact_position(spark):
    # counts 1..10 -> p50 of 10 values is the 5th smallest = 5
    df = spark.createDataFrame(
        [(f"k{i}", j) for i in range(1, 11) for j in range(i)], ["k", "j"]
    )
    counts = key_counts(df, "k")
    assert order_statistic(counts, 500) == 5
    assert order_statistic(counts, 1000) == 10
    assert order_statistic(counts, 1) == 1


def test_apply_salts_splits_hot_key_deterministically(spark):
    rows = [(f"u{i}", "hot" if i < 300 else f"k{i % 50}") for i in range(400)]
    df = spark.createDataFrame(rows, ["url", "k"])
    advice = skew_advisor(df, "k", skew_factor=4)
    salted = apply_salts(df, "k", advice)
    out = salted.groupBy("salted_key").count()
    hot_parts = out.filter(F.col("salted_key").startswith("hot#")).collect()
    # hot key split across many salts, each far below the original 300
    assert len(hot_parts) > 5
    assert max(r["count"] for r in hot_parts) < 100
    # cold keys untouched
    assert out.filter(F.col("salted_key") == "k3").count() == 1
    # deterministic under re-evaluation
    a = sorted(salted.select("url", "salted_key").collect())
    b = sorted(apply_salts(df, "k", advice).select("url", "salted_key").collect())
    assert a == b
