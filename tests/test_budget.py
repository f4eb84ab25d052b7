"""Distributed global cumsum + water-filling budget allocation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_global_cumsum_matches_sequential(spark):
    from sandcrawler_spark.operators.cumsum import global_cumsum

    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).cast("long").alias("v"),
    )
    got = {
        r.k: r.cum_value
        for r in global_cumsum(df, [F.col("k").asc()], "v").collect()
    }
    rows = sorted((r.k, r.v) for r in df.collect())
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc
    # no single-task global window in the plan: WindowExec absent
    plan = global_cumsum(df, [F.col("k").asc()], "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_global_cumsum_desc_order(spark):
    from sandcrawler_spark.operators.cumsum import global_cumsum

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["k", "v"]
    ).select("k", F.col("v").cast("long").alias("v"))
    got = {r.k: r.cum_value for r in global_cumsum(df, [F.col("k").desc()], "v").collect()}
    assert got == {3: 30, 2: 50, 1: 60}


def _alloc(spark, demands, budget):
    from sandcrawler_spark.operators.budget import allocate_budget

    df = spark.createDataFrame(demands, ["host", "demand"])
    return {r.host: r.alloc for r in allocate_budget(df, budget).collect()}


def test_budget_all_satisfied_when_budget_ample(spark):
    got = _alloc(spark, [("a", 5), ("b", 10), ("c", 1)], 100)
    assert got == {"a": 5, "b": 10, "c": 1}


def test_budget_waterfill_caps_big_hosts(spark):
    # B=9 over [2,5,5]: host a satisfied, the two 5s share 7 -> 3 and 4
    # (the extra unit goes to the last capped host of ascending order)
    got = _alloc(spark, [("a", 2), ("b", 5), ("c", 5)], 9)
    assert got["a"] == 2 and got["b"] + got["c"] == 7
    assert sorted([got["b"], got["c"]]) == [3, 4]


def test_budget_tiny_budget_spreads_units(spark):
    got = _alloc(spark, [("a", 10), ("b", 10), ("c", 10), ("d", 10)], 3)
    assert sorted(got.values()) == [0, 1, 1, 1]
    assert sum(got.values()) == 3


def test_budget_exact_totals_and_caps(spark):
    import random

    rng = random.Random(7)
    demands = [(f"h{i}", rng.randrange(0, 50)) for i in range(200)]
    total = sum(d for _, d in demands)
    for budget in (0, 17, total // 3, total, total + 100):
        got = _alloc(spark, demands, budget)
        assert sum(got.values()) == min(budget, total)
        for h, d in demands:
            assert 0 <= got[h] <= d


def test_budget_duckdb_twin_parity(spark, tmp_path):
    import duckdb

    from sandcrawler_spark.operators.budget import allocate_budget, budget_oracle_sql

    df = spark.range(300).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        ((F.col("id") * 13) % 97).cast("long").alias("demand"),
    )
    p = str(tmp_path / "d.parquet")
    df.write.mode("overwrite").parquet(p)
    got = {
        (r.host): (r.demand, r.alloc)
        for r in allocate_budget(spark.read.parquet(p), 5000).collect()
    }
    sql = budget_oracle_sql(f"SELECT host, demand FROM '{p}/*.parquet'", 5000)
    want = {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == want


def test_global_cumsum_partitioning_invariance(spark):
    """VERDICT r3 item 1: the cumsum must be byte-identical no matter
    how the input is laid out or how many range partitions the
    operator uses — the driver's environment (parallelism, file
    splits) must not be able to change a single output value."""
    from sandcrawler_spark.operators.cumsum import global_cumsum

    base = spark.range(5_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 97 + 13) % 9973).cast("long").alias("v"),
    )
    layouts = [
        base.coalesce(1),
        base.repartition(7),
        base.repartition(32, "v"),  # pathological: keyed on the value
    ]
    results = []
    for df in layouts:
        for n_parts in (1, 3, 64):
            got = global_cumsum(df, [F.col("k").asc()], "v", n_parts=n_parts)
            results.append(tuple(sorted((r.k, r.cum_value) for r in got.collect())))
    assert all(r == results[0] for r in results[1:])
