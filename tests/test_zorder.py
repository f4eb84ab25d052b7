"""Z-order layout: correctness of the interleave + file-level pruning
beats a single-dimension sort on the other dimension."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_zvalue_interleaves_bits(spark):
    from sandcrawler_spark.plans.zorder import zvalue_col

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3)], ["a", "b"]
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue_col(F.col("a"), F.col("b")).alias("z")).collect()
    }
    # bit i of a -> z-bit 2i+1; bit i of b -> z-bit 2i
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 2
    assert got[(0, 1)] == 1
    assert got[(1, 1)] == 3
    assert got[(2, 3)] == 0b1101  # a=10 -> z-bit 3 (8); b=11 -> z-bits 0,2 (1+4)

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    big = spark.createDataFrame([(513, 77), (65535, 65535)], ["a", "b"])
    for r in big.select("a", "b", zvalue_col(F.col("a"), F.col("b")).alias("z")).collect():
        assert r.z == morton(r.a, r.b)


def test_zorder_prunes_both_dims_linear_does_not(spark, tmp_path):
    from sandcrawler_spark.plans.zorder import pruned_files, pruned_read, write_zordered

    # 64k points on a 256x256 grid, both dims uniform
    df = spark.range(65536).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "x", "y", n_files=16)

    # a 1/8 x 1/8 query box: z-layout opens a small fraction of files
    files_x = pruned_files(spark, zpath, a_range=(0, 31))
    files_y = pruned_files(spark, zpath, b_range=(0, 31))
    files_box = pruned_files(spark, zpath, a_range=(0, 31), b_range=(0, 31))
    assert len(files_box) <= 4          # 16 files total; box touches few
    assert len(files_x) <= 8            # each single-dim slab still prunes
    assert len(files_y) <= 8

    # x-sorted layout: an x-slab prunes, but a y-slab touches EVERY file
    lpath = str(tmp_path / "lin")
    write_zordered(
        df.withColumn("_zero", F.lit(0)), lpath, "x", "_zero", n_files=16
    )
    y_full = (
        spark.read.parquet(lpath + "/data")
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("y").alias("mn"), F.max("y").alias("mx"))
        .filter((F.col("mn") > 31))
        .count()
    )
    assert y_full == 0  # no file can be skipped for y <= 31 in x-sorted layout

    # pruned read returns exactly the right rows (residual filter applied)
    got = (
        pruned_read(spark, zpath, a_range=(0, 31), b_range=(0, 31))
        .filter((F.col("x") <= 31) & (F.col("y") <= 31))
        .count()
    )
    assert got == 32 * 32


def test_zorder_nd_prunes_and_matches_full_scan(spark, tmp_path):
    """3-dim Morton layout: pruned read == full filter on every probe
    box, and a selective box opens strictly fewer files."""
    from sandcrawler_spark.plans.zorder import (
        pruned_files_nd,
        pruned_read_nd,
        write_zordered_nd,
        zvalue_n_col,
    )

    # k=2 n-dim layout reproduces the classic 2-dim interleave
    two = spark.range(50).select(
        zvalue_n_col([F.col("id"), F.col("id") * 3 % 16], 8).alias("znew"),
    ).collect()
    from sandcrawler_spark.plans.zorder import zvalue_col

    legacy = spark.range(50).select(
        zvalue_col(F.col("id"), F.col("id") * 3 % 16, 8).alias("zold")
    ).collect()
    assert [r.znew for r in two] == [r.zold for r in legacy]

    df = spark.range(20_000).select(
        (F.col("id") % 64).alias("hostb"),
        ((F.col("id") * 7) % 1024).alias("ts"),
        ((F.col("id") * 13) % 8).alias("depth"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z3")
    write_zordered_nd(df, path, ["hostb", "ts", "depth"], n_files=32)

    full = spark.read.parquet(path + "/data")
    for ranges in (
        {"hostb": (3, 9)},
        {"ts": (100, 180)},
        {"hostb": (10, 20), "ts": (0, 511), "depth": (2, 3)},
        {"hostb": (63, 63), "depth": (0, 0)},
    ):
        cond = None
        for d, (lo, hi) in ranges.items():
            c = (F.col(d) >= lo) & (F.col(d) <= hi)
            cond = c if cond is None else (cond & c)
        want = sorted(r.payload for r in full.filter(cond).collect())
        got = sorted(
            r.payload
            for r in pruned_read_nd(spark, path, ranges).filter(cond).collect()
        )
        assert got == want
    # selectivity: a tight 3-dim box must not open every file
    n_all = len(pruned_files_nd(spark, path, {}))
    n_tight = len(pruned_files_nd(spark, path, {"hostb": (3, 4), "ts": (64, 96)}))
    assert n_tight < n_all


def test_zorder_query_actually_skips_files(spark, tmp_path):
    """The q_zorder_prune query shape end-to-end on driver testdata:
    the manifest must skip at least one file for the 2-dim box (file
    skipping is the point of the layout), and the pruned aggregate
    must equal the full-scan filter."""
    from pyspark.sql import functions as F

    from sandcrawler_spark.plans.zorder import (
        pruned_files,
        pruned_read,
        write_zordered,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        ((F.unix_timestamp("ts") - F.unix_timestamp(
            F.lit("2024-01-01 00:00:00").cast("timestamp"))) / 60)
        .cast("long").alias("minute"),
    )
    path = str(tmp_path / "z")
    write_zordered(e, path, "user_id", "minute", n_files=16)

    import os

    n_total = len([f for f in os.listdir(os.path.join(path, "data"))
                   if f.endswith(".parquet")])
    hit = pruned_files(spark, path, a_range=(10, 24), b_range=(2_000, 20_000))
    assert 0 < len(hit) < n_total, (len(hit), n_total)

    box = (
        F.col("user_id").between(10, 24) & F.col("minute").between(2_000, 20_000)
    )
    got = (
        pruned_read(spark, path, a_range=(10, 24), b_range=(2_000, 20_000))
        .filter(box).groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
    )
    want = e.filter(box).groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
