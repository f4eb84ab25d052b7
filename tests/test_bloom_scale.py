"""Design-scale seen-set test: the COGROUP bloom path at 10^8 keys.

The 10^10 production design (SURVEY.md §3.2 / seen.py module doc)
shards the bloom across buckets and cogroups candidates with their
bucket's bitmap because the full filter does not fit a broadcast. The
fast suite only exercises the broadcast path at 10^4; this test runs
the cogroup path at 1/100 of design scale (10^8 seen keys, 10^7
candidates — same per-bucket bitmap sizes as production with 10x more
buckets) and asserts the correctness property the whole construction
rests on:  unseen(bloom_prefilter + exact_rescue) == unseen(exact).

Gated behind SPARK_GRAFT_BIG_TESTS=1 (several minutes of wall-clock);
run manually or from the bench harness, results recorded in BENCH.md.
  SPARK_GRAFT_BIG_TESTS=1 python -m pytest tests/test_bloom_scale.py -q
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

N_SEEN = int(os.environ.get("SPARK_GRAFT_BLOOM_KEYS", 100_000_000))
N_PROBE = int(os.environ.get("SPARK_GRAFT_BLOOM_PROBES", 10_000_000))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BIG_TESTS") != "1",
    reason="design-scale test: set SPARK_GRAFT_BIG_TESTS=1",
)


def test_bloom_cogroup_at_design_scale(spark):
    from sandcrawler_spark.operators.seen import build_bloom, unseen_bloom_exact, unseen_exact

    n_buckets = 1024
    key = F.concat(F.lit("https://h"), (F.col("id") % 1000).cast("string"),
                   F.lit(".example.org/p/"), F.col("id").cast("string"))
    seen = spark.range(N_SEEN).select(key.alias("canon_url"))
    # probe window straddles the seen range: half seen, half not
    probe = spark.range(N_SEEN - N_PROBE // 2, N_SEEN + N_PROBE // 2).select(
        key.alias("canon_url")
    )

    t0 = time.time()
    bloom = build_bloom(seen, "canon_url", n_buckets=n_buckets).localCheckpoint(eager=True)
    t_build = time.time() - t0
    stats = bloom.agg(
        F.count("*").alias("b"), F.sum("n_keys").alias("n"), F.first("m_bits").alias("m")
    ).collect()[0]
    assert stats.n == N_SEEN
    total_mb = stats.b * stats.m / 8 / 1e6
    print(f"\nbloom build: {N_SEEN} keys, {stats.b} buckets, {total_mb:.0f} MB, {t_build:.1f}s")

    t0 = time.time()
    got = unseen_bloom_exact(probe, seen, bloom, "canon_url", n_buckets, strategy="cogroup")
    got = got.localCheckpoint(eager=True)
    n_got = got.count()
    t_probe = time.time() - t0
    print(f"cogroup probe: {N_PROBE} candidates in {t_probe:.1f}s -> {n_got} unseen")

    expected = unseen_exact(probe, seen, "canon_url").localCheckpoint(eager=True)
    n_expected = expected.count()
    assert n_expected == N_PROBE // 2
    # exact set equality, both directions
    assert n_got == n_expected
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
