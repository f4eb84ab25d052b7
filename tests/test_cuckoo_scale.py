"""Design-scale cuckoo seen-set test: cogroup build/probe/delete at
10^7 keys (1/1000 of the 10^10 design, same per-bucket table sizes as
production with proportionally fewer buckets).

The fast suite exercises the cuckoo at 10^3-10^4 keys via broadcast;
this runs the cogroup path at a scale where the per-bucket tables match
the production envelope (~2.4M keys / 0.84 load * 4 slots * 2 B ≈ 6 MB
per bucket at 10^10/4096; here 10^7/4 buckets gives the same per-task
shape) and asserts the load-bearing properties: no false negatives
after build, unseen(cuckoo+exact) == unseen(exact), and deletion of a
large evicted slice keeps both guarantees.

Gated behind SPARK_GRAFT_BIG_TESTS=1:
  SPARK_GRAFT_BIG_TESTS=1 python -m pytest tests/test_cuckoo_scale.py -q -s
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

N_SEEN = int(os.environ.get("SPARK_GRAFT_CUCKOO_KEYS", 10_000_000))
N_PROBE = int(os.environ.get("SPARK_GRAFT_CUCKOO_PROBES", 1_000_000))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BIG_TESTS") != "1",
    reason="design-scale test: set SPARK_GRAFT_BIG_TESTS=1",
)


def test_cuckoo_cogroup_at_design_scale(spark):
    from sandcrawler_spark.operators.cuckoo import (
        build_cuckoo,
        delete_cuckoo,
        probe_cuckoo,
        unseen_cuckoo_exact,
    )
    from sandcrawler_spark.operators.seen import unseen_exact

    n_buckets = 4  # production per-bucket load (~2.4M keys/bucket)
    key = F.concat(F.lit("https://h"), (F.col("id") % 1000).cast("string"),
                   F.lit(".example.org/p/"), F.col("id").cast("string"))
    seen = spark.range(N_SEEN).select(key.alias("canon_url"))
    probe = spark.range(N_SEEN - N_PROBE // 2, N_SEEN + N_PROBE // 2).select(
        key.alias("canon_url")
    )

    t0 = time.time()
    ck = build_cuckoo(seen, "canon_url", n_buckets=n_buckets,
                      expected_keys_per_bucket=N_SEEN // n_buckets + 1)
    t_build = time.time() - t0
    stats = ck.agg(
        F.count("*").alias("b"), F.sum("n_keys").alias("n"), F.max("n_slots").alias("s")
    ).collect()[0]
    assert stats.n == N_SEEN
    mb = stats.b * stats.s * 4 * 2 / 1e6
    print(f"\ncuckoo build: {N_SEEN} keys, {stats.b} buckets, {mb:.0f} MB tables, {t_build:.1f}s")

    # no false negatives on a seen sample (cogroup probe)
    sample = seen.sample(0.01, seed=7)
    fn = probe_cuckoo(sample, ck, "canon_url", n_buckets, strategy="cogroup").filter(
        ~F.col("maybe_seen")
    ).count()
    assert fn == 0

    t0 = time.time()
    got = unseen_cuckoo_exact(probe, seen, ck, "canon_url", n_buckets, strategy="cogroup")
    n_got = got.count()
    t_probe = time.time() - t0
    want = unseen_exact(probe, seen, "canon_url")
    assert n_got == want.count() == N_PROBE // 2
    print(f"cuckoo probe+rescue: {N_PROBE} candidates in {t_probe:.1f}s")

    # delete a 10% evicted slice; guarantees survive
    evicted = seen.filter(F.col("canon_url").substr(-1, 1) == "0")
    t0 = time.time()
    ck2 = delete_cuckoo(ck, evicted, "canon_url", n_buckets)
    t_del = time.time() - t0
    seen2 = seen.exceptAll(evicted)
    fn2 = probe_cuckoo(seen2.sample(0.01, seed=9), ck2, "canon_url", n_buckets,
                       strategy="cogroup").filter(~F.col("maybe_seen")).count()
    assert fn2 == 0
    n_deleted = N_SEEN - ck2.agg(F.sum("n_keys")).collect()[0][0]
    assert n_deleted == evicted.count()
    print(f"cuckoo delete: {n_deleted} evictions in {t_del:.1f}s")
