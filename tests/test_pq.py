"""Product-quantization (operators/pq.py): codebook determinism under
re-partitioning, zero-shuffle encode plan, and ADC recall vs the exact
L2 truth."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    p = os.path.join(SF_DIR, "embeddings.parquet")
    if os.path.exists(p):
        return spark.read.parquet(p)
    import math

    rows = [(i, [math.sin(i * j + 1) for j in range(8)], f"l{i % 3}") for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")


def _dim(emb):
    return len(emb.select("embedding").first()[0])


def test_pq_train_partitioning_invariant(spark, emb):
    # the determinism contract: identical codebook regardless of input
    # layout (sorted-id fold + micro-int distances + cent_id tie-breaks)
    from sandcrawler_spark.operators.pq import collect_codebook, pq_train

    dim = _dim(emb)
    b1 = collect_codebook(pq_train(emb.repartition(7), dim=dim, m=4), 4)
    b2 = collect_codebook(pq_train(emb.repartition(3), dim=dim, m=4), 4)
    assert b1 == b2
    # every subspace trained, centroids are subdim-length
    assert all(len(sub) >= 1 for sub in b1)
    assert all(len(cv) == dim // 4 for sub in b1 for (_cid, cv) in sub)


def test_pq_encode_codes_shape_and_plan(spark, emb):
    # encode is a single narrow pass: no shuffle in the executed plan
    from sandcrawler_spark.operators.pq import (
        collect_codebook,
        pq_encode,
        pq_train,
    )

    dim = _dim(emb)
    book = collect_codebook(pq_train(emb, dim=dim, m=4), 4)
    codes = pq_encode(emb, book, dim=dim)
    rows = codes.collect()
    assert len(rows) == emb.count()
    ksub = [len(s) for s in book]
    for r in rows:
        assert len(r["codes"]) == 4
        for s, c in enumerate(r["codes"]):
            assert 0 <= c < ksub[s]
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_pq_adc_recall_vs_exact(spark, emb):
    # ADC over 4x16-dim codes must keep most of the exact L2 top-5
    from sandcrawler_spark.operators.pq import (
        collect_codebook,
        exact_l2_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    dim = _dim(emb)
    book = collect_codebook(pq_train(emb, dim=dim, m=4), 4)
    codes = pq_encode(emb, book, dim=dim).localCheckpoint(eager=True)
    sample = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = exact_l2_topk(sample, emb, k=5).select("q_id", "vec_id")
    approx = pq_adc_topk(sample, codes, book, dim=dim, k=5).select("q_id", "vec_id")
    n_t = truth.count()
    n_hit = approx.join(truth, on=["q_id", "vec_id"]).count()
    assert n_t == 50
    # a vector's own code is its nearest codeword per subspace, so the
    # query itself (adist minimal) is always recalled; neighbors follow.
    # (m=4/mod=25 measures ~0.28 here; the driver query runs the
    # stronger m=8/mod=10 config at 0.52 — this bound is a floor, and
    # random top-5 would score k/N = 0.01)
    assert n_hit / n_t >= 0.2
    # self-hit: every query must appear in its own top-5
    self_hits = approx.filter(F.col("q_id") == F.col("vec_id")).count()
    assert self_hits == 10


def test_ivfpq_full_probe_equals_flat_adc(spark):
    # with nprobe >= ncells the coarse router prunes nothing, so the
    # composite must reproduce the flat ADC scan row for row
    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.pq import (
        collect_codebook,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    dim, m = 8, 4
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 + (1.0 if j == i % dim else 0.0)
                 for j in range(dim)]) for i in range(60)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    book = collect_codebook(pq_train(e, dim=dim, m=m, centroid_mod=10), m)
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    codes = pq_encode(e, book, dim)
    flat = sorted(pq_adc_topk(qs, codes, book, dim, k=4).collect())
    comp = sorted(
        ivfpq_topk(qs, e, book, dim, k=4, centroid_mod=10, nprobe=6).collect())
    assert comp == flat


def test_ivfpq_narrow_probe_subsets_flat_distances(spark):
    # with nprobe=1 results come only from probed cells, but every
    # returned distance must still equal the flat ADC distance
    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.pq import (
        collect_codebook,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    dim, m = 8, 2
    rows = [(i, [float((i * 5 + j) % 9) for j in range(dim)]) for i in range(50)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    book = collect_codebook(pq_train(e, dim=dim, m=m, centroid_mod=10), m)
    qs = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    codes = pq_encode(e, book, dim)
    flat = {(r.q_id, r.vec_id): r.adist_micro
            for r in pq_adc_topk(qs, codes, book, dim, k=50).collect()}
    comp = ivfpq_topk(qs, e, book, dim, k=5, centroid_mod=10, nprobe=1).collect()
    assert comp, "narrow probe must still return rows"
    for r in comp:
        assert flat[(r.q_id, r.vec_id)] == r.adist_micro
