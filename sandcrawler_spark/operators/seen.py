"""URL-seen set: exact left-anti join + partitioned bloom prefilter.

Reference semantics: "have we already processed this key?" realized as
HBase point-gets (/root/reference/python_hadoop/extraction_cdx_grobid.py:
246-253), SQL ON CONFLICT primary keys (db.py:100-163), and the
left-anti "dump ungrobided" job (scalding/.../DumpUnGrobidedJob.scala:
22-47). At 10^10 keys a naive anti-join shuffles the full frontier
against the full seen set every round, so the scale path is:

  1. BUILD: hash-bucket the seen keys (pmod(xxhash64(key), B)); one
     applyInPandas per bucket builds a bloom bitmap; result is a tiny
     table (B rows of ~m/8 bytes). For 10^10 keys @1% FPR: m ≈ 9.6e10
     bits ≈ 12 GB total → B=4096 buckets of ~3 MB each; no single
     bitmap ever exceeds a task's memory and the build is fully
     parallel. The bloom table is itself snapshot-persisted and
     incrementally mergeable (bitmaps OR together).
  2. PROBE: candidates join the bloom table on bucket (broadcast —
     per-bucket bitmaps are small and only the buckets candidates
     hash into are read), a vectorized UDF tests membership.
  3. CORRECT: bloom "maybe-seen" rows get an exact left-anti join
     against the seen set — false positives are resolved, false
     negatives are impossible, so:  unseen(bloom+exact) == unseen(exact).
     The anti-join now touches only ~(hit-rate + FPR) of the frontier.

Hash choice: md5(key) split into two 64-bit halves, positions =
(h1 + i*h2) mod m — deterministic across Python/NumPy versions, no
external deps, identical build/probe code path.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k_hashes", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)


def _positions(key: str, m_bits: int, k_hashes: int) -> np.ndarray:
    d = hashlib.md5(key.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return (h1 + np.arange(k_hashes, dtype=np.uint64) * np.uint64(h2)) % np.uint64(m_bits)


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def build_bloom(
    seen: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    bits_per_key: int = 10,
    k_hashes: int = 7,
    expected_keys_per_bucket: int | None = None,
) -> DataFrame:
    """seen keys -> one bloom bitmap row per bucket."""
    keyed = seen.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull())
    keyed = keyed.withColumn("bucket", bucket_col(F.col("k"), n_buckets))

    # size each bucket's bitmap for its expected load (uniform after hash
    # bucketing, so a global estimate is fine)
    if expected_keys_per_bucket is None:
        n_total = keyed.count()
        expected_keys_per_bucket = max(64, (n_total // n_buckets) + 1)
    m_bits = int(expected_keys_per_bucket) * bits_per_key
    m_bits = max(512, ((m_bits + 63) // 64) * 64)

    def _build(pdf_iter: Iterable[pd.DataFrame]):
        acc: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in pdf_iter:
            for bkt, key in zip(pdf["bucket"].to_numpy(), pdf["k"]):
                bm = acc.get(bkt)
                if bm is None:
                    bm = np.zeros(m_bits // 8, dtype=np.uint8)
                    acc[bkt] = bm
                    counts[bkt] = 0
                pos = _positions(key, m_bits, k_hashes)
                np.bitwise_or.at(bm, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
                counts[bkt] += 1
        if acc:
            yield pd.DataFrame(
                {
                    "bucket": list(acc.keys()),
                    "bitmap": [bm.tobytes() for bm in acc.values()],
                    "m_bits": m_bits,
                    "k_hashes": k_hashes,
                    "n_keys": [counts[b] for b in acc],
                }
            )

    # repartition by bucket so each task owns whole buckets
    return (
        keyed.repartition(min(n_buckets, 256), "bucket")
        .mapInPandas(_build, schema=BLOOM_SCHEMA)
        .groupBy("bucket")
        .applyInPandas(_merge_bucket, schema=BLOOM_SCHEMA)
    )


def _merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """OR together partial bitmaps for the same bucket (also how
    incremental seen-set updates merge with a prior bloom snapshot)."""
    if len(pdf) == 1:
        return pdf
    bm = np.zeros(len(pdf["bitmap"].iloc[0]), dtype=np.uint8)
    for b in pdf["bitmap"]:
        bm |= np.frombuffer(b, dtype=np.uint8)
    return pd.DataFrame(
        {
            "bucket": [pdf["bucket"].iloc[0]],
            "bitmap": [bm.tobytes()],
            "m_bits": [pdf["m_bits"].iloc[0]],
            "k_hashes": [pdf["k_hashes"].iloc[0]],
            "n_keys": [int(pdf["n_keys"].sum())],
        }
    )


@F.pandas_udf(T.BooleanType())
def _bloom_test_udf(
    key: pd.Series, bitmap: pd.Series, m_bits: pd.Series, k_hashes: pd.Series
) -> pd.Series:  # pragma: no cover - via Spark
    out = []
    for kk, bm, m, k in zip(key, bitmap, m_bits, k_hashes):
        if bm is None:
            out.append(False)
            continue
        arr = np.frombuffer(bm, dtype=np.uint8)
        pos = _positions(kk, int(m), int(k))
        out.append(bool(np.all(arr[(pos // 8).astype(np.int64)] & (1 << (pos % 8)).astype(np.uint8))))
    return pd.Series(out)


def probe_bloom(candidates: DataFrame, bloom: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Append `maybe_seen` to candidates. Bloom side is broadcast (B
    rows); rows whose bucket has no bitmap are definitively unseen."""
    c = candidates.withColumn("_bkt", bucket_col(F.col(key_col), n_buckets))
    j = c.join(F.broadcast(bloom), c["_bkt"] == bloom["bucket"], "left")
    return (
        j.withColumn(
            "maybe_seen",
            F.when(F.col("bitmap").isNull(), F.lit(False)).otherwise(
                _bloom_test_udf(F.col(key_col), F.col("bitmap"), F.col("m_bits"), F.col("k_hashes"))
            ),
        )
        .drop("bucket", "bitmap", "m_bits", "k_hashes", "n_keys", "_bkt")
    )


def unseen_exact(frontier: DataFrame, seen: DataFrame, key_col: str) -> DataFrame:
    """Authoritative path: plain left-anti join on the key."""
    return frontier.join(
        seen.select(F.col(key_col)).distinct(), on=key_col, how="left_anti"
    )


def unseen_bloom_exact(
    frontier: DataFrame, seen: DataFrame, bloom: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    """Scale path: bloom prefilter, then exact anti-join only on the
    maybe-seen slice. Equals unseen_exact() by construction (no false
    negatives; false positives corrected)."""
    probed = probe_bloom(frontier, bloom, key_col, n_buckets)
    clean = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = unseen_exact(suspect, seen, key_col)
    return clean.unionByName(rescued)
