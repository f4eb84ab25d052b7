"""URL-seen set: exact left-anti join + partitioned bloom prefilter.

Reference semantics: "have we already processed this key?" realized as
HBase point-gets (/root/reference/python_hadoop/extraction_cdx_grobid.py:
246-253), SQL ON CONFLICT primary keys (db.py:100-163), and the
left-anti "dump ungrobided" job (scalding/.../DumpUnGrobidedJob.scala:
22-47). At 10^10 keys a naive anti-join shuffles the full frontier
against the full seen set every round, so the scale path is:

  1. BUILD: hash-bucket the seen keys (pmod(xxhash64(key), B)); one
     mapInPandas pass per bucket-partition builds a bloom bitmap;
     result is a tiny table (B rows of ~m/8 bytes). For 10^10 keys
     @1% FPR: m ≈ 9.6e10 bits ≈ 12 GB total → B=4096 buckets of ~3 MB
     each; no single bitmap ever exceeds a task's memory and the
     build is fully parallel. The bloom table is snapshot-persisted
     and incrementally mergeable (bitmaps OR together).
  2. PROBE: candidates are grouped by bucket and COGROUPed with the
     bloom table — each bucket's bitmap crosses Arrow ONCE PER
     BUCKET-GROUP, never once per row (a broadcast equi-join would
     duplicate the bitmap onto every candidate row). Membership test
     is one vectorized numpy gather per batch.
  3. CORRECT: bloom "maybe-seen" rows get an exact left-anti join
     against the seen set — false positives are resolved, false
     negatives are impossible, so:  unseen(bloom+exact) == unseen(exact).
     The anti-join now touches only ~(hit-rate + FPR) of the frontier.

Hashing is all JVM-side (two independent xxhash64 columns; positions
= (h1 + i*h2) mod m, double-hashing) — no per-row Python anywhere;
the Python tier only does numpy bit arithmetic on Arrow batches.
"""

from __future__ import annotations

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

_H2_SALT = "sc-bloom-h2"


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def _with_hashes(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Bucket + double-hash columns, all JVM-side (codegen'd)."""
    k = F.col(key_col)
    return (
        df.withColumn("_bkt", bucket_col(k, n_buckets))
        .withColumn("_h1", F.xxhash64(k))
        .withColumn("_h2", F.xxhash64(F.lit(_H2_SALT), k))
    )


def _positions_np(h1: np.ndarray, h2: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) matrix of bit positions via double hashing — vectorized."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)
    ks = np.arange(k_hashes, dtype=np.uint64)
    return (h1u[:, None] + ks[None, :] * h2u[:, None]) % np.uint64(m_bits)


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
    keyed = _with_hashes(keyed, "k", n_buckets).select("_bkt", "_h1", "_h2")

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
            bkts = pdf["_bkt"].to_numpy()
            h1 = pdf["_h1"].to_numpy()
            h2 = pdf["_h2"].to_numpy()
            for bkt in np.unique(bkts):
                mask = bkts == bkt
                bm = acc.get(bkt)
                if bm is None:
                    bm = np.zeros(m_bits // 8, dtype=np.uint8)
                    acc[int(bkt)] = bm
                    counts[int(bkt)] = 0
                pos = _positions_np(h1[mask], h2[mask], m_bits, k_hashes).ravel()
                np.bitwise_or.at(
                    bm, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8)
                )
                counts[int(bkt)] += int(mask.sum())
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

    # repartition by bucket: hash partitioning puts ALL rows of a
    # bucket in one task, so each bucket yields exactly one complete
    # bitmap — no cross-partition merge stage is needed at build time
    # (_merge_bucket exists for incremental snapshot merges, where
    # partials from different builds OR together). The result is
    # eagerly checkpointed: bloom tables are tiny by construction
    # (B rows of m/8 bytes) and every caller reads them at least twice
    # (size stats + bitmap collect / cogroup) — without this each
    # collect re-runs the whole build.
    out = keyed.repartition(min(n_buckets, 256), "_bkt").mapInPandas(
        _build, schema=BLOOM_SCHEMA
    )
    return out.localCheckpoint(eager=True)


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


def resolve_bloom_strategy(
    bloom: DataFrame,
    strategy: str = "auto",
    broadcast_max_bytes: int = 256 * 1024 * 1024,
) -> str:
    """Resolve 'auto' to a concrete probe strategy: broadcast iff the
    bloom's total bitmap bytes fit under broadcast_max_bytes. Callers
    that branch on the strategy (e.g. unseen_bloom_exact's checkpoint
    decision) resolve once here so their branch and probe_bloom's
    agree."""
    if strategy != "auto":
        return strategy
    stats = bloom.select(
        F.count("*").alias("b"), F.first("m_bits").alias("m")
    ).collect()[0]
    total = (stats.b or 0) * ((stats.m or 0) // 8)
    return "broadcast" if total <= broadcast_max_bytes else "cogroup"


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_buckets: int,
    strategy: str = "auto",
    broadcast_max_bytes: int = 256 * 1024 * 1024,
    bloom_bc=None,
) -> DataFrame:
    """Append `maybe_seen` to candidates.

    strategy='broadcast' (default for small filters): bitmaps ride to
    the workers once via closure broadcast and the probe is a NARROW
    pandas UDF over JVM-computed hash columns — zero shuffle, zero
    sort, 17 bytes/row through Arrow. The right plan whenever the
    bloom fits in executor memory (≤ a few hundred MB).

    strategy='cogroup': the 10^10-key path — bitmaps too big to
    broadcast (12 GB at 10^10 keys / 4096 buckets); candidates
    shuffle by bucket and meet their bucket's bitmap once per group.

    'auto' picks broadcast iff the bloom's total bitmap bytes fit
    under broadcast_max_bytes."""
    strategy = resolve_bloom_strategy(bloom, strategy, broadcast_max_bytes)
    if strategy == "broadcast":
        return _probe_bloom_broadcast(candidates, bloom, key_col, n_buckets, bloom_bc=bloom_bc)
    return _probe_bloom_cogroup(candidates, bloom, key_col, n_buckets)


def prepare_bloom_broadcast(bloom: DataFrame):
    """Collect the bloom's bitmaps and ship them as an explicit Spark
    broadcast variable. A long-lived driver loop (bench rounds,
    CrawlRunner) calls this ONCE and passes the handle to
    probe_bloom/unseen_bloom_exact via bloom_bc= — otherwise every
    round pays a collect + re-broadcast of the identical bitmaps (a
    fixed per-round driver action that erodes scaling efficiency: the
    compute shrinks 4x at 4N cores, the fixed cost doesn't)."""
    spark = bloom.sparkSession
    rows = bloom.collect()
    return spark.sparkContext.broadcast(
        {int(r.bucket): (bytes(r.bitmap), int(r.m_bits), int(r.k_hashes)) for r in rows}
    )


def _probe_bloom_broadcast(
    candidates: DataFrame, bloom: DataFrame, key_col: str, n_buckets: int, bloom_bc=None
) -> DataFrame:
    # ship the bitmaps as an EXPLICIT broadcast variable (torrent
    # distribution, one copy per executor, spillable) — capturing a
    # multi-hundred-MB dict in the UDF closure would serialize it into
    # every task binary instead
    bc = bloom_bc if bloom_bc is not None else prepare_bloom_broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def _test(bkt: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:  # pragma: no cover
        bitmaps = bc.value
        bkts = bkt.to_numpy()
        h1n = h1.to_numpy()
        h2n = h2.to_numpy()
        out = np.zeros(len(bkts), dtype=bool)
        for b in np.unique(bkts):
            entry = bitmaps.get(int(b))
            if entry is None:
                continue
            bm_bytes, m_bits, k_hashes = entry
            bm = np.frombuffer(bm_bytes, dtype=np.uint8)
            mask = bkts == b
            pos = _positions_np(h1n[mask], h2n[mask], m_bits, k_hashes)
            hits = (bm[(pos // 8).astype(np.int64)] & (1 << (pos % 8)).astype(np.uint8)) != 0
            out[mask] = hits.all(axis=1)
        return pd.Series(out)

    c = _with_hashes(candidates, key_col, n_buckets)
    return c.withColumn(
        "maybe_seen", _test(F.col("_bkt"), F.col("_h1"), F.col("_h2"))
    ).drop("_bkt", "_h1", "_h2")


def _probe_bloom_cogroup(
    candidates: DataFrame, bloom: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    """Cogroup by bucket: each bucket's bitmap is deserialized once per
    group and the membership test is a single vectorized numpy gather
    over the whole Arrow batch. Rows whose bucket has no bitmap are
    definitively unseen."""
    base_cols = candidates.columns
    c = _with_hashes(candidates, key_col, n_buckets)
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def _probe(cand: pd.DataFrame, bl: pd.DataFrame) -> pd.DataFrame:
        out = cand[base_cols].copy()
        if len(bl) == 0:
            out["maybe_seen"] = False
            return out
        bm = np.frombuffer(bl["bitmap"].iloc[0], dtype=np.uint8)
        m_bits = int(bl["m_bits"].iloc[0])
        k_hashes = int(bl["k_hashes"].iloc[0])
        pos = _positions_np(cand["_h1"].to_numpy(), cand["_h2"].to_numpy(), m_bits, k_hashes)
        hits = (bm[(pos // 8).astype(np.int64)] & (1 << (pos % 8)).astype(np.uint8)) != 0
        out["maybe_seen"] = hits.all(axis=1)
        return out

    return (
        c.groupBy("_bkt")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(_probe, schema=out_schema)
    )


def unseen_exact(frontier: DataFrame, seen: DataFrame, key_col: str) -> DataFrame:
    """Authoritative path: plain left-anti join on the key."""
    return frontier.join(
        seen.select(F.col(key_col)).distinct(), on=key_col, how="left_anti"
    )


def unseen_bloom_exact(
    frontier: DataFrame,
    seen: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_buckets: int,
    strategy: str = "auto",
    materialize: bool = True,
    bloom_bc=None,
) -> DataFrame:
    """Scale path: bloom prefilter, then exact anti-join only on the
    maybe-seen slice. Equals unseen_exact() by construction (no false
    negatives; false positives corrected).

    materialize=True checkpoints the FINAL union (one job, one
    serialization pass): the result feeds the whole downstream round —
    politeness alone reads it several times (host histogram, hot/cold
    branches, excluded branch), and without a materialization each of
    those jobs re-executes the probe + rescue anti-join (measured:
    ~4-7s of fixed re-execution per downstream job at 3.2M rows, the
    main reason rounds stopped scaling with cores). Inside that single
    checkpoint job the broadcast probe UDF runs once per filter branch
    (it is a cheap vectorized numpy pass over JVM-computed hashes);
    the cogroup variant's probe is an exchange, so its branches get
    shuffle reuse instead. The probe is deterministic, so
    materialize=False is merely a compute-vs-memory tradeoff."""
    # Resolve 'auto' BEFORE branching: otherwise an auto that resolves
    # to cogroup inside probe_bloom would skip the probe checkpoint and
    # re-run the cogroup exchange per downstream filter branch.
    strategy = resolve_bloom_strategy(bloom, strategy)
    probed = probe_bloom(frontier, bloom, key_col, n_buckets, strategy=strategy, bloom_bc=bloom_bc)
    if materialize and strategy == "cogroup":
        probed = probed.localCheckpoint(eager=True)
    clean = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = unseen_exact(suspect, seen, key_col)
    out = clean.unionByName(rescued)
    if materialize:
        out = out.localCheckpoint(eager=True)
    return out


def bloom_sizing_plan(
    urls,
    url_col: str = "url",
    bits_options: tuple[int, ...] = (4, 6, 8, 10, 12, 14, 16, 20),
):
    """Capacity-planning table for the URL-seen bloom filter: for each
    bits-per-key budget, the optimal hash count k = round(ln2 * bits)
    and the resulting false-positive rate — evaluated for THIS
    frontier's measured distinct-URL count and extrapolated to the
    north-star 10^10-key set. One distinct-count aggregate + a
    literal-array explode; fpr = (1 - e^(-k/bits))^k with ONE
    round-to-ppm per row (exp/pow are the same libm call on the same
    doubles in both engines — the lm.py discipline).

    Returns (n_urls, bits_per_key, m_bits, k_opt, fpr_ppm, mem_mb,
    mem_gb_at_1e10)."""
    from pyspark.sql import functions as F

    n = urls.agg(F.countDistinct(url_col).cast("long").alias("n_urls"))
    opts = F.explode(
        F.array(*[F.lit(int(b)) for b in bits_options])
    ).alias("bits_per_key")
    t = n.select("n_urls", opts)
    k_opt = F.greatest(
        F.lit(1).cast("long"),
        F.round(F.lit(0.6931471805599453) * F.col("bits_per_key")).cast("long"),
    )
    t = t.withColumn("k_opt", k_opt)
    fpr = F.pow(
        F.lit(1.0) - F.exp(-F.col("k_opt").cast("double") / F.col("bits_per_key").cast("double")),
        F.col("k_opt").cast("double"),
    )
    return t.select(
        "n_urls",
        F.col("bits_per_key").cast("long").alias("bits_per_key"),
        (F.col("bits_per_key") * F.col("n_urls")).cast("long").alias("m_bits"),
        "k_opt",
        F.round(fpr * 1_000_000).cast("long").alias("fpr_ppm"),
        F.expr("bits_per_key * n_urls div 8 div 1048576").cast("long").alias("mem_mb"),
        F.expr(
            "CAST(bits_per_key AS BIGINT) * CAST(10000000000 AS BIGINT)"
            " div 8 div 1073741824"
        ).alias("mem_gb_at_1e10"),
    )
