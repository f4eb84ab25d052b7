"""URL-seen set, cuckoo-filter variant: partitioned, deletable.

The north-star design calls for "a 10^10-entry URL-seen set implemented
as partitioned bloom/cuckoo filters keyed by SURT-canonicalized URL
hashes". `seen.py` is the bloom half; this is the cuckoo half (Fan et
al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 —
public paper). Same reference semantics as the bloom path (HBase
existence checks, /root/reference/python_hadoop/extraction_cdx_grobid.py:
246-253; left-anti DumpUnGrobidedJob.scala:22-47), with the one
capability a bloom cannot provide: DELETION. A recrawl scheduler that
decides a URL is stale (operators/frontier.py) can evict exactly that
key from the filter, so the next round's prefilter passes it without a
full rebuild — the reference gets the same effect by deleting the HBase
row.

Layout mirrors the bloom table: hash-bucketed (pmod(xxhash64(key), B)),
one row per bucket, each row holding a small cuckoo table:

  table: n_slots x SLOT_WIDTH uint16 fingerprints (0 = empty slot);
  fp    = (xxhash64(salt,key) % 65535) + 1        (never 0);
  i1    = xxhash64(key) & (n_slots-1);
  i2    = i1 XOR (fp * 0x5bd1e995  & (n_slots-1)) (partial-key cuckoo:
          i2 is derivable from (i1, fp) alone, which is what makes
          eviction kicks possible without the original key).

At 10^10 keys / 4096 buckets and 16-bit fingerprints the per-bucket
table is ~6 MB (2.4M keys / 0.84 load * 4 slots * 2 bytes) — same task-
memory envelope as the bloom bitmaps, FPR ~ 2*SLOT_WIDTH/65535 ~ 0.012%.

BUILD is one repartition-by-bucket + mapInPandas (all rows of a bucket
in one task -> complete table, no merge stage). Insertion is batched-
vectorized: alternating i1/i2 placement rounds place the vast majority
of keys with numpy scatter ops; only the tiny overflow remainder walks
the classic per-key kick loop. PROBE and the exact-rescue composition
(`unseen_cuckoo_exact`) reuse the bloom module's broadcast/cogroup
strategies and guarantee: no false negatives (inserts raise on table-
full rather than dropping keys), false positives rescued by the exact
anti-join — so unseen(cuckoo+exact) == unseen(exact) by construction.

All hashing is JVM-side (xxhash64, codegen'd); Python only does numpy
array arithmetic on Arrow batches. No per-row Python on the hot path.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.operators.seen import _with_hashes, unseen_exact

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),
        T.StructField("n_slots", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)

SLOT_WIDTH = 4  # fingerprints per slot (standard (2,4)-cuckoo)
_FP_MIX = np.uint64(0x5BD1E995)  # multiply-mix for the partial-key hop
_TARGET_LOAD = 0.84  # (2,4)-cuckoo fills reliably to ~0.95; size with slack


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the salted second hash."""
    return ((h2.astype(np.uint64) % np.uint64(65535)) + np.uint64(1)).astype(np.uint16)


def _mix64(x: np.ndarray) -> np.ndarray:
    """murmur3 fmix64. Required: the bucket id is h1 mod n_buckets, so
    within one bucket the raw low bits of h1 are constant mod n_buckets
    — taking h1 & (n_slots-1) directly would collapse the i1 row space
    to n_slots/n_buckets rows and overfill the table at ~half load."""
    x = x.astype(np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _index1(h1: np.ndarray, n_slots: int) -> np.ndarray:
    return (_mix64(h1) & np.uint64(n_slots - 1)).astype(np.int64)


def _alt_index(idx: np.ndarray, fp: np.ndarray, n_slots: int) -> np.ndarray:
    hop = (fp.astype(np.uint64) * _FP_MIX) & np.uint64(n_slots - 1)
    return (idx.astype(np.uint64) ^ hop).astype(np.int64)


def _sized_slots(n_keys: int) -> int:
    need = max(8, int(n_keys / (SLOT_WIDTH * _TARGET_LOAD)) + 1)
    return 1 << (need - 1).bit_length()  # power of two: XOR hop stays in range


def _place_round(table, occ, idx, fp):
    """One vectorized placement round: every pending key tries its
    current candidate slot-row; within a slot-row, up to the remaining
    capacity get scattered in (stable order). Returns the placed mask."""
    order = np.argsort(idx, kind="stable")
    sidx = idx[order]
    boundaries = np.concatenate(([True], sidx[1:] != sidx[:-1]))
    run_start = np.maximum.accumulate(np.where(boundaries, np.arange(len(sidx)), 0))
    rank = np.arange(len(sidx)) - run_start
    free = SLOT_WIDTH - occ[sidx]
    ok = rank < free
    rows = sidx[ok]
    cols = (occ[sidx] + rank)[ok]
    table[rows, cols] = fp[order][ok]
    np.add.at(occ, rows, 1)
    placed = np.zeros(len(idx), dtype=bool)
    placed[order[ok]] = True
    return placed


def _insert_with_kicks(table, occ, i1, fp, n_slots, max_kicks=500):
    """Classic per-key insert with eviction kicks — only the overflow
    remainder of the vectorized rounds comes through here. The victim
    slot choice is a deterministic function of (row, kick) so builds
    are reproducible. Raises on table-full: a dropped key would be a
    FALSE NEGATIVE, which the exact-rescue stage cannot correct."""
    mask = np.uint64(n_slots - 1)
    cur = np.int64(i1)
    f = np.uint16(fp)
    for idx in (cur, np.int64(_alt_index(np.array([cur]), np.array([f]), n_slots)[0])):
        if occ[idx] < SLOT_WIDTH:
            table[idx, occ[idx]] = f
            occ[idx] += 1
            return
        cur = idx
    for kick in range(max_kicks):
        slot = (int(cur) + kick) % SLOT_WIDTH
        f, table[cur, slot] = table[cur, slot], f
        hop = (np.uint64(f) * _FP_MIX) & mask
        cur = np.int64(np.uint64(cur) ^ hop)
        if occ[cur] < SLOT_WIDTH:
            table[cur, occ[cur]] = f
            occ[cur] += 1
            return
    raise ValueError(
        f"cuckoo bucket overfull (n_slots={n_slots}): resize via "
        "expected_keys_per_bucket — a silently dropped key would break "
        "the no-false-negative guarantee"
    )


def build_cuckoo(
    seen: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    expected_keys_per_bucket: int | None = None,
) -> DataFrame:
    """seen keys -> one cuckoo-table row per hash bucket.

    Same single-stage shape as build_bloom: repartition by bucket so
    each bucket's keys land in one task, build the complete table
    there, checkpoint the tiny result (every caller reads it at least
    twice). Keys are deduped per bucket on the (h1, h2) pair — set
    semantics, and required for delete correctness (one inserted copy
    per distinct key)."""
    keyed = seen.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull())
    keyed = _with_hashes(keyed, "k", n_buckets).select("_bkt", "_h1", "_h2")

    if expected_keys_per_bucket is None:
        n_total = keyed.count()
        expected_keys_per_bucket = max(64, (n_total // n_buckets) + 1)
    default_slots = _sized_slots(int(expected_keys_per_bucket))

    def _build(pdf_iter: Iterable[pd.DataFrame]):
        parts: dict[int, list[pd.DataFrame]] = {}
        for pdf in pdf_iter:
            for bkt, grp in pdf.groupby("_bkt"):
                parts.setdefault(int(bkt), []).append(grp)
        if not parts:
            return
        out = {"bucket": [], "table": [], "n_slots": [], "n_keys": []}
        for bkt, grps in parts.items():
            grp = pd.concat(grps, ignore_index=True) if len(grps) > 1 else grps[0]
            grp = grp.drop_duplicates(subset=["_h1", "_h2"])
            h1 = grp["_h1"].to_numpy()
            fp = _fingerprints(grp["_h2"].to_numpy())
            # grow beyond the global estimate if this bucket is heavy
            n_slots = max(default_slots, _sized_slots(len(grp)))
            table = np.zeros((n_slots, SLOT_WIDTH), dtype=np.uint16)
            occ = np.zeros(n_slots, dtype=np.int64)
            idx = _index1(h1, n_slots)
            pending = np.ones(len(fp), dtype=bool)
            use_alt = False
            for _ in range(8):  # alternating vectorized rounds
                if not pending.any():
                    break
                cand = _alt_index(idx, fp, n_slots) if use_alt else idx
                placed = _place_round(table, occ, cand[pending], fp[pending])
                live = np.flatnonzero(pending)
                pending[live[placed]] = False
                use_alt = not use_alt
            for j in np.flatnonzero(pending):  # tiny overflow remainder
                _insert_with_kicks(table, occ, idx[j], fp[j], n_slots)
            out["bucket"].append(bkt)
            out["table"].append(table.tobytes())
            out["n_slots"].append(n_slots)
            out["n_keys"].append(len(grp))
        yield pd.DataFrame(out)

    built = keyed.repartition(min(n_buckets, 256), "_bkt").mapInPandas(
        _build, schema=CUCKOO_SCHEMA
    )
    return built.localCheckpoint(eager=True)


def insert_cuckoo(cuckoo: DataFrame, additions: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Incremental snapshot merge: insert new keys into the existing
    per-bucket tables (the cuckoo analog of the bloom's bitmap OR —
    cuckoo tables don't OR, they re-insert). Each touched bucket is
    rewritten once via cogroup; untouched buckets pass through.
    Additions are deduped per bucket on (h1, h2); keys already IN the
    filter get a second fingerprint copy (the standard cuckoo-filter
    choice: copies err on the rescued false-positive side, whereas
    skipping an "already present" fingerprint would merge distinct
    colliding keys and let a later delete manufacture a false
    negative). In crawl use additions are the round's newly-unseen
    URLs, disjoint from the set by construction, so copies don't
    accumulate. Raises (rather than drops) if a bucket's table can no
    longer hold its keys — rebuild that bucket bigger via
    build_cuckoo at that point."""
    adds = additions.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull())
    adds = _with_hashes(adds, "k", n_buckets).select(
        F.col("_bkt").alias("bucket"), "_h1", "_h2"
    )

    def _apply(filt: pd.DataFrame, aa: pd.DataFrame) -> pd.DataFrame:
        if len(filt) == 0:
            # additions for a bucket with no table yet: build one fresh
            if len(aa) == 0:
                return pd.DataFrame({c: [] for c in ["bucket", "table", "n_slots", "n_keys"]})
            aa = aa.drop_duplicates(subset=["_h1", "_h2"])
            n_slots = _sized_slots(len(aa))
            table = np.zeros((n_slots, SLOT_WIDTH), dtype=np.uint16)
            occ = np.zeros(n_slots, dtype=np.int64)
            h1 = aa["_h1"].to_numpy()
            fp = _fingerprints(aa["_h2"].to_numpy())
            idx = _index1(h1, n_slots)
            for j in range(len(fp)):
                _insert_with_kicks(table, occ, idx[j], fp[j], n_slots)
            return pd.DataFrame(
                {"bucket": [int(aa["bucket"].iloc[0])], "table": [table.tobytes()],
                 "n_slots": [n_slots], "n_keys": [len(aa)]}
            )
        row = filt.iloc[0]
        if len(aa) == 0:
            return filt
        n_slots = int(row["n_slots"])
        table = np.frombuffer(row["table"], dtype=np.uint16).reshape(n_slots, SLOT_WIDTH).copy()
        occ = (table != 0).sum(axis=1).astype(np.int64)
        # compact each slot-row left so occ indexes the first free slot
        order = np.argsort(table == 0, axis=1, kind="stable")
        table = np.take_along_axis(table, order, axis=1)
        aa = aa.drop_duplicates(subset=["_h1", "_h2"])
        h1 = aa["_h1"].to_numpy()
        fp = _fingerprints(aa["_h2"].to_numpy())
        idx = _index1(h1, n_slots)
        for j in range(len(fp)):
            _insert_with_kicks(table, occ, idx[j], fp[j], n_slots)
        return pd.DataFrame(
            {"bucket": [int(row["bucket"])], "table": [table.tobytes()],
             "n_slots": [n_slots], "n_keys": [int(row["n_keys"]) + len(fp)]}
        )

    out = (
        cuckoo.groupBy("bucket")
        .cogroup(adds.groupBy("bucket"))
        .applyInPandas(_apply, schema=CUCKOO_SCHEMA)
    )
    return out.localCheckpoint(eager=True)


def _membership(table: np.ndarray, n_slots: int, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized lookup: fp present in slot-row i1 or i2."""
    fp = _fingerprints(h2)
    i1 = _index1(h1, n_slots)
    i2 = _alt_index(i1, fp, n_slots)
    hit1 = (table[i1] == fp[:, None]).any(axis=1)
    hit2 = (table[i2] == fp[:, None]).any(axis=1)
    return hit1 | hit2


def delete_cuckoo(cuckoo: DataFrame, deletions: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Evict keys from the filter (the capability blooms lack).

    Safe ONLY for keys that were actually inserted (standard cuckoo-
    filter contract — evicting a never-inserted key could strip another
    key's only fingerprint copy and manufacture a false negative);
    recrawl eviction satisfies this because evicted ⊆ seen. Each
    bucket's table is rewritten once via a cogroup on the bucket id;
    buckets with no deletions pass through untouched."""
    dels = deletions.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull())
    dels = _with_hashes(dels, "k", n_buckets).select(
        F.col("_bkt").alias("bucket"), "_h1", "_h2"
    )

    def _apply(filt: pd.DataFrame, dd: pd.DataFrame) -> pd.DataFrame:
        if len(filt) == 0:  # deletions for an absent bucket: no-op
            return pd.DataFrame({c: [] for c in ["bucket", "table", "n_slots", "n_keys"]})
        row = filt.iloc[0]
        if len(dd) == 0:
            return filt
        n_slots = int(row["n_slots"])
        table = np.frombuffer(row["table"], dtype=np.uint16).reshape(n_slots, SLOT_WIDTH).copy()
        dd = dd.drop_duplicates(subset=["_h1", "_h2"])
        fp = _fingerprints(dd["_h2"].to_numpy())
        i1 = _index1(dd["_h1"].to_numpy(), n_slots)
        i2 = _alt_index(i1, fp, n_slots)
        removed = 0
        for a, b, f in zip(i1, i2, fp):  # deletions are the small slice
            for idx in (a, b):
                hits = np.flatnonzero(table[idx] == f)
                if len(hits):
                    table[idx, hits[0]] = 0
                    removed += 1
                    break
        return pd.DataFrame(
            {
                "bucket": [int(row["bucket"])],
                "table": [table.tobytes()],
                "n_slots": [n_slots],
                "n_keys": [int(row["n_keys"]) - removed],
            }
        )

    out = (
        cuckoo.groupBy("bucket")
        .cogroup(dels.groupBy("bucket"))
        .applyInPandas(_apply, schema=CUCKOO_SCHEMA)
    )
    return out.localCheckpoint(eager=True)


def prepare_cuckoo_broadcast(cuckoo: DataFrame):
    """Collect the tables once and ship as an explicit broadcast —
    same long-lived-driver-loop contract as prepare_bloom_broadcast."""
    spark = cuckoo.sparkSession
    rows = cuckoo.collect()
    return spark.sparkContext.broadcast(
        {int(r.bucket): (bytes(r.table), int(r.n_slots)) for r in rows}
    )


def probe_cuckoo(
    candidates: DataFrame,
    cuckoo: DataFrame,
    key_col: str,
    n_buckets: int,
    strategy: str = "auto",
    broadcast_max_bytes: int = 256 * 1024 * 1024,
    cuckoo_bc=None,
) -> DataFrame:
    """Append `maybe_seen`. strategy mirrors probe_bloom: 'broadcast'
    ships tables once and probes in a narrow vectorized UDF over the
    JVM hash columns (zero shuffle); 'cogroup' is the 10^10 path where
    the tables exceed broadcast size and each candidate group meets its
    bucket's table once per group."""
    if strategy == "auto":
        stats = cuckoo.select(
            F.count("*").alias("b"), F.max("n_slots").alias("s")
        ).collect()[0]
        total = (stats.b or 0) * (stats.s or 0) * SLOT_WIDTH * 2
        strategy = "broadcast" if total <= broadcast_max_bytes else "cogroup"
    if strategy == "broadcast":
        bc = cuckoo_bc if cuckoo_bc is not None else prepare_cuckoo_broadcast(cuckoo)

        @F.pandas_udf(T.BooleanType())
        def _test(bkt: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:  # pragma: no cover
            tables = bc.value
            bkts = bkt.to_numpy()
            h1n = h1.to_numpy()
            h2n = h2.to_numpy()
            out = np.zeros(len(bkts), dtype=bool)
            for b in np.unique(bkts):
                entry = tables.get(int(b))
                if entry is None:
                    continue
                tbl_bytes, n_slots = entry
                table = np.frombuffer(tbl_bytes, dtype=np.uint16).reshape(n_slots, SLOT_WIDTH)
                m = bkts == b
                out[m] = _membership(table, n_slots, h1n[m], h2n[m])
            return pd.Series(out)

        c = _with_hashes(candidates, key_col, n_buckets)
        return c.withColumn(
            "maybe_seen", _test(F.col("_bkt"), F.col("_h1"), F.col("_h2"))
        ).drop("_bkt", "_h1", "_h2")

    base_cols = candidates.columns
    c = _with_hashes(candidates, key_col, n_buckets)
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def _probe(cand: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        out = cand[base_cols].copy()
        if len(filt) == 0:
            out["maybe_seen"] = False
            return out
        n_slots = int(filt["n_slots"].iloc[0])
        table = np.frombuffer(filt["table"].iloc[0], dtype=np.uint16).reshape(n_slots, SLOT_WIDTH)
        out["maybe_seen"] = _membership(
            table, n_slots, cand["_h1"].to_numpy(), cand["_h2"].to_numpy()
        )
        return out

    return (
        c.groupBy("_bkt")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(_probe, schema=out_schema)
    )


def unseen_cuckoo_exact(
    frontier: DataFrame,
    seen: DataFrame,
    cuckoo: DataFrame,
    key_col: str,
    n_buckets: int,
    strategy: str = "auto",
    materialize: bool = True,
    cuckoo_bc=None,
) -> DataFrame:
    """Cuckoo prefilter + exact rescue on the maybe-seen slice; equals
    unseen_exact(frontier, seen) by construction. `seen` must be the
    CURRENT authoritative set (i.e. after any delete_cuckoo evictions
    have also been applied to it)."""
    probed = probe_cuckoo(
        frontier, cuckoo, key_col, n_buckets, strategy=strategy, cuckoo_bc=cuckoo_bc
    )
    clean = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = unseen_exact(suspect, seen, key_col)
    out = clean.unionByName(rescued)
    if materialize:
        out = out.localCheckpoint(eager=True)
    return out
