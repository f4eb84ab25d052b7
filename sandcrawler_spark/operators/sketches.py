"""Deterministic cardinality sketches (HyperLogLog) with
cross-engine-replayable arithmetic.

Why not `approx_count_distinct`: Spark's HLL++ and DuckDB's HLL use
different hash functions and bias tables, so their estimates can never
be compared value-for-value — useless under this repo's oracle gate,
and just as useless in production when two engines must agree on a
sketch (e.g. a crawl coordinator merging per-shard host stats computed
by different systems). This module pins every step to md5-derived
integer arithmetic both engines share (Flajolet et al., "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm",
AofA 2007):

  h       = first 15 hex chars of md5(key) as int64    (60 bits —
            positive in a signed 64 everywhere, so no ANSI overflow /
            unsigned-negation edge cases in either engine; md5 is
            byte-identical everywhere, same trick as the simhash twin)
  bucket  = h mod m                    (m = 2^p registers)
  w       = h div m  (50 significant bits remain for p = 10)
  rho     = trailing_zeros(w) + 1      = bit_count((w & -w) - 1) + 1,
            capped at RHO_CAP; rho(0) = RHO_CAP. Trailing zeros of a
            uniform word are geometric(1/2) exactly like the classic
            leading-rank, and — unlike leading zeros — they reduce to
            the two primitives every engine has: AND-negate and
            bit_count.
  M_j     = max rho per bucket         (integer registers)
  S       = Σ_j 2^(RHO_CAP - M_j)      (EXACT integer; empty bucket
            contributes 2^RHO_CAP). With m=1024 and RHO_CAP=40,
            S <= 2^50 — no overflow, no float-summation order issues.
  E       = alpha_m * m^2 * 2^RHO_CAP / S  — a single double division
            by an exact integer: bit-identical in any IEEE-754 engine.

No small-range linear-counting correction on purpose: it needs ln(),
whose last-ulp behavior differs across libm builds — the raw estimator
is documented as biased below ~2.5m and the tests pin the accuracy
envelope instead. The whole pipeline is Catalyst expressions (codegen,
no Python, map-side partial max-agg); the per-group state is m=2^p
integers regardless of cardinality, which is the entire point at
10^10 URLs: per-host distinct counts in one shuffle of bounded-size
partial aggregates instead of a distinct-shuffle of the URLs
themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RHO_CAP = 40


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_hash(key: Column) -> Column:
    """Positive int64 from the first 15 hex chars of md5(key)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hll_register_cols(key: Column, p: int = 10) -> tuple[Column, Column]:
    """(bucket, rho) Catalyst columns for one key."""
    m = 1 << p
    h = hll_hash(key)
    bucket = F.pmod(h, F.lit(m))
    w = F.shiftrightunsigned(h, p)  # h >= 0, so this is h div 2^p
    lowbit = w.bitwiseAND(w * F.lit(-1))
    rho = F.when(w == 0, F.lit(RHO_CAP)).otherwise(
        F.least(F.bit_count(lowbit - F.lit(1)) + F.lit(1), F.lit(RHO_CAP))
    )
    return bucket, rho


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Per-group HLL distinct estimate of key_col.

    Output: group_cols + (hll_registers_used, hll_estimate). Two
    map-side-combinable aggregations: max(rho) per (group, bucket),
    then the exact-integer harmonic sum per group. The estimate is a
    double rounded to 2 decimals (one IEEE division — stable), the
    register count is exact."""
    m = 1 << p
    group_cols = group_cols or []
    bucket, rho = hll_register_cols(F.col(key_col), p)
    regs = (
        df.select(*group_cols, bucket.alias("_bkt"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bkt")
        .agg(F.max("_rho").alias("_m"))
    )
    # exact integer S: present buckets contribute 2^(CAP-M), the
    # (m - used) empty buckets contribute 2^CAP each
    # shiftleft's python wrapper wants a literal bit count; the SQL
    # expression form accepts a column
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - _m AS INT))")
    est_const = _alpha(m) * m * m * float(1 << RHO_CAP)
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("hll_registers_used"),
        F.sum(pow2).alias("_s_used"),
    )
    s_total = F.col("_s_used") + (F.lit(m) - F.col("hll_registers_used")) * F.lit(
        float(1 << RHO_CAP)
    ).cast("long")
    return agg.select(
        *group_cols,
        F.col("hll_registers_used"),
        F.round(F.lit(est_const) / s_total, 2).alias("hll_estimate"),
    )


def hll_partials(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Mergeable register table: group_cols + (bkt, mreg). The
    persistable form of the sketch — one crawl round/snapshot each
    writes its partials (<= 2^p rows per group), and any subset of
    rounds can later be combined with hll_merge_estimate without
    touching the raw keys again (max is idempotent/commutative, so
    merge(shards) == sketch(union) exactly)."""
    group_cols = group_cols or []
    bucket, rho = hll_register_cols(F.col(key_col), p)
    return (
        df.select(*group_cols, bucket.alias("bkt"), rho.alias("_rho"))
        .groupBy(*group_cols, "bkt")
        .agg(F.max("_rho").alias("mreg"))
    )


def hll_merge_estimate(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Combine register tables (possibly a union of many rounds'
    partials) into per-group estimates — same output contract as
    hll_cardinality."""
    m = 1 << p
    group_cols = group_cols or []
    regs = partials.groupBy(*group_cols, "bkt").agg(F.max("mreg").alias("_m"))
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - _m AS INT))")
    est_const = _alpha(m) * m * m * float(1 << RHO_CAP)
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("hll_registers_used"),
        F.sum(pow2).alias("_s_used"),
    )
    s_total = F.col("_s_used") + (F.lit(m) - F.col("hll_registers_used")) * F.lit(
        float(1 << RHO_CAP)
    ).cast("long")
    return agg.select(
        *group_cols,
        F.col("hll_registers_used"),
        F.round(F.lit(est_const) / s_total, 2).alias("hll_estimate"),
    )


def hll_oracle_sql(
    source_sql: str,
    key_expr: str,
    group_exprs: list[str],
    p: int = 10,
) -> str:
    """The DuckDB twin of hll_cardinality: identical arithmetic in
    ANSI-ish SQL (md5 hex -> UBIGINT, trailing-zero rank via
    bit_count, exact integer harmonic sum, one final division)."""
    m = 1 << p
    est_const = repr(_alpha(m) * m * m * float(1 << RHO_CAP))
    gsel = ", ".join(group_exprs)
    gpre = f"{gsel}, " if gsel else ""
    gby = f"GROUP BY {gsel}" if gsel else ""
    return f"""
WITH _hll_keys AS (
  SELECT {gpre}CAST('0x' || substr(md5({key_expr}), 1, 15) AS BIGINT) AS h
  FROM ({source_sql})
),
_hll_regs AS (
  SELECT {gpre}h % {m} AS bkt,
         MAX(CASE WHEN h // {m} = 0 THEN {RHO_CAP}
              ELSE LEAST(bit_count(((h // {m}) & (-(h // {m}))) - 1) + 1, {RHO_CAP})
         END) AS mreg
  FROM _hll_keys
  GROUP BY {gpre}h % {m}
)
SELECT {gpre}
       CAST(COUNT(*) AS BIGINT) AS hll_registers_used,
       ROUND({est_const} / (SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - mreg))
             + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {RHO_CAP})), 2)
         AS hll_estimate
FROM _hll_regs
{gby}
""".strip()


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005): engine-portable
# frequency estimation. Linear sketch: counters of two CMSes over
# disjoint data ADD, so per-partition / per-snapshot sketches merge by
# summing (row, col) cells — bounded state (d*w counters) for per-host
# fetch-frequency tracking across crawl rounds where the exact keyed
# count would mean re-shuffling the full URL stream every round.
# ---------------------------------------------------------------------------

CMS_W = 1024
CMS_D = 4


def _cms_col(key: Column, row: int, w: int) -> Column:
    """Row-salted md5 column index — same 15-hex-chars-to-int64
    primitive as the HLL, so the DuckDB twin replays it verbatim."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), key)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w))


def cms_build(
    df: DataFrame,
    key_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, col, cnt) sketch cells. One scan: the d row-hashes explode
    from an inline array, then ONE shuffle on (row, col) with map-side
    partial sums — d*w cells total regardless of key cardinality."""
    wgt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"), _cms_col(F.col(key_col), i, w).alias("col")
                )
                for i in range(d)
            ])
        ).alias("rc"),
        wgt.alias("_w"),
    )
    return (
        cells.select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum cell-wise — CMS is a linear sketch."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    key_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Point estimates for the probe keys: min over the d row cells.
    Guarantees: estimate >= true count always; overshoot <= 2N/w with
    prob >= 1 - 2^-d. The sketch is d*w rows — broadcast side; probes
    stream through narrowly."""
    pk = probes.select(F.col(key_col).alias("_k")).distinct()
    probed = pk.select(
        "_k",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("row"), _cms_col(F.col("_k"), i, w).alias("col"))
                for i in range(d)
            ])
        ).alias("rc"),
    ).select("_k", F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    est = (
        probed.join(F.broadcast(cms), on=["row", "col"], how="left")
        .groupBy("_k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_estimate"))
    )
    return est.select(F.col("_k").alias(key_col), "cms_estimate")


def cms_oracle_sql(
    source_sql: str,
    key_expr: str,
    probe_sql: str,
    probe_key: str = "k",
    w: int = CMS_W,
    d: int = CMS_D,
) -> str:
    """DuckDB twin: same row-salted hashes, same (row,col) cells, same
    min-over-rows estimate. source_sql yields the key stream (one row
    per occurrence); probe_sql yields distinct probe keys as column
    `probe_key`."""
    row_sel = " UNION ALL ".join(
        f"SELECT {i} AS row, CAST('0x' || substr(md5('cms{i}:' || k), 1, 15) AS BIGINT) % {w} AS col, k FROM _cms_src"
        for i in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {probe_key} AS pk, {i} AS row, CAST('0x' || substr(md5('cms{i}:' || {probe_key}), 1, 15) AS BIGINT) % {w} AS col FROM _cms_probes"
        for i in range(d)
    )
    return f"""
WITH _cms_src AS (SELECT {key_expr} AS k FROM ({source_sql})),
_cms_cells AS (
  SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({row_sel}) GROUP BY row, col
),
_cms_probes AS (SELECT DISTINCT {probe_key} FROM ({probe_sql})),
_cms_lookups AS ({probe_rows})
SELECT l.pk AS {probe_key},
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_estimate
FROM _cms_lookups l LEFT JOIN _cms_cells c ON l.row = c.row AND l.col = c.col
GROUP BY l.pk
""".strip()


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float = 0.01,
    w: int = CMS_W,
    d: int = CMS_D,
    cms: DataFrame | None = None,
) -> DataFrame:
    """Approximate phi-heavy-hitters: keys whose CMS estimate is at
    least phi * N (N = stream length). Guarantees inherited from the
    sketch: every TRUE heavy hitter (freq >= phi*N) is returned (the
    estimate never undercounts); false positives are limited to keys
    within eps*N of the threshold. The candidate set is the DISTINCT
    key set — deterministic under any partitioning (per-partition
    top-m candidate schemes are not), and cheaper than the exact
    groupBy count when the sketch is reused across rounds (pass a
    merged `cms` from cms_merge and only the distinct-key scan
    remains). Returns (key_col, cms_estimate) for qualifying keys."""
    built = cms if cms is not None else cms_build(df, key_col, w, d)
    n = df.count()
    thresh = int(phi * n)
    est = cms_estimate(df.select(key_col).distinct(), built, key_col, w, d)
    return est.filter(F.col("cms_estimate") >= F.lit(thresh))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------

def kmv_bottomk(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group k smallest 60-bit md5 hashes of the DISTINCT keys —
    the KMV synopsis (Bar-Yossef et al. RANDOM'02; Beyer et al.
    SIGMOD'07). Unlike HLL the kept state is actual hash values, so
    sketches support set operations (intersection size via the
    combined bottom-k) and the estimator needs no bias table — and it
    is exactly mergeable: union two groups' rows and re-take the
    bottom-k.

    Scale shape: one distinct on (group, h), then the knn_join
    two-level bottom-k — level 1 ranks within (group, scan partition)
    so no task ever holds more than one partition's rows of a hot
    group, level 2 reduces the surviving k*P rows per group. A plain
    Window.partitionBy(group) would put a celebrity host's entire URL
    set in one task (the VERDICT r3 skew anti-pattern).

    Returns (group_cols..., h) — at most k rows per group.
    """
    from pyspark.sql import Window

    hashed = (
        df.select(*group_cols, hll_hash(F.col(key_col)).alias("h"))
        .distinct()
        .withColumn("_part", F.spark_partition_id())
    )
    w1 = Window.partitionBy(*group_cols, "_part").orderBy(F.asc("h"))
    partial = (
        hashed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_part")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    return (
        partial.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# 2^60 as an exact double: both engines cast the same BIGINT literal.
_KMV_SPACE = float(1 << 60)


def kmv_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV synopsis:
    est = (k-1) * 2^60 / h_(k) (the unbiased KMV estimator on the
    [0, 2^60) hash space), computed as one correctly-rounded double
    multiply + divide then floor() — bit-identical in any IEEE-754
    engine, so the DuckDB twin replays it exactly (no round()
    half-tie exposure). Groups with fewer than k distinct keys report
    their EXACT count (the synopsis holds every hash).

    Returns (group_cols..., n_kept, kth_hash, est_distinct).
    """
    bk = kmv_bottomk(df, key_col, group_cols, k)
    agg = bk.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("kth_hash").cast("double")
        )
    )
    return agg.withColumn("est_distinct", est.cast("long"))


def kmv_merge_estimate(
    partials: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Merge per-shard KMV synopses (rows of (group..., h) as produced
    by kmv_bottomk on each shard): distinct-union the kept hashes,
    re-take the bottom-k, re-apply the estimator. Merge-then-estimate
    equals estimate-on-the-union exactly — the property that lets a
    crawl coordinator keep per-(shard, host) sketches and roll them up
    without rescanning URLs (tests assert equality)."""
    from pyspark.sql import Window

    deduped = partials.select(*group_cols, "h").distinct()
    w2 = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    bk = (
        deduped.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    agg = bk.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("kth_hash").cast("double")
        )
    )
    return agg.withColumn("est_distinct", est.cast("long"))


def kmv_oracle_sql(
    inner_sql: str,
    key_expr: str,
    group_cols: list[str],
    k: int = 64,
) -> str:
    """DuckDB twin of kmv_cardinality over `inner_sql`."""
    groups = ", ".join(group_cols)
    return f"""
WITH _kmv_base AS ({inner_sql}),
_kmv_h AS (
  SELECT DISTINCT {groups},
         CAST(CAST('0x' || substr(md5({key_expr}), 1, 15) AS UBIGINT) AS BIGINT) AS h
  FROM _kmv_base
),
_kmv_rk AS (
  SELECT {groups}, h,
         row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
  FROM _kmv_h
)
SELECT {groups},
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS BIGINT)
            ELSE CAST(floor(CAST({k - 1} AS DOUBLE)
                            * CAST(1152921504606846976 AS DOUBLE)
                            / CAST(MAX(h) AS DOUBLE)) AS BIGINT) END AS est_distinct
FROM _kmv_rk
WHERE rn <= {k}
GROUP BY {groups}
""".strip()


def kmv_intersection(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group |A ∩ B| estimate from the two sides' KMV synopses —
    the set operation HLL fundamentally cannot do without
    inclusion-exclusion error blowup (Beyer et al. SIGMOD'07 §4): the
    combined bottom-k K of A ∪ B is a uniform sample of the union, so
    est_inter = |{h ∈ K : h ∈ A and h ∈ B}| / k * est_union.

    Determinism: est_union is the already-floored BIGINT estimator,
    and the ratio is applied as (both * est_union) div k — pure
    integer arithmetic after the one IEEE divide inside est_union
    (overflow-safe while both * est_union < 2^63, i.e. real-world
    cardinalities). Groups where the combined synopsis holds the whole
    union (n_kept < k) report EXACT union and intersection counts.

    Scale shape: each synopsis is ≤ k rows per group, so the merge
    window ranks at most 2k rows per group — bounded state by
    construction, no skew exposure. Returns (group_cols..., n_union_kept,
    est_union, est_intersection).
    """
    from pyspark.sql import Window

    sa = kmv_bottomk(a, key_col, group_cols, k).withColumn("_m", F.lit(1))
    sb = kmv_bottomk(b, key_col, group_cols, k).withColumn("_m", F.lit(2))
    merged = (
        sa.unionAll(sb)
        .groupBy(*group_cols, "h")
        .agg(F.sum("_m").cast("int").alias("_mask"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    bk = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = bk.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_union_kept"),
        F.max("h").cast("long").alias("_kth"),
        F.sum(F.when(F.col("_mask") == 3, 1).otherwise(0)).cast("long").alias("_both"),
    )
    est_union = F.when(F.col("n_union_kept") < k, F.col("n_union_kept")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("_kth").cast("double")
        ).cast("long")
    )
    out = agg.withColumn("est_union", est_union)
    est_inter = F.when(F.col("n_union_kept") < k, F.col("_both")).otherwise(
        F.expr(f"(_both * est_union) div {k}")
    )
    return out.withColumn("est_intersection", est_inter.cast("long")).drop(
        "_kth", "_both"
    )


def kmv_intersection_oracle_sql(
    a_sql: str,
    b_sql: str,
    key_expr: str,
    group_cols: list[str],
    k: int = 64,
) -> str:
    """DuckDB twin of kmv_intersection over two (group..., key)
    relations."""
    groups = ", ".join(group_cols)
    return f"""
WITH _ka_base AS ({a_sql}),
_kb_base AS ({b_sql}),
_ka_h AS (
  SELECT DISTINCT {groups},
         CAST(CAST('0x' || substr(md5({key_expr}), 1, 15) AS UBIGINT) AS BIGINT) AS h
  FROM _ka_base
),
_kb_h AS (
  SELECT DISTINCT {groups},
         CAST(CAST('0x' || substr(md5({key_expr}), 1, 15) AS UBIGINT) AS BIGINT) AS h
  FROM _kb_base
),
_ka_bk AS (
  SELECT * FROM (SELECT {groups}, h,
                        row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
                 FROM _ka_h) WHERE rn <= {k}
),
_kb_bk AS (
  SELECT * FROM (SELECT {groups}, h,
                        row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
                 FROM _kb_h) WHERE rn <= {k}
),
_kmerged AS (
  SELECT {groups}, h, CAST(SUM(m) AS INT) AS mask
  FROM (SELECT {groups}, h, 1 AS m FROM _ka_bk
        UNION ALL SELECT {groups}, h, 2 AS m FROM _kb_bk)
  GROUP BY {groups}, h
),
_kbk AS (
  SELECT * FROM (SELECT {groups}, h, mask,
                        row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
                 FROM _kmerged) WHERE rn <= {k}
),
_kagg AS (
  SELECT {groups},
         CAST(COUNT(*) AS BIGINT) AS n_union_kept,
         CAST(MAX(h) AS BIGINT) AS kth,
         CAST(SUM(CASE WHEN mask = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM _kbk GROUP BY {groups}
),
_kest AS (
  SELECT {groups}, n_union_kept, n_both,
         CASE WHEN n_union_kept < {k} THEN n_union_kept
              ELSE CAST(floor(CAST({k - 1} AS DOUBLE)
                              * CAST(1152921504606846976 AS DOUBLE)
                              / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_union
  FROM _kagg
)
SELECT {groups}, n_union_kept, est_union,
       CAST(CASE WHEN n_union_kept < {k} THEN n_both
                 ELSE (n_both * est_union) // {k} END AS BIGINT) AS est_intersection
FROM _kest
""".strip()


def capture_recapture(
    df,
    key_col: str = "url",
    mod: int = 10,
    keep: int = 3,
):
    """Capture-recapture (Chapman-corrected Lincoln-Petersen) estimate
    of a population size from two independent samples — the classic
    way to estimate the size of a crawl frontier / search-engine index
    you cannot enumerate (Lawrence & Giles, Science 1998 used exactly
    this over engine overlap). Here the two "captures" are
    deterministic md5 marks with different salts: item x is in sample
    A iff md5('a|'||x) mod `mod` < `keep`, sample B likewise with salt
    'b|' — independent uniform marks, fully replayable.

      chapman = ((n1+1)(n2+1)) div (m+1) - 1,  m = |A ∩ B|

    Returns ONE row: (n1, n2, n_both, chapman_est, n_true) — n_true
    (the actual count) ships alongside so the estimate is auditable.

    Scale shape: a single narrow scan + one global aggregate of four
    counters (partial-aggregated map-side); no shuffle beyond the
    1-row final combine. Integer arithmetic end to end.
    """
    mark = lambda salt: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col))), 1, 15), 16, 10)
        .cast("long") % mod < keep
    )
    agg = df.select(
        mark("a|").alias("_a"), mark("b|").alias("_b")
    ).agg(
        F.sum(F.col("_a").cast("long")).cast("long").alias("n1"),
        F.sum(F.col("_b").cast("long")).cast("long").alias("n2"),
        F.sum((F.col("_a") & F.col("_b")).cast("long")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("n_true"),
    )
    return agg.select(
        "n1",
        "n2",
        "n_both",
        F.expr(
            "CAST(((n1 + 1) * (n2 + 1)) div (n_both + 1) - 1 AS BIGINT)"
        ).alias("chapman_est"),
        "n_true",
    )


def hll_sliding_estimate(
    df: DataFrame,
    key_col: str,
    group_col: str,
    bucket_col: str,
    window_buckets: int = 7,
    p: int = 10,
) -> DataFrame:
    """Trailing-window distinct estimate: for every (group, bucket)
    present in the data, the HLL estimate of distinct key_col values
    over buckets [bucket - window_buckets + 1, bucket] — e.g. the
    trailing-7-day distinct-visitor count per host, per day.

    This is the payoff of keeping sketches MERGEABLE (hll_partials):
    the exact answer needs a distinct-shuffle of the raw keys once per
    window position (W scans of the corpus for W window placements);
    the sketch path builds per-(group, bucket) register tables once —
    one shuffle over the raw keys total — then every window position
    is a max-merge of at most `window_buckets` register rows per
    (group, bkt). Register fan-out is window_buckets x, but state is
    already bounded (groups x buckets x 2^p), never key-cardinality.

    bucket_col must be an integer bucket number (e.g. epoch-day =
    floor(unix_seconds / 86400)) so window membership is pure integer
    arithmetic in both engines. Output: (group, bucket,
    hll_registers_used, hll_estimate) with the hll_cardinality
    estimator contract.
    """
    m = 1 << p
    parts = hll_partials(
        df.select(F.col(group_col).alias("_g"), F.col(bucket_col).alias("_b"), key_col),
        key_col,
        ["_g", "_b"],
        p=p,
    )
    # fan each partial out to every window position it participates in
    fan = parts.select(
        "_g",
        F.explode(
            F.sequence(F.col("_b"), F.col("_b") + F.lit(int(window_buckets) - 1))
        ).alias("_wb"),
        "bkt",
        "mreg",
    )
    # keep only window positions anchored at a bucket the group saw
    anchors = parts.select("_g", F.col("_b").alias("_wb")).distinct()
    fan = fan.join(anchors, ["_g", "_wb"], "left_semi")
    est = hll_merge_estimate(fan, ["_g", "_wb"], p=p)
    return est.select(
        F.col("_g").alias(group_col),
        F.col("_wb").alias(bucket_col),
        "hll_registers_used",
        "hll_estimate",
    )


def hll_sliding_oracle_sql(
    source_sql: str,
    key_expr: str,
    group_expr: str,
    bucket_expr: str,
    window_buckets: int = 7,
    p: int = 10,
    out_group: str = "grp",
    out_bucket: str = "bucket",
) -> str:
    """DuckDB twin of hll_sliding_estimate: same register math as
    hll_oracle_sql, window membership replayed as an integer range
    join against the distinct (group, bucket) anchor set. out_group /
    out_bucket must match the Spark query's column names (the driver
    compare sorts columns by name)."""
    m = 1 << p
    est_const = repr(_alpha(m) * m * m * float(1 << RHO_CAP))
    w = int(window_buckets)
    return f"""
WITH _sl_keys AS (
  SELECT {group_expr} AS g, {bucket_expr} AS b,
         CAST('0x' || substr(md5({key_expr}), 1, 15) AS BIGINT) AS h
  FROM ({source_sql})
),
_sl_regs AS (
  SELECT g, b, h % {m} AS bkt,
         MAX(CASE WHEN h // {m} = 0 THEN {RHO_CAP}
              ELSE LEAST(bit_count(((h // {m}) & (-(h // {m}))) - 1) + 1, {RHO_CAP})
         END) AS mreg
  FROM _sl_keys GROUP BY g, b, h % {m}
),
_sl_anchors AS (SELECT DISTINCT g, b FROM _sl_regs),
_sl_win AS (
  SELECT a.g, a.b AS wb, r.bkt, MAX(r.mreg) AS mreg
  FROM _sl_anchors a JOIN _sl_regs r
    ON r.g = a.g AND r.b BETWEEN a.b - {w - 1} AND a.b
  GROUP BY a.g, a.b, r.bkt
)
SELECT g AS {out_group},
       CAST(wb AS BIGINT) AS {out_bucket},
       CAST(COUNT(*) AS BIGINT) AS hll_registers_used,
       ROUND({est_const} / (SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - mreg))
             + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {RHO_CAP})), 2)
         AS hll_estimate
FROM _sl_win
GROUP BY g, wb
""".strip()


def kmv_pairwise_overlap(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    k: int = 64,
) -> DataFrame:
    """All-pairs stratum overlap matrix from ONE pass over the corpus:
    a KMV synopsis per stratum (<= k rows each), then every stratum
    pair (a < b) merges its two synopses into the union bottom-k and
    applies the kmv_intersection estimator — audience overlap between
    crawl snapshots, URL overlap between TLD shards, fingerprint
    contamination between train strata, without |strata| choose 2
    distinct-joins over raw keys.

    Scale shape: the corpus is touched once (the skew-safe two-level
    bottom-k in kmv_bottomk); everything after operates on the
    |strata| * k synopsis table — pair expansion is synopsis x strata
    (tiny x tiny), and the per-pair rank window holds at most 2k rows.
    Exactly like kmv_intersection, pairs whose combined synopsis kept
    the whole union (n_union_kept < k) report EXACT union and
    intersection counts.

    Returns (stratum_a, stratum_b, n_union_kept, est_union,
    est_intersection, jaccard_ppm) for every unordered stratum pair.
    """
    from pyspark.sql import Window

    sk = kmv_bottomk(df, key_col, [stratum_col], k).localCheckpoint(eager=True)
    strata = sk.select(F.col(stratum_col).alias("_s")).distinct()
    pairs = (
        strata.select(F.col("_s").alias("stratum_a"))
        .join(strata.select(F.col("_s").alias("stratum_b")))
        .filter(F.col("stratum_a") < F.col("stratum_b"))
    )
    side_a = pairs.join(
        sk.select(F.col(stratum_col).alias("stratum_a"), "h"), "stratum_a"
    ).select("stratum_a", "stratum_b", "h", F.lit(1).alias("_m"))
    side_b = pairs.join(
        sk.select(F.col(stratum_col).alias("stratum_b"), "h"), "stratum_b"
    ).select("stratum_a", "stratum_b", "h", F.lit(2).alias("_m"))
    merged = (
        side_a.unionAll(side_b)
        .groupBy("stratum_a", "stratum_b", "h")
        .agg(F.sum("_m").cast("int").alias("_mask"))
    )
    w = Window.partitionBy("stratum_a", "stratum_b").orderBy(F.asc("h"))
    bk = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = bk.groupBy("stratum_a", "stratum_b").agg(
        F.count("*").cast("long").alias("n_union_kept"),
        F.max("h").cast("long").alias("_kth"),
        F.sum(F.when(F.col("_mask") == 3, 1).otherwise(0)).cast("long").alias("_both"),
    )
    est_union = F.when(F.col("n_union_kept") < k, F.col("n_union_kept")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("_kth").cast("double")
        ).cast("long")
    )
    out = agg.withColumn("est_union", est_union)
    est_inter = F.when(F.col("n_union_kept") < k, F.col("_both")).otherwise(
        F.expr(f"(_both * est_union) div {k}")
    )
    out = out.withColumn("est_intersection", est_inter.cast("long")).drop("_kth", "_both")
    return out.withColumn(
        "jaccard_ppm",
        F.expr(
            "CASE WHEN est_union = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(est_intersection * CAST(1000000 AS BIGINT) div est_union AS BIGINT) END"
        ),
    )


def kmv_pairwise_oracle_sql(
    source_sql: str,
    key_expr: str,
    stratum_expr: str,
    k: int = 64,
) -> str:
    """DuckDB twin of kmv_pairwise_overlap: same 60-bit md5 hash,
    per-stratum bottom-k, pair merge, and floored estimator."""
    return f"""
WITH _kp_h AS (
  SELECT DISTINCT {stratum_expr} AS s,
         CAST('0x' || substr(md5({key_expr}), 1, 15) AS BIGINT) AS h
  FROM ({source_sql})
),
_kp_sk AS (
  SELECT s, h FROM (
    SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h ASC) AS rn
    FROM _kp_h) WHERE rn <= {k}
),
_kp_pairs AS (
  SELECT a.s AS sa, b.s AS sb
  FROM (SELECT DISTINCT s FROM _kp_sk) a, (SELECT DISTINCT s FROM _kp_sk) b
  WHERE a.s < b.s
),
_kp_m AS (
  SELECT sa, sb, h, SUM(m) AS mask FROM (
    SELECT p.sa, p.sb, x.h, 1 AS m FROM _kp_pairs p JOIN _kp_sk x ON x.s = p.sa
    UNION ALL
    SELECT p.sa, p.sb, x.h, 2 AS m FROM _kp_pairs p JOIN _kp_sk x ON x.s = p.sb)
  GROUP BY sa, sb, h
),
_kp_bk AS (
  SELECT * FROM (
    SELECT sa, sb, h, mask,
           ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h ASC) AS rn
    FROM _kp_m) WHERE rn <= {k}
),
_kp_agg AS (
  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n_union_kept,
         CAST(MAX(h) AS BIGINT) AS kth,
         CAST(SUM(CASE WHEN mask = 3 THEN 1 ELSE 0 END) AS BIGINT) AS nboth
  FROM _kp_bk GROUP BY sa, sb
),
_kp_est AS (
  SELECT sa, sb, n_union_kept,
         CASE WHEN n_union_kept < {k} THEN n_union_kept
              ELSE CAST(floor({float(k - 1)!r} * {_KMV_SPACE!r} / CAST(kth AS DOUBLE)) AS BIGINT)
         END AS est_union,
         nboth
  FROM _kp_agg
)
SELECT sa AS stratum_a, sb AS stratum_b, n_union_kept, est_union,
       CAST(CASE WHEN n_union_kept < {k} THEN nboth
                 ELSE (nboth * est_union) // {k} END AS BIGINT) AS est_intersection,
       CAST(CASE WHEN est_union = 0 THEN 0
                 ELSE (CASE WHEN n_union_kept < {k} THEN nboth
                            ELSE (nboth * est_union) // {k} END * CAST(1000000 AS HUGEINT)) // est_union
            END AS BIGINT) AS jaccard_ppm
FROM _kp_est
""".strip()
