"""Distributed covariance + first principal component of the
embedding cloud — the "whitening" statistics an embedding-based
pipeline wants before ANN indexing (centering/decorrelating improves
hyperplane-LSH and IVF cell balance) and the standard diagnostic for
anisotropic ("cone-shaped") embedding spaces.

Two-phase shape, each phase where it belongs:
- the O(n·d²) covariance accumulation is DISTRIBUTED: one explode to
  (vec, i, x_i) rows, a self-join on vec_id to form component pairs,
  and a groupBy(i, j) with map-side partial SUMs — the shuffle carries
  only d² rows no matter the corpus size (d=64 → 4096 rows from any
  number of vectors).
- the O(d²) power iteration runs on the DRIVER over the collected d×d
  matrix: iterating a 4096-entry matrix through Spark jobs would be
  pure overhead (the host_hits precedent: driver-held scale factors,
  distributed heavy phase).

Integer discipline (cross-engine exact): components are rounded once
to integer milli-units; covariance uses the sums identity
n·Σxy − Σx·Σy normalized by truncating-division by n² (DuckDB's `//`
TRUNCATES toward zero on negatives — the driver loop uses the same
truncation, NOT Python's flooring //); each power-iteration step
renormalizes to L∞ = 1000 with the same truncating division, and the
final sign is fixed so the largest-|v| component (min index on ties)
is positive. Every step is integer → the DuckDB twin replays the
whole pipeline bit-for-bit.

Overflow headroom: |x_milli| ≤ ~2·10³, so n·Σxy ≤ n²·4·10⁶ stays
under 2⁶³ for n up to ~10⁹ vectors per aggregation; covariance
entries are ≤ ~4·10⁶ after the n² normalization and the mat-vec sum
is ≤ d·4·10⁶·10³ ≈ 2.6·10¹¹.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PC_SCALE = 1000  # L-infinity norm of the iterated vector (milli-units)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (matches DuckDB's `//` and Spark's
    `div`, NOT Python's flooring `//`)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def embedding_covariance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Biased covariance matrix of the embedding set in integer
    milli² units: (i, j, cov) for all d² component pairs, where
    cov = (n·Σ x_i x_j − Σ x_i · Σ x_j) div n² over milli-rounded
    components. One explode + one self-join on vec_id + one d²-row
    aggregate."""
    comps = df.select(
        F.col(id_col).alias("_vid"),
        F.posexplode(F.col(vec_col)).alias("i", "_x"),
    ).select(
        "_vid", "i", F.round(F.col("_x").cast("double") * PC_SCALE).cast("long").alias("x")
    )
    n = df.count()
    a = comps.select("_vid", F.col("i"), F.col("x").alias("xi"))
    b = comps.select("_vid", F.col("i").alias("j"), F.col("x").alias("xj"))
    return (
        a.join(b, on="_vid")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xi") * F.col("xj")).cast("long").alias("_sxy"),
            F.sum("xi").cast("long").alias("_sx"),
            F.sum("xj").cast("long").alias("_sy"),
        )
        .select(
            "i",
            "j",
            F.expr(
                f"CAST((CAST({n} AS BIGINT) * _sxy - _sx * _sy)"
                f" div (CAST({n} AS BIGINT) * CAST({n} AS BIGINT)) AS BIGINT)"
            ).alias("cov"),
        )
    )


def embedding_pca(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
) -> DataFrame:
    """First principal component by fixed-point power iteration over
    the distributed covariance. Returns one row per dimension:
    (dim_i, var_milli2, pc1_milli) — the diagonal variance and the
    PC1 direction at L∞ = 1000."""
    cov_rows = embedding_covariance(df, id_col=id_col, vec_col=vec_col).collect()
    d = 1 + max(r["i"] for r in cov_rows)
    C = {(r["i"], r["j"]): int(r["cov"]) for r in cov_rows}
    v = [PC_SCALE] * d
    for _ in range(n_iter):
        w = [sum(C.get((i, j), 0) * v[j] for j in range(d)) for i in range(d)]
        m = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * PC_SCALE, m) for x in w]
    # deterministic sign: largest-|v| component (min index on ties) > 0
    m = max(abs(x) for x in v)
    lead = min(i for i in range(d) if abs(v[i]) == m)
    if v[lead] < 0:
        v = [-x for x in v]
    spark = df.sparkSession
    out = [(i, C.get((i, i), 0), v[i]) for i in range(d)]
    return spark.createDataFrame(
        out, "dim_i int, var_milli2 bigint, pc1_milli bigint"
    )
