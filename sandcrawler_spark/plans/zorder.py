"""Z-order (Morton-curve) data layout: cluster a table on TWO (or
more) dimensions at once so range predicates on ANY of them prune at
the file level. The crawl's recurring case: captures queried sometimes
by (host-hash range) and sometimes by (timestamp range) — a layout
sorted on one dimension scatters the other across every file; the
Morton interleave keeps both locally clustered (the same trick
Iceberg/Delta expose as `zorder by`; here built from first
principles: a Catalyst bit-interleave expression + range-partitioned
write + a per-file min/max manifest consulted before the scan).

Everything is engine-native: the z-value is a pure Catalyst
expression (shifts and masks, codegen'd), the layout is
`repartitionByRange(zvalue)` + sortWithinPartitions (Spark's
distributed sort), and pruning is a manifest anti-filter — files
whose [min, max] boxes miss the query box are never opened.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution: 2 dims x 16 bits = 32-bit z-value


def zvalue_n_col(cols: list[Column], bits: int | None = None) -> Column:
    """Morton interleave of k ALREADY-NORMALIZED non-negative ints
    (caller maps each dimension into [0, 2^bits) — rank, bucket, or
    scaled value). Bit i of dimension j lands at z-bit i*k + (k-1-j),
    so dims earlier in the list take the more significant bit of each
    group (for k=2 this is exactly the classic a-odd/b-even layout).
    bits defaults to 62 // k, the max that keeps the z-value in a
    signed long."""
    k = len(cols)
    if bits is None:
        bits = 62 // k
    assert k * bits <= 62, "z-value would overflow a signed long"
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + (k - 1 - j))
    return z


def zvalue_col(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """2-dim Morton interleave (bit i of `a` at z-bit 2i+1, of `b`
    at 2i) — the k=2 case of zvalue_n_col."""
    return zvalue_n_col([a, b], bits)


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """Write df z-ordered on (dim_a, dim_b) as ~n_files parquet files
    plus a `_zmanifest` parquet of per-file min/max boxes for both
    dimensions. Dims must be non-negative ints < 2^bits."""
    z = zvalue_col(F.col(dim_a), F.col(dim_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "data"))
    )
    spark = df.sparkSession
    data = spark.read.parquet(os.path.join(path, "data"))
    manifest = (
        data.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(dim_a).alias("min_a"), F.max(dim_a).alias("max_a"),
            F.min(dim_b).alias("min_b"), F.max(dim_b).alias("max_b"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_zmanifest")
    )


def pruned_files(
    spark: SparkSession,
    path: str,
    a_range: tuple[int, int] | None = None,
    b_range: tuple[int, int] | None = None,
) -> list[str]:
    """Files whose min/max box intersects the query box."""
    m = spark.read.parquet(os.path.join(path, "_zmanifest"))
    if a_range is not None:
        m = m.filter((F.col("max_a") >= a_range[0]) & (F.col("min_a") <= a_range[1]))
    if b_range is not None:
        m = m.filter((F.col("max_b") >= b_range[0]) & (F.col("min_b") <= b_range[1]))
    return [r.file for r in m.select("file").collect()]


def pruned_read(
    spark: SparkSession,
    path: str,
    a_range: tuple[int, int] | None = None,
    b_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Manifest-pruned scan: open only intersecting files (the
    residual predicate still applies downstream — the manifest prunes,
    it does not filter rows). Returns an empty DataFrame with the
    right schema when nothing intersects."""
    files = pruned_files(spark, path, a_range, b_range)
    full = spark.read.parquet(os.path.join(path, "data"))
    if not files:
        return full.limit(0)
    return spark.read.schema(full.schema).parquet(*files)


# ---------------------------------------------------------------------------
# n-dimensional variant (r4): (host-bucket, time, depth, ...) at once
# ---------------------------------------------------------------------------

def write_zordered_nd(
    df: DataFrame,
    path: str,
    dims: list[str],
    n_files: int = 16,
    bits: int | None = None,
) -> None:
    """Write df z-ordered on k dimensions, with a per-file min/max box
    manifest over ALL of them (columns min_<dim>/max_<dim>). Dims must
    be non-negative ints < 2^bits (default bits = 62 // k)."""
    z = zvalue_n_col([F.col(d) for d in dims], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "data"))
    )
    spark = df.sparkSession
    data = spark.read.parquet(os.path.join(path, "data"))
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    manifest = data.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_zmanifest")
    )


def pruned_files_nd(
    spark: SparkSession, path: str, ranges: dict[str, tuple[int, int]]
) -> list[str]:
    """Files whose min/max box intersects the query box on every
    constrained dimension (unconstrained dims don't prune)."""
    m = spark.read.parquet(os.path.join(path, "_zmanifest"))
    for d, (lo, hi) in ranges.items():
        m = m.filter((F.col(f"max_{d}") >= lo) & (F.col(f"min_{d}") <= hi))
    return [r.file for r in m.select("file").collect()]


def pruned_read_nd(
    spark: SparkSession, path: str, ranges: dict[str, tuple[int, int]]
) -> DataFrame:
    """Manifest-pruned scan over an n-dim z-ordered table."""
    files = pruned_files_nd(spark, path, ranges)
    full = spark.read.parquet(os.path.join(path, "data"))
    if not files:
        return full.limit(0)
    return spark.read.schema(full.schema).parquet(*files)
