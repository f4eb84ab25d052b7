"""Shuffle-key skew diagnostics + salting prescription.

Every scale cliff this engine guards against — the hot host in
politeness scheduling, the hot band in LSH, the stopword posting list,
the boilerplate gram in span dedupe — is the same disease: one shuffle
key owning a disproportionate share of rows. The cure is also always
the same (split the key across n salts, or broadcast it aside), and
each operator hard-codes its own threshold today
(politeness.py hot_threshold, dedupe.py max_band_size). This operator
is the shared diagnostician: given any keyed relation it measures the
key-frequency distribution and PRESCRIBES the per-key salt count the
other operators consume, so the "would this survive 100x?" question
has a queryable answer instead of a per-operator constant.

Method: per-key counts (one groupBy — the same shuffle the consumer
would run, so measuring costs what one round of the real job costs),
then the p95 key count as the reference load (exact order statistic
by position, integer, engine-portable — NOT an interpolated
percentile, which differs between engines), then for each key with
count > skew_factor x p95:

    n_salts = ceil(count / p95)  capped at salt_cap

i.e. split the hot key into chunks that look like a p95 key. The
output is the hot-key table the consumer broadcast-joins back onto
its data (hot keys are few by definition — that join is free).

Scale shape: ONE groupBy over the data + tiny order-statistic work
over the per-key table (one row per key, not per input row) + a
broadcast back. The per-key table sort uses orderBy+offset+limit (a
TakeOrdered, not a single-task window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_counts(df: DataFrame, key_col: str) -> DataFrame:
    return df.groupBy(key_col).agg(F.count("*").cast("long").alias("n_rows"))


def order_statistic(counts: DataFrame, q_permille: int) -> int:
    """Exact order statistic of n_rows at quantile q (permille), by
    position: the ceil(q*n)-th smallest count. Integer-exact and
    identical in any engine; returns 1 for an empty relation."""
    n = counts.count()
    if n == 0:
        return 1
    # integer ceil — float division misrounds at large n
    k = max(1, (q_permille * n + 999) // 1000)
    row = counts.orderBy(F.col("n_rows").asc(), F.col(counts.columns[0]).asc()).offset(k - 1).limit(1).collect()
    return int(row[0]["n_rows"])


def skew_advisor(
    df: DataFrame,
    key_col: str,
    q_permille: int = 950,
    skew_factor: int = 4,
    salt_cap: int = 64,
) -> DataFrame:
    """Hot-key prescription table: (key, n_rows, ref_rows,
    ratio_centi, n_salts) for every key whose count exceeds
    skew_factor x the q-th order statistic (the "reference load").
    ratio_centi is the skew ratio in integer centi-units (no float
    crossing); n_salts = ceil(n_rows / ref) capped at salt_cap."""
    counts = key_counts(df, key_col)
    p95 = order_statistic(counts, q_permille)
    hot = counts.filter(F.col("n_rows") > F.lit(skew_factor * p95))
    # integral div/ceil only — no double crossing between engines
    return hot.select(
        F.col(key_col),
        "n_rows",
        F.lit(p95).cast("long").alias("ref_rows"),
        F.expr(f"(n_rows * 100) div {p95}").cast("long").alias("ratio_centi"),
        F.least(
            F.expr(f"(n_rows + {p95 - 1}) div {p95}").cast("int"), F.lit(salt_cap)
        ).alias("n_salts"),
    )


def apply_salts(df: DataFrame, key_col: str, advice: DataFrame) -> DataFrame:
    """Attach a salted shuffle key per the advisor's prescription:
    salted_key = key || '#' || (md5-derived salt in [0, n_salts)) for
    hot keys, key itself otherwise. Deterministic (salt from the row's
    own content hash, not rand()) so retries and resumes are stable.
    advice is tiny — broadcast."""
    joined = df.join(F.broadcast(advice.select(key_col, "n_salts")), key_col, "left")
    salt = F.pmod(
        F.ascii(F.substring(F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in df.columns])), 1, 1))
        * 256
        + F.ascii(F.substring(F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in df.columns])), 2, 1)),
        F.col("n_salts"),
    )
    return joined.withColumn(
        "salted_key",
        F.when(
            F.col("n_salts").isNotNull(),
            F.concat(F.col(key_col).cast("string"), F.lit("#"), salt.cast("string")),
        ).otherwise(F.col(key_col).cast("string")),
    ).drop("n_salts")
