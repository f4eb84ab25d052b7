"""Deterministic corpus sampling / mixing for pretraining pipelines.

A 100 TB corpus is never trained on uniformly: each stratum (language,
source, quality band) gets a target share, and the sampler must be
DETERMINISTIC so reruns, resumes, and multi-team reproductions pick
the identical subset — no rand(), no seed-per-partition Monte Carlo.
The keep decision is a pure function of (seed, doc id): the first 8
hex chars of md5(seed || ':' || id) as a uniform u in [0,1), kept iff
u < rate. md5 (not xxhash64) so the DuckDB oracle in
__spark_entry__.oracle_sql() ("corpus_sample") replays every decision.

Scale shape: rates come from one small per-stratum aggregate (a few
hundred rows — languages × sources), broadcast back onto the corpus;
the corpus itself is touched by exactly one map-side pass (hash +
compare), no extra shuffle, no sort, no sample() nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample_rates(
    df: DataFrame, key_col: str, target_per_key: int
) -> DataFrame:
    """Per-stratum keep rates that level every stratum to ~target_per_key
    docs: rate = min(1, target / count). Returns (key_col, n_docs, rate)."""
    return df.groupBy(key_col).agg(F.count("*").alias("n_docs")).select(
        key_col,
        "n_docs",
        F.least(F.lit(1.0), F.lit(float(target_per_key)) / F.col("n_docs")).alias("rate"),
    )


def sample_uniform_col(id_col, seed: str):
    """Deterministic uniform in [0,1): first 32 bits of
    md5(seed:id) / 2^32. conv() parses the hex JVM-side (codegen)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(4294967296.0)


def deterministic_sample(
    df: DataFrame,
    rates: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    seed: str = "sample:42",
) -> DataFrame:
    """Tag every row with its stratum rate, uniform draw, and keep
    decision. Returns the input columns + (rate, u, kept) — callers
    filter on kept; keeping the rejected rows visible makes the
    decision auditable (and oracle-checkable) row by row."""
    return (
        df.join(F.broadcast(rates.select(key_col, "rate")), on=key_col, how="left")
        .withColumn("rate", F.coalesce("rate", F.lit(0.0)))
        .withColumn("u", sample_uniform_col(id_col, seed))
        .withColumn("kept", F.col("u") < F.col("rate"))
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "wsample:42",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: k rows drawn with
    probability proportional to `weight_col` (Efraimidis–Spirakis
    A-ES). Each row gets key = ln(u)/w with a deterministic md5
    uniform u in (0,1); the k LARGEST keys are exactly a w-weighted
    draw without replacement — so 'sample 10k docs biased by quality
    score' needs no rate table, no rejection loop, no rand().

    Engine-exact ordering: the key is carried as round(1e6 * ln(u)/w)
    in integer micro-units (the lm.py micro-nat discipline — both
    engines run libm ln on identical doubles) with id tie-breaks.
    u gets a +0.5/2^32 offset so u=0 (ln -> -inf) cannot occur.

    Scale shape: one narrow map pass (hash + ln) then a global top-k —
    Catalyst's TakeOrderedAndProject, i.e. per-partition partial top-k
    and a k*P-row final — no shuffle of the corpus, no single-task
    window. Rows with w <= 0 are excluded (zero weight = never drawn).
    """
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    key = F.round(F.lit(1_000_000.0) * F.log(u) / F.col(weight_col).cast("double")).cast(
        "long"
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("key_micro", key)
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )


def temperature_sample_rates(
    df: DataFrame,
    key_col: str,
    total_budget: int,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-weighted mixture rates (multilingual-pretraining
    style, e.g. mT5/XLM-R: sample stratum k with probability
    proportional to count_k^alpha). alpha=1 reproduces the natural
    distribution; alpha=0 gives uniform-per-stratum; 0<alpha<1
    upweights tail strata without flattening the head entirely.

    Returns (key_col, n_docs, target, rate): target_k =
    round(total_budget * count_k^alpha / sum(count^alpha)) and
    rate = min(1, target/count) — feed straight into
    deterministic_sample. Engine-exact: pow/round on identical
    doubles, and the final keep decisions are the same md5-uniform
    rule as the stratified sampler.

    Scale shape: one per-stratum aggregate + a 1-row sum broadcast —
    the corpus is untouched until the (map-side) sampling pass."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_docs"))
    w = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    weighted = counts.withColumn("_w", w)
    tot = weighted.agg(F.sum("_w").alias("_tw"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "target",
            F.round(F.lit(float(total_budget)) * F.col("_w") / F.col("_tw")).cast("long"),
        )
        .withColumn(
            "rate",
            F.least(F.lit(1.0), F.col("target").cast("double") / F.col("n_docs")),
        )
        .select(key_col, "n_docs", "target", "rate")
    )


def weighted_sample_per_key(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "wsample:42",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: within each
    `key` group, the k rows with the largest A-ES keys (see
    weighted_sample_topk) — 'take 10k docs per language, biased by
    quality' in one pass, deterministic, no rand().

    Scale shape: a single Window.partitionBy(key) would pull an entire
    stratum into one task (a dominant language is most of the corpus).
    Instead the knn_join two-level shape: level 1 ranks within
    (key, scan partition) and keeps k, level 2 takes the exact top-k
    over the surviving k*P rows per key. Returns the input columns
    plus key_micro.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    key_micro = F.round(
        F.lit(1_000_000.0) * F.log(u) / F.col(weight_col).cast("double")
    ).cast("long")
    base = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("key_micro", key_micro)
        .withColumn("_part", F.spark_partition_id())
    )
    order = (F.desc("key_micro"), F.asc(id_col))
    w1 = Window.partitionBy(key, "_part").orderBy(*order)
    partial = (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_part")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        partial.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    val_ppm: int = 50_000,
    test_ppm: int = 50_000,
    seed: str = "split:42",
) -> DataFrame:
    """Deterministic train/val/test assignment hashed at GROUP
    granularity — the split that avoids eval leakage: hashing the
    individual doc id puts a document in train while its near-dup
    twin lands in test, so held-out metrics measure memorization.
    Hash the dedup cluster representative / host / canonical URL
    instead and every member of a group rides the same split.

    u_ppm = (first 32 md5 bits of (seed, group) * 10^6) div 2^32 —
    pure integer parts-per-million, so the boundary is engine-exact;
    test takes [0, test_ppm), val [test_ppm, test_ppm+val_ppm),
    train the rest.

    Scale shape: one map-side pass (hash + two comparisons), zero
    shuffle, no rand() — a resumed or re-run job reassigns every
    row identically. Returns the input plus (split_u_ppm, split).
    """
    u_ppm = F.expr(
        f"(CAST(conv(substring(md5(concat('{seed}', ':', CAST({group_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" * CAST(1000000 AS BIGINT)) div CAST(4294967296 AS BIGINT)"
    )
    split = (
        F.when(F.col("split_u_ppm") < F.lit(test_ppm), F.lit("test"))
        .when(F.col("split_u_ppm") < F.lit(test_ppm + val_ppm), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split_u_ppm", u_ppm).withColumn("split", split)


def mixture_epochs(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    budget_tokens: int | None = None,
) -> DataFrame:
    """Training-mixture planning: how many PASSES (epochs) over each
    source a token budget implies under sqrt-temperature reweighting —
    the table a data engineer reads before launching a run (the
    GPT-3/PaLM-style mixture: upweight small high-quality sources,
    which means epochs > 1 for them; big sources train < 1 epoch).

    weight_i ∝ isqrt(tokens_i) (alpha = 1/2 temperature, exact integer
    sqrt — the bandit.py isqrt discipline), weight_ppm = 1e6·w_i / Σw
    (floor), alloc_tokens_i = budget·weight_ppm / 1e6 (floor),
    epochs_milli_i = 1000·alloc_i / tokens_i (floor). budget defaults
    to Σ tokens (one budget-equivalent pass). All-integer arithmetic:
    exact across engines and partitionings.

    Scale shape: ONE groupBy(source) aggregate over the tokenize scan
    (map-side partials), then a 1-row total crossJoin onto the
    per-source table (sources are synopsis-sized). No window.
    """
    from sandcrawler_spark.functions.textstats import word_count_col
    from sandcrawler_spark.operators.bandit import isqrt_col

    per = (
        docs.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(word_count_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("w", isqrt_col(F.col("n_tokens")))
    )
    totals = per.agg(
        F.sum("w").cast("long").alias("_w_total"),
        F.sum("n_tokens").cast("long").alias("_tok_total"),
    )
    out = per.crossJoin(F.broadcast(totals))
    budget_sql = "_tok_total" if budget_tokens is None else str(int(budget_tokens))
    return (
        out.withColumn(
            "weight_ppm",
            F.expr("CAST((1000000 * w) div greatest(CAST(1 AS BIGINT), _w_total) AS BIGINT)"),
        )
        .withColumn(
            "alloc_tokens",
            F.expr(f"CAST(({budget_sql} * weight_ppm) div 1000000 AS BIGINT)"),
        )
        .withColumn(
            "epochs_milli",
            F.expr("CAST((1000 * alloc_tokens) div greatest(CAST(1 AS BIGINT), n_tokens) AS BIGINT)"),
        )
        .select(
            "source", "n_docs", "n_tokens", "weight_ppm", "alloc_tokens", "epochs_milli"
        )
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    embargo_start: str,
    test_start: str,
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split with an embargo gap —
    the time-series counterpart of leakage_safe_split above: train
    takes rows strictly before embargo_start, test takes rows at or
    after test_start, and the [embargo_start, test_start) window is
    DROPPED so near-duplicate re-crawls of the same story straddling
    the boundary cannot leak train content into test (the embargo-gap
    discipline of financial backtesting, applied to capture dates).

    ISO date strings compare lexicographically, so both bounds are
    pushdown-friendly string predicates. Returns one receipt row per
    split: (split, n_rows, min_ts, max_ts)."""
    ts = F.col(ts_col).cast("string")
    split = (
        F.when(ts < embargo_start, F.lit("train"))
        .when(ts >= test_start, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return (
        df.select(split.alias("split"), ts.alias("_ts"))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("_ts").alias("min_ts"),
            F.max("_ts").alias("max_ts"),
        )
    )
