"""UCB1 host scheduling for the crawl frontier — a principled
replacement for the reference's static per-source priorities
(ingest_request.priority, python/sandcrawler/ingest.py request
routing): treat each host as a bandit arm whose reward is fetch
success, and pick the next hosts to spend budget on by the classic
UCB1 score

    ucb_i = mean_i + sqrt(2 * ln(N) / n_i)

(Auer, Cesa-Bianchi & Fischer, "Finite-time Analysis of the
Multiarmed Bandit Problem", Machine Learning 2002). Hosts with high
observed success rates are exploited; rarely-tried hosts keep a large
exploration bonus so a few bad early fetches never permanently
blacklist a host.

Determinism discipline (engine-exact, same playbook as lm.py /
host_pagerank): everything is integer micro-units.
  mean_micro  = 1e6 * n_success div n_trials          (integer div)
  ln N        -> micro-nats via round(ln(N) * 1e6)    (one libm ln on
                 an identical integer input in both engines)
  bonus_micro = isqrt(2 * ln_micro(N) * 1e6 div n_trials)
      since (1e6 * sqrt(2 lnN / n))^2 = 1e12 * 2 * lnN / n
          = 2 * (lnN * 1e6) * 1e6 / n = 2 * L * 1e6 / n.
  isqrt is EXACT in both engines: seed s = floor(sqrt(x::double)),
  then one-step correction s -> s+1 if (s+1)^2 <= x, s -> s-1 if
  s^2 > x. The float seed is within 1 of the true integer sqrt for
  every x < 2^52 (here x <= 2 * 21e6 * 1e6 ~ 4.2e13), so one
  correction suffices; the corrected value is integer-exact.

Scale shape: ONE shuffle — groupBy(host) with map-side partial
counts; the scoring arithmetic is pure Catalyst codegen on the
aggregated (per-host, tiny) table. No window over the raw trials, no
driver loop. At 10^7 hosts the scored table is still only 10^7 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def isqrt_col(x: Column) -> Column:
    """Exact integer sqrt of a non-negative long column (x < 2^52):
    float seed + one-step correction, replayable in ANSI SQL."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def isqrt_oracle(expr: str) -> str:
    """DuckDB twin of isqrt_col over an integral SQL expression."""
    seed = f"CAST(FLOOR(SQRT(CAST(({expr}) AS DOUBLE))) AS BIGINT)"
    up = f"(CASE WHEN ({seed} + 1) * ({seed} + 1) <= ({expr}) THEN {seed} + 1 ELSE {seed} END)"
    return f"(CASE WHEN {up} * {up} > ({expr}) THEN {up} - 1 ELSE {up} END)"


def ucb_host_scores(
    trials: DataFrame,
    host_col: str = "host",
    success_col: str = "success",
    top_k: int = 10,
) -> DataFrame:
    """Per-host UCB1 in integer micro-units from a (host, success:
    0/1-castable) trial log. Returns one row per host:
    (host, n_trials, n_success, mean_micro, bonus_micro, ucb_micro,
    selected) where selected marks the top_k hosts by
    (ucb_micro DESC, host ASC) — the next round's crawl allocation.

    The top-k flag is computed by counting strictly-better hosts via
    a self-agg on the (tiny) per-host table, not a global window:
    rank = 1 + #{j : (ucb_j, host_j) > (ucb_i, host_i)} in the
    lexicographic order, exact and tie-free."""
    import math

    per_host = (
        trials.select(
            F.col(host_col).alias("host"),
            F.col(success_col).cast("long").alias("_s"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_trials"),
            F.sum("_s").cast("long").alias("n_success"),
        )
    )
    # N = total trials: a scalar — computed driver-side from the same
    # aggregate tree would add a collect; instead sum the per-host
    # counts with a broadcast single-row cross join (tiny).
    tot = per_host.agg(F.sum("n_trials").cast("long").alias("_n_total"))
    scored = per_host.crossJoin(F.broadcast(tot))
    ln_micro = F.round(F.log(F.col("_n_total").cast("double")) * MICRO).cast("long")
    scored = (
        scored.withColumn("_ln_micro", ln_micro)
        .withColumn(
            "mean_micro",
            F.expr(f"n_success * CAST({MICRO} AS BIGINT) div n_trials"),
        )
        .withColumn(
            "bonus_micro",
            isqrt_col(F.expr(f"2 * _ln_micro * CAST({MICRO} AS BIGINT) div n_trials")),
        )
        .withColumn("ucb_micro", (F.col("mean_micro") + F.col("bonus_micro")).cast("long"))
        .drop("_n_total", "_ln_micro")
    )
    # tie-free top-k without a global single-task window: the scored
    # table is per-host (small); broadcast the k-th key and compare.
    kth = (
        scored.select("ucb_micro", "host")
        .orderBy(F.col("ucb_micro").desc(), F.col("host").asc())
        .limit(top_k)
        .agg(
            F.min(F.struct(F.col("ucb_micro").alias("u"), F.col("host").alias("h"))).alias("_kth"),
            F.count("*").alias("_k_avail"),
        )
    )
    out = scored.crossJoin(F.broadcast(kth)).withColumn(
        "selected",
        F.when(F.col("_k_avail") < top_k, F.lit(True)).otherwise(
            (F.col("ucb_micro") > F.col("_kth.u"))
            | ((F.col("ucb_micro") == F.col("_kth.u")) & (F.col("host") <= F.col("_kth.h")))
        ),
    )
    return out.select(
        "host", "n_trials", "n_success", "mean_micro", "bonus_micro", "ucb_micro", "selected"
    )


def ucb_oracle_sql(trials_sql: str, top_k: int = 10) -> str:
    """DuckDB twin: same integer micro-unit pipeline over the same
    trial relation. The top-k flag replays the (ucb DESC, host ASC)
    cut with a window rank over the per-host table (fine in the
    oracle — DuckDB is single-node by construction)."""
    m = MICRO
    bonus_x = f"2 * ln_micro * CAST({m} AS BIGINT) // n_trials"
    return f"""
WITH t AS ({trials_sql}),
per_host AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_trials,
         CAST(SUM(CAST(success AS BIGINT)) AS BIGINT) AS n_success
  FROM t GROUP BY host
),
tot AS (SELECT CAST(SUM(n_trials) AS BIGINT) AS n_total FROM per_host),
scored AS (
  SELECT host, n_trials, n_success,
         CAST(n_success * CAST({m} AS BIGINT) // n_trials AS BIGINT) AS mean_micro,
         CAST(round(ln(CAST(n_total AS DOUBLE)) * {m}) AS BIGINT) AS ln_micro
  FROM per_host CROSS JOIN tot
),
bon AS (
  SELECT host, n_trials, n_success, mean_micro,
         CAST({isqrt_oracle(bonus_x)} AS BIGINT) AS bonus_micro
  FROM scored
),
ranked AS (
  SELECT *, CAST(mean_micro + bonus_micro AS BIGINT) AS ucb_micro,
         ROW_NUMBER() OVER (ORDER BY mean_micro + bonus_micro DESC, host ASC) AS rk
  FROM bon
)
SELECT host, n_trials, n_success, mean_micro, bonus_micro, ucb_micro,
       rk <= {top_k} AS selected
FROM ranked
""".strip()
