"""Water-filling crawl-budget allocation: split a global per-round
fetch budget B across hosts with integer demands so that (a) no host
gets more than it asked for, (b) every unit of B is used whenever
total demand >= B, and (c) the allocation is max-min fair — small
hosts are fully satisfied, big hosts are capped at a common water
level L. This is the global-budget complement of the per-host
politeness quota (politeness.py caps a host by ITS OWN robots
budget; this operator arbitrates hosts against EACH OTHER when the
fleet's round capacity binds).

Relational construction (no driver-side loop): sort hosts by demand
ascending (host tiebreak), global_cumsum the demands, then the
waterline condition is a per-row predicate — host i (1-based, N
hosts) is fully satisfiable iff

    d_i * (N - i + 1) <= B - cum_{i-1}

(give every not-yet-satisfied host at least d_i; still within
budget). The largest satisfiable prefix i* fixes the integer water
level L = floor((B - cum_{i*}) / (N - i*)) for the remaining hosts,
and the leftover r = (B - cum_{i*}) - L*(N - i*) units go one each
to the last r capped hosts of the ascending order (the r
largest-demand hosts, host-desc tiebreak) — a deterministic
exact-total allocation: sum(alloc) = min(B, sum(d)).

Scale shape: one range shuffle (the cumsum), two broadcast scalars;
the host table is the crawl's dimension relation (10^6-10^7 rows at
10^10 URLs), never the URL fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.operators.cumsum import global_cumsum


def allocate_budget(
    demands: DataFrame,
    budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """(host, demand, alloc) with the max-min fair integer split of
    `budget` described in the module doc."""
    d = demands.select(
        F.col(host_col).alias("host"), F.col(demand_col).cast("long").alias("demand")
    )
    cum = global_cumsum(
        d, [F.col("demand").asc(), F.col("host").asc()], "demand", out_col="cum"
    )
    stats = cum.agg(
        F.count("*").cast("long").alias("n"),
        F.max("cum").cast("long").alias("total"),
    )
    # idx: 1-based rank in the same total order the cumsum used —
    # recoverable from the cumsum itself only for distinct demands, so
    # run a second cumsum of ones (same order, same shape)
    idx = global_cumsum(
        cum.withColumn("_one", F.lit(1).cast("long")),
        [F.col("demand").asc(), F.col("host").asc()],
        "_one", out_col="idx",
    ).drop("_one")

    sat = (
        idx.crossJoin(F.broadcast(stats))
        .withColumn(
            "satisfiable",
            F.col("demand") * (F.col("n") - F.col("idx") + 1)
            <= F.lit(budget) - (F.col("cum") - F.col("demand")),
        )
    )
    # i* = largest satisfiable prefix index. The predicate is monotone
    # in i for the demand-sorted order, so max(idx where satisfiable)
    # IS the prefix end (0 when nothing fits).
    istar = sat.agg(
        F.coalesce(F.max(F.when(F.col("satisfiable"), F.col("idx"))), F.lit(0)).alias(
            "istar"
        ),
        F.coalesce(
            F.max(F.when(F.col("satisfiable"), F.col("cum"))), F.lit(0)
        ).alias("cum_star"),
    )
    out = sat.crossJoin(F.broadcast(istar)).withColumn(
        "_rem", F.lit(budget) - F.col("cum_star")
    )
    n_capped = F.col("n") - F.col("istar")
    level = F.when(n_capped > 0, F.floor(F.col("_rem") / n_capped)).otherwise(F.lit(0))
    leftover = F.when(
        n_capped > 0, F.col("_rem") - level * n_capped
    ).otherwise(F.lit(0))
    # capped hosts in reverse (descending) order: the first `leftover`
    # of them get one extra unit. rank_desc = n - idx + 1.
    rank_desc = F.col("n") - F.col("idx") + 1
    alloc = F.when(F.col("idx") <= F.col("istar"), F.col("demand")).otherwise(
        level + F.when(rank_desc <= leftover, F.lit(1)).otherwise(F.lit(0))
    )
    return out.select(
        "host",
        "demand",
        alloc.cast("long").alias("alloc"),
    )


def budget_oracle_sql(demands_sql: str, budget: int) -> str:
    """DuckDB twin: same order, same waterline predicate, same
    leftover rule. demands_sql yields (host, demand)."""
    return f"""
WITH _bd AS (SELECT host, CAST(demand AS BIGINT) AS demand FROM ({demands_sql})),
_bs AS (
  SELECT host, demand,
         SUM(demand) OVER (ORDER BY demand ASC, host ASC
                           ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (ORDER BY demand ASC, host ASC) AS idx,
         COUNT(*) OVER () AS n
  FROM _bd
),
_sat AS (
  SELECT *, demand * (n - idx + 1) <= {budget} - (cum - demand) AS satisfiable
  FROM _bs
),
_star AS (
  SELECT COALESCE(MAX(CASE WHEN satisfiable THEN idx END), 0) AS istar,
         COALESCE(MAX(CASE WHEN satisfiable THEN cum END), 0) AS cum_star
  FROM _sat
)
SELECT host, demand,
       CAST(CASE WHEN idx <= istar THEN demand
            ELSE ({budget} - cum_star) // NULLIF(n - istar, 0)
                 + CASE WHEN n - idx + 1 <=
                        ({budget} - cum_star)
                        - (({budget} - cum_star) // NULLIF(n - istar, 0)) * (n - istar)
                        THEN 1 ELSE 0 END
       END AS BIGINT) AS alloc
FROM _sat CROSS JOIN _star
""".strip()


def allocation_gini(
    allocs: DataFrame,
    key_col: str = "host",
    value_col: str = "alloc",
) -> DataFrame:
    """Fairness audit of a budget split: the Gini coefficient of the
    per-host allocation, in integer ppm. A water-filled allocation
    should be dramatically more equal than proportional-to-demand —
    this is the one-row receipt that proves it (and the alarm when a
    scheduler change quietly starves the tail).

    For values x_(1) <= ... <= x_(n) (ties broken by key):
        G = (2 * sum(i * x_(i)) - (n+1) * sum(x)) / (n * sum(x))
    All terms are integers; gini_ppm = 1e6 * numerator div denominator
    (numerator >= 0 for the ascending order, so truncating div is
    floor in both engines).

    Scale shape: ranks come from global_cumsum over the (value, key)
    range-partitioned total order — one range shuffle, NO single-task
    global window; the weighted sum and the final division are a
    single aggregate row. At 10^7 hosts this is the same shape
    corpus_pack runs at."""
    d = allocs.select(
        F.col(key_col).alias("_k"), F.col(value_col).cast("long").alias("_v")
    ).withColumn("_one", F.lit(1).cast("long"))
    ranked = global_cumsum(
        d, [F.col("_v").asc(), F.col("_k").asc()], "_one", out_col="_rk"
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("_v").cast("long").alias("total"),
        F.sum(F.col("_rk") * F.col("_v")).cast("long").alias("_wsum"),
    )
    return agg.select(
        "n_keys",
        "total",
        F.expr(
            "CAST(1000000 AS BIGINT) * (2 * _wsum - (n_keys + 1) * total)"
            " div (n_keys * total)"
        ).alias("gini_ppm"),
    )


def gini_oracle_sql(allocs_sql: str, key_col: str = "host", value_col: str = "alloc") -> str:
    """DuckDB twin: same sorted-rank weighted-sum identity (the oracle
    may use a window — it is single-node by construction)."""
    return f"""
WITH a AS ({allocs_sql}),
r AS (
  SELECT {key_col} AS k, CAST({value_col} AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST({value_col} AS BIGINT) ASC, {key_col} ASC) AS rk
  FROM a
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(v) AS BIGINT) AS total,
         CAST(SUM(rk * v) AS BIGINT) AS wsum
  FROM r
)
SELECT n_keys, total,
       CAST(CAST(1000000 AS BIGINT) * (2 * wsum - (n_keys + 1) * total)
            // (n_keys * total) AS BIGINT) AS gini_ppm
FROM s
""".strip()
