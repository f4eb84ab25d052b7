"""Adaptive recrawl scheduling from capture history — the principled
upgrade of the reference's fixed staleness windows (its weekly /
quarterly re-ingest dumps pick failed statuses in an 8h-8d window,
sql/dump_reingest_weekly.sql:1-96): estimate each URL's content change
rate from its own capture history (consecutive-capture digest flips,
the observable a CDX index actually has) and derive a per-URL recrawl
interval — frequently-changing pages recrawl sooner, static pages
back off (Cho & Garcia-Molina, "Effective Page Refresh Policies for
Web Crawlers", TODS 2003: refresh frequency should follow the page's
estimated change frequency).

Estimator (deterministic, engine-portable):
  n_caps     = captures observed for the URL
  n_changes  = consecutive capture pairs whose content digest differs
  span_s     = last capture epoch - first capture epoch (seconds)
  rate_micro_per_day = round(1e6 * 86400 * n_changes / span_s)
      (integer micro-changes/day; 0 when span_s = 0 or single capture)
  interval_days = max_interval if n_changes = 0
                  else clamp(round(span_days / n_changes), 1, max_interval)
      (the MLE mean inter-change time, capped to the backoff ceiling)

All arithmetic after the counts is +,-,*,/ on identical doubles plus
one round() — exactly replayable by the DuckDB oracle (same
fixed-point discipline as host_pagerank / bm25).

Scale shape: ONE shuffle keyed by url. The per-URL lag() window runs
over a single URL's capture history — bounded by per-URL capture
counts (CDX reality: tens to low thousands), never corpus-sized, so
no hot-key ceiling. The aggregate that follows shares the same
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_rate_schedule(
    captures: DataFrame,
    url_col: str = "url",
    epoch_col: str = "epoch_s",
    digest_col: str = "sha1hex",
    max_interval_days: int = 64,
) -> DataFrame:
    """(url, n_caps, n_changes, span_s, rate_micro_per_day,
    interval_days) — one row per URL with >= 1 capture."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("_ep", "_dg")
    flagged = (
        captures.select(
            F.col(url_col).alias("url"),
            F.col(epoch_col).cast("long").alias("_ep"),
            F.col(digest_col).alias("_dg"),
        )
        .withColumn("_prev", F.lag("_dg").over(w))
        .withColumn(
            "_changed",
            (F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_dg"))).cast("long"),
        )
    )
    agg = flagged.groupBy("url").agg(
        F.count("*").cast("long").alias("n_caps"),
        F.sum("_changed").cast("long").alias("n_changes"),
        (F.max("_ep") - F.min("_ep")).cast("long").alias("span_s"),
    )
    span_days = F.col("span_s") / F.lit(86400.0)
    rate = F.when(
        F.col("span_s") > 0,
        F.round(F.lit(1_000_000.0) * F.lit(86400.0) * F.col("n_changes") / F.col("span_s")),
    ).otherwise(F.lit(0))
    interval = F.when(F.col("n_changes") == 0, F.lit(max_interval_days)).otherwise(
        F.greatest(
            F.lit(1),
            F.least(F.lit(max_interval_days), F.round(span_days / F.col("n_changes"))),
        )
    )
    return agg.select(
        "url",
        "n_caps",
        "n_changes",
        "span_s",
        rate.cast("long").alias("rate_micro_per_day"),
        interval.cast("long").alias("interval_days"),
    )


def snapshot_diff(
    captures: DataFrame,
    split_datetime: str,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-snapshot diff: compare the latest capture of every URL
    before `split_datetime` against the latest at-or-after it and
    classify NEW / GONE / CHANGED / SAME — the per-release delta
    report Common Crawl publishes for each snapshot, and the input a
    recrawl scheduler audits its change-rate model against
    (complements change_rate_schedule, which estimates rates from the
    same capture stream).

    Latest capture per (url, half) is the max (datetime, event_id)
    struct — an argmax aggregate, NOT a window over the url's full
    capture history: one groupBy per half with map-side partials, so a
    URL with millions of captures never materializes in one task.
    The halves join 1:1 per url afterwards (full outer).

    Returns (url, status, old_sha1, new_sha1).
    """
    def _latest(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy(F.col(url_col).alias("url")).agg(
            F.max(F.struct("datetime", "event_id", "sha1hex"))
            .getField("sha1hex")
            .alias(out)
        )

    old = _latest(captures.filter(F.col("datetime") < split_datetime), "old_sha1")
    new = _latest(captures.filter(F.col("datetime") >= split_datetime), "new_sha1")
    return (
        old.join(new, on="url", how="full_outer")
        .select(
            "url",
            F.when(F.col("old_sha1").isNull(), "NEW")
            .when(F.col("new_sha1").isNull(), "GONE")
            .when(F.col("old_sha1") == F.col("new_sha1"), "SAME")
            .otherwise("CHANGED")
            .alias("status"),
            "old_sha1",
            "new_sha1",
        )
    )


def revalidation_savings(
    captures: DataFrame,
    url_col: str = "url",
    group_col: str = "mimetype",
    epoch_col: str = "epoch_s",
    digest_col: str = "sha1hex",
    size_col: str = "warc_csize",
) -> DataFrame:
    """Conditional-GET economics: if the crawler had sent
    If-None-Match/If-Modified-Since on every recapture, how many bytes
    would 304s have saved? A recapture whose content digest equals the
    previous capture's digest is a wasted full fetch — the reference
    eats this cost on every weekly re-ingest dump
    (sql/dump_reingest_weekly.sql); this is the report that prices it.

    Per group (e.g. mimetype or warc collection):
      n_caps        all captures
      n_recaps      captures with a predecessor (candidates for a
                    conditional request)
      n_unchanged   recaptures whose digest matched the predecessor
                    (would have been 304 Not Modified)
      bytes_saved   sum of the unchanged recaptures' compressed sizes
      unchanged_ppm 1e6 * n_unchanged div n_recaps (0 when no recaps)

    Scale shape: ONE shuffle keyed by url; the lag() window runs over
    a single URL's capture history (bounded by per-URL capture counts,
    never corpus-sized); the group rollup that follows is map-side
    combinable. No Python anywhere."""
    from pyspark.sql import Window

    w = Window.partitionBy("_u").orderBy("_ep", "_dg")
    flagged = (
        captures.select(
            F.col(url_col).alias("_u"),
            F.col(group_col).alias("grp"),
            F.col(epoch_col).cast("long").alias("_ep"),
            F.col(digest_col).alias("_dg"),
            F.col(size_col).cast("long").alias("_sz"),
        )
        .withColumn("_prev", F.lag("_dg").over(w))
        .withColumn("_is_recap", F.col("_prev").isNotNull())
        .withColumn("_same", F.col("_prev").isNotNull() & (F.col("_prev") == F.col("_dg")))
    )
    g = flagged.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_caps"),
        F.sum(F.col("_is_recap").cast("long")).cast("long").alias("n_recaps"),
        F.sum(F.col("_same").cast("long")).cast("long").alias("n_unchanged"),
        F.sum(F.when(F.col("_same"), F.col("_sz")).otherwise(F.lit(0)))
        .cast("long")
        .alias("bytes_saved"),
    )
    return g.select(
        F.col("grp").alias("grp"),
        "n_caps",
        "n_recaps",
        "n_unchanged",
        "bytes_saved",
        F.expr(
            "CASE WHEN n_recaps = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(1000000 AS BIGINT) * n_unchanged div n_recaps END"
        ).alias("unchanged_ppm"),
    )


# --- freshness-optimal revisit allocation (r4 session 16) -----------------

# revisit-frequency ladder in fetches per 210-day period (lcm of the
# monthly/weekly/daily human schedule): none -> 1/30d -> 1/7d -> 1/d
FRESH_LADDER = [7, 30, 210]
FRESH_SCALE = 1_000_000


def freshness_allocation(
    rates: DataFrame,
    budget_per_210d: int,
    url_col: str = "url",
    lam_col: str = "lam_micro",
) -> DataFrame:
    """Freshness-maximizing revisit allocation under a global fetch
    budget (Cho & Garcia-Molina 2003's uniform-vs-proportional result,
    discretized): each URL independently offers the ladder steps
    none->monthly->weekly->daily; expected steady-state freshness under
    Poisson changes at rate lambda and revisit rate f is F = f/(f+lambda),
    which is CONCAVE in f — so per-URL step ratios are non-increasing
    and taking steps globally in decreasing gain-per-fetch order is
    the FRACTIONAL-relaxation optimum as a sort + running sum, not a
    loop. For the integral problem this is a knapsack: the greedy is
    within one ladder step's gain of OPT (the classic density-greedy
    bound, realized only when a 180-cost daily step straddles the
    budget edge — tests/test_r4s16_ops.py exhibits it), which at web
    scale (budget >> 210) is noise.

    All arithmetic is integer: lambda arrives in micro-changes/day,
    freshness is floor(1e6 * f / (f + lam*210/1e6)) computed as a
    ratio of exact per-210-day micro units; gain-per-fetch is
    floor(1e6 * gain / step_cost). The global order is (ratio desc,
    url asc, step asc); concavity makes each URL's own steps
    non-increasing in ratio, and the step-asc tiebreak keeps
    prerequisites ahead of their successors on exact ties.

    Scale shape: 3 rows per URL, ONE range-shuffle cumsum
    (global_cumsum — no single-task window), budget gate as a per-row
    predicate. Returns (url, lam_micro, n_steps, f_per_210d,
    freshness_micro) for every URL, n_steps = 0 rows included.
    """
    from pyspark.sql import functions as F

    from sandcrawler_spark.operators.cumsum import global_cumsum

    lam = F.col(lam_col)

    def fresh(f_210: int):
        # floor(1e6 * (1e6*f) / (1e6*f + 210*lam)) — exact integers
        return F.expr(
            f"(CAST(1000000 AS BIGINT) * (1000000 * CAST({f_210} AS BIGINT))) div "
            f"(1000000 * CAST({f_210} AS BIGINT) + 210 * {lam_col})"
        )

    steps = None
    prev = F.lit(0).cast("long")
    prev_cost = 0
    for i, f_210 in enumerate(FRESH_LADDER, start=1):
        gain = (fresh(f_210) - prev).alias("gain")
        cost = f_210 - prev_cost
        row = rates.select(
            F.col(url_col).alias("url"),
            lam.alias("lam_micro"),
            F.lit(i).alias("step"),
            F.lit(cost).cast("long").alias("cost"),
            gain,
        )
        steps = row if steps is None else steps.unionByName(row)
        prev = fresh(f_210)
        prev_cost = f_210

    steps = steps.withColumn(
        "ratio", F.expr("(CAST(1000000 AS BIGINT) * gain) div cost")
    )
    ordered = global_cumsum(
        steps,
        [F.col("ratio").desc(), F.col("url").asc(), F.col("step").asc()],
        "cost",
        out_col="cum_cost",
    )
    taken = ordered.withColumn(
        "take", (F.col("cum_cost") <= F.lit(budget_per_210d)).cast("int")
    )
    per_url = taken.groupBy("url", "lam_micro").agg(
        F.sum("take").cast("int").alias("n_steps"),
        F.sum(F.when(F.col("take") == 1, F.col("cost")).otherwise(0))
        .cast("long").alias("f_per_210d"),
    )
    # freshness at the chosen frequency (0 steps -> freshness 0)
    return per_url.select(
        "url", "lam_micro", "n_steps", "f_per_210d",
        F.expr(
            "CASE WHEN f_per_210d = 0 THEN CAST(0 AS BIGINT) ELSE "
            "(CAST(1000000 AS BIGINT) * (1000000 * f_per_210d)) div "
            "(1000000 * f_per_210d + 210 * lam_micro) END"
        ).alias("freshness_micro"),
    )


def freshness_oracle_sql(rates_sql: str, budget_per_210d: int) -> str:
    """DuckDB twin of freshness_allocation over (url, lam_micro)."""
    fresh = (
        "(CAST(1000000 AS BIGINT) * (1000000 * CAST({f} AS BIGINT))) // "
        "(1000000 * CAST({f} AS BIGINT) + 210 * lam_micro)"
    )
    step_rows = []
    prev_expr = "CAST(0 AS BIGINT)"
    prev_cost = 0
    for i, f_210 in enumerate(FRESH_LADDER, start=1):
        cur = fresh.format(f=f_210)
        step_rows.append(
            f"SELECT url, lam_micro, {i} AS step, "
            f"CAST({f_210 - prev_cost} AS BIGINT) AS cost, "
            f"({cur}) - ({prev_expr}) AS gain FROM _fa_rates"
        )
        prev_expr = cur
        prev_cost = f_210
    union = " UNION ALL ".join(step_rows)
    return f"""
WITH _fa_rates AS (SELECT url, lam_micro FROM ({rates_sql})),
_fa_steps AS ({union}),
_fa_ranked AS (
  SELECT *, (CAST(1000000 AS BIGINT) * gain) // cost AS ratio FROM _fa_steps
),
_fa_cum AS (
  SELECT *, SUM(cost) OVER (
    ORDER BY ratio DESC, url ASC, step ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum_cost
  FROM _fa_ranked
),
_fa_per_url AS (
  SELECT url, lam_micro,
         CAST(SUM(CASE WHEN cum_cost <= {budget_per_210d} THEN 1 ELSE 0 END) AS INT)
           AS n_steps,
         CAST(SUM(CASE WHEN cum_cost <= {budget_per_210d} THEN cost ELSE 0 END) AS BIGINT)
           AS f_per_210d
  FROM _fa_cum GROUP BY url, lam_micro
)
SELECT url, lam_micro, n_steps, f_per_210d,
       CASE WHEN f_per_210d = 0 THEN CAST(0 AS BIGINT) ELSE
         (CAST(1000000 AS BIGINT) * (1000000 * f_per_210d)) //
         (1000000 * f_per_210d + 210 * lam_micro) END AS freshness_micro
FROM _fa_per_url
""".strip()


def link_rot(
    captures: DataFrame,
    url_col: str = "url",
    dt_col: str = "datetime",
    status_col: str = "status_code",
) -> DataFrame:
    """Link-rot transition matrix over a capture index: per URL, the
    FIRST and LAST capture's status (archive-science's death/
    resurrection accounting — a 200->404 row is a dead link the
    recrawler can stop visiting; 404->200 is a resurrection the
    seen-set must not suppress). Returns one row per
    (first_status, last_status) pair with n_urls and share_ppm of the
    URL universe.

    Scale shape: one groupBy(url) with min/max(struct(datetime,
    status)) — plain aggregates with map-side partials, NO window
    over per-URL history (a million-capture URL costs two partial
    structs); then a transition-pair count and a broadcast 1-row
    total for the ppm share. (url, datetime) unique (CDX invariant)
    makes the struct extrema deterministic."""
    per_url = captures.groupBy(F.col(url_col).alias("url")).agg(
        F.min(F.struct(F.col(dt_col), F.col(status_col))).alias("_f"),
        F.max(F.struct(F.col(dt_col), F.col(status_col))).alias("_l"),
    )
    pairs = per_url.select(
        F.col(f"_f.{status_col}").alias("first_status"),
        F.col(f"_l.{status_col}").alias("last_status"),
    )
    agg = pairs.groupBy("first_status", "last_status").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    total = agg.agg(F.sum("n_urls").alias("_t"))
    return agg.crossJoin(F.broadcast(total)).select(
        "first_status",
        "last_status",
        "n_urls",
        F.expr("CAST(1000000 AS BIGINT) * n_urls div _t").alias("share_ppm"),
    )


def feed_poll_schedule(
    entries: DataFrame,
    as_of: str,
    host_col: str = "host",
    date_col: str = "published",
    min_hours: int = 1,
    max_hours: int = 168,
) -> DataFrame:
    """Feed-polling cadence from observed publish rates — the policy
    layer over the feed discovery channel (parse_feed /
    discover_feeds): a feed that ships 10 entries/day deserves hourly
    polls, one that ships monthly deserves the weekly floor. The dual
    of change_rate_schedule (which reads CAPTURE deltas): feeds carry
    explicit publish dates, so cadence needs no content diffing.

      rate_x100   = 100 * n_entries / span_days   (integer fixed-point)
      poll_hours  = clamp(min_hours, max_hours, 2400 / rate_x100)
                    (i.e. 24h divided by entries/day, integer div)

    Returns (host, n_entries, span_days, rate_x100, newest_age_days,
    poll_hours). One host-keyed aggregate with map-side partials —
    host-cardinality output, no windows."""
    d = entries.select(
        F.col(host_col).alias("host"), F.col(date_col).cast("date").alias("_d")
    )
    agg = d.groupBy("host").agg(
        F.count("*").cast("long").alias("n_entries"),
        F.min("_d").alias("_min"),
        F.max("_d").alias("_max"),
    )
    span = (F.datediff(F.col("_max"), F.col("_min")) + 1).cast("long")
    poll = F.least(
        F.lit(int(max_hours)).cast("long"),
        F.greatest(
            F.lit(int(min_hours)).cast("long"),
            F.expr("2400 div greatest(rate_x100, 1)"),
        ),
    )
    return (
        agg.withColumn("span_days", span)
        .withColumn("rate_x100", F.expr("(100 * n_entries) div span_days"))
        .withColumn(
            "newest_age_days",
            F.datediff(F.lit(as_of).cast("date"), F.col("_max")).cast("long"),
        )
        .withColumn("poll_hours", poll)
        .select("host", "n_entries", "span_days", "rate_x100",
                "newest_age_days", "poll_hours")
    )
