"""Per-host politeness scheduler with explicit skew handling.

Semantics (north rule; reference analogs: per-host backpressure
workers.py:534-554, randomized queue spreading reingest_weekly.sh:20,
deterministic re-enqueue ordering RUNBOOK.md):

  Given a frontier with (host, priority, ...) and per-host budgets
  (robots.max_parallel, crawl_delay), assign every URL a
  (crawl_round, seq_in_round) such that:
    - within a host, higher-priority URLs are scheduled first,
    - a host never gets more than its quota per round,
    - the assignment is DETERMINISTIC at any parallelism/partitioning.

The core primitive is rank-within-key over a skewed key (a hot host
can hold 10-20% of a web-scale frontier — a plain
Window.partitionBy(host) puts that host in ONE task and stalls the
stage). `ranked_within_key` does an explicit hot/cold split:

  1. host histogram (map-side-combined groupBy count) → the hot set
     is the handful of hosts above `hot_threshold` rows (broadcast).
  2. COLD hosts (~all of them): plain window rank ordered by
     (priority desc, tiebreak) — each host group fits a partition.
  3. HOT hosts: rows are salted into `n_salts` deterministic
     sub-groups (pmod(xxhash64(tiebreak), n_salts) — data-derived,
     NOT execution-derived, so the result is identical at any
     parallelism). Rank order within a hot host is
     (priority desc, salt asc, tiebreak asc): local rank inside each
     (host, priority, salt) cell + an offset from the tiny
     (host, priority, salt) count table (broadcast; ≤ hot_hosts ×
     priorities × n_salts rows). The hot host's window work is spread
     over n_salts × priorities tasks instead of one.

Within equal (host, priority) the hot path orders by (salt, tiebreak)
rather than plain (tiebreak) — a documented, deterministic tiebreak
choice (the reference's own queue order inside a priority class is
explicitly arbitrary-but-reproducible: `shuf` with a saved ordering,
reingest_weekly.sh:20 + RUNBOOK.md "sort is to ensure jobs are
enqueued in the same order again").

`ranked_simple` (plain window) is the semantic oracle; tests assert
cold-path equality with it, bijectivity and priority-monotonicity of
the hot path, and cross-parallelism determinism of both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_simple(df: DataFrame, key: str, order_cols: list) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("rank_in_key", F.row_number().over(w) - 1)


def ranked_within_key(
    df: DataFrame,
    key: str,
    prio_col: str = "priority",
    tiebreak: str = "url",
    n_salts: int = 16,
    hot_threshold: int = 2_000_000,
) -> DataFrame:
    """Exact 0-based rank of each row within its key group, higher
    `prio_col` first, deterministic and skew-proof. See module doc for
    the hot/cold construction."""
    prio = F.coalesce(F.col(prio_col), F.lit(0))

    hist = df.groupBy(key).agg(F.count("*").alias("_n"))
    hot_hosts = hist.filter(F.col("_n") > hot_threshold).select(key)

    marked = df.join(
        F.broadcast(hot_hosts.withColumn("_hot", F.lit(True))), on=key, how="left"
    )
    cold = marked.filter(F.col("_hot").isNull()).drop("_hot")
    hot = marked.filter(F.col("_hot")).drop("_hot")

    cold_ranked = ranked_simple(cold, key, [prio.desc(), F.col(tiebreak).asc()])

    # materialize the coalesced priority ONCE and use it in the groupBy,
    # both windows, and the join keys: a raw NULL priority would (a) never
    # match its (key, prio, salt) cell in the equi-join (null keys don't
    # match -> rows silently dropped) and (b) tie nondeterministically
    # with a 0-priority cell in the cumulative-offset window
    salt = F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(n_salts)).cast("int")
    hot_s = hot.withColumn("_salt", salt).withColumn("_prio", prio)
    cells = hot_s.groupBy(key, "_prio", "_salt").agg(F.count("*").alias("_cnt"))
    cum_w = (
        Window.partitionBy(key)
        .orderBy(F.col("_prio").desc(), F.col("_salt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = cells.withColumn(
        "_offset", F.coalesce(F.sum("_cnt").over(cum_w), F.lit(0))
    ).drop("_cnt")
    local_w = Window.partitionBy(key, "_prio", "_salt").orderBy(F.col(tiebreak).asc())
    hot_ranked = (
        hot_s.join(F.broadcast(offsets), on=[key, "_prio", "_salt"], how="inner")
        .withColumn("rank_in_key", F.row_number().over(local_w) - 1 + F.col("_offset"))
        .drop("_salt", "_offset", "_prio")
    )
    return cold_ranked.unionByName(hot_ranked)


def planned_fetch_times(
    schedule: DataFrame,
    epoch: str = "2024-01-01 00:00:00",
    round_window_s: float = 60.0,
    delay_col: str = "crawl_delay_s",
) -> DataFrame:
    """Event-time realization of the static schedule: each URL's planned
    fetch instant is epoch + crawl_round*round_window +
    seq_in_round*crawl_delay. Because schedule_politeness caps quota at
    floor(round_window / crawl_delay), every row of a round lands
    STRICTLY inside its round's wall-clock window (max offset =
    (quota-1)*delay <= round_window - delay) — so running these
    timestamps through windowed_host_rates with window=round_window
    must show no host window above its quota. That turns the static
    per-round budget into validated event-time semantics (the
    reference's backpressure is wall-clock, workers.py:534-554); the
    politeness_timing driver query + oracle assert it."""
    secs = (
        F.col("crawl_round").cast("double") * F.lit(round_window_s)
        + F.col("seq_in_round").cast("double") * F.coalesce(F.col(delay_col), F.lit(0.0))
    )
    return schedule.withColumn("planned_offset_s", secs).withColumn(
        "planned_ts", F.to_timestamp(F.lit(epoch)) + F.make_dt_interval(secs=secs)
    )


def schedule_politeness(
    frontier: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    prio_col: str = "priority",
    tiebreak: str = "url",
    default_quota: int = 2,
    skew_safe: bool = True,
    hot_threshold: int = 2_000_000,
    n_salts: int = 16,
    round_window_s: float = 60.0,
) -> DataFrame:
    """Assign (crawl_round, seq_in_round) per URL.

    robots: (host, max_parallel, disallow_prefixes, crawl_delay_s) —
    small dimension table, broadcast. URLs matching a disallow prefix
    are excluded with robots_excluded=true (kept, flagged, so lineage
    accounts for every input row).

    A host's per-round quota honors BOTH robots budgets: at most
    max_parallel fetches per round, AND no more fetches than its
    crawl-delay allows inside one `round_window_s` wall-clock window
    (robots.txt Crawl-delay semantics — the reference enforces this as
    per-host backpressure in its worker loop, workers.py:534-554;
    here it is a static budget:  quota = min(max_parallel,
    floor(round_window_s / crawl_delay_s)), floored at 1).
    """
    from sandcrawler_spark.functions.robots import robots_disallowed_col

    # allow_prefixes is optional in the dimension (older stores carry
    # only disallow rows); RFC 9309 semantics degrade gracefully to
    # disallow-only longest-match, which equals plain any-match there
    has_allow = "allow_prefixes" in robots.columns
    r = robots.select(
        F.col("host").alias(host_col),
        F.col("max_parallel"),
        F.col("disallow_prefixes"),
        *([F.col("allow_prefixes")] if has_allow else []),
        F.col("crawl_delay_s"),
    )
    j = frontier.join(F.broadcast(r), on=host_col, how="left")
    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    # RFC 9309 §2.2.2 matching: '*'/'$' wildcards, longest rule wins,
    # Allow beats Disallow on ties (functions/robots.py)
    disallowed = robots_disallowed_col(
        path,
        F.col("disallow_prefixes"),
        F.col("allow_prefixes") if has_allow else None,
    )
    delay_cap = F.when(
        F.col("crawl_delay_s").isNotNull() & (F.col("crawl_delay_s") > 0),
        F.greatest(F.floor(F.lit(round_window_s) / F.col("crawl_delay_s")), F.lit(1)),
    )
    base_quota = F.coalesce(F.col("max_parallel"), F.lit(default_quota)).cast("long")
    quota = F.when(delay_cap.isNotNull(), F.least(base_quota, delay_cap)).otherwise(base_quota)
    j = j.withColumn("robots_excluded", disallowed).withColumn("quota", quota)
    allowed = j.filter(~F.col("robots_excluded"))
    if skew_safe:
        ranked = ranked_within_key(
            allowed, host_col, prio_col, tiebreak, n_salts=n_salts, hot_threshold=hot_threshold
        )
    else:
        ranked = ranked_simple(
            allowed, host_col, [F.coalesce(F.col(prio_col), F.lit(0)).desc(), F.col(tiebreak).asc()]
        )
    out = ranked.withColumn(
        "crawl_round", (F.col("rank_in_key") / F.col("quota")).cast("int")
    ).withColumn("seq_in_round", F.pmod(F.col("rank_in_key"), F.col("quota")).cast("int"))
    excluded = j.filter(F.col("robots_excluded")).withColumn(
        "rank_in_key", F.lit(None).cast("long")
    ).withColumn("crawl_round", F.lit(None).cast("int")).withColumn(
        "seq_in_round", F.lit(None).cast("int")
    )
    out = out.unionByName(excluded).drop("max_parallel", "disallow_prefixes")
    return out.drop("allow_prefixes") if has_allow else out


# ---------------------------------------------------------------------------
# AIMD adaptive per-host delay (r4)
# ---------------------------------------------------------------------------

def adapt_crawl_delays(
    results: DataFrame,
    current: DataFrame,
    host_col: str = "host",
    status_col: str = "status_code",
    delay_ms_col: str = "crawl_delay_ms",
    min_delay_ms: int = 250,
    max_delay_ms: int = 64_000,
    decrease_ms: int = 250,
) -> DataFrame:
    """Next-round per-host crawl delay from this round's observed fetch
    outcomes — TCP-style AIMD, the adaptive layer on top of the static
    robots Crawl-delay floor (which schedule_politeness keeps
    enforcing; this only ever ADDS caution):

      any 429/503 from a host this round -> delay doubles
        (multiplicative increase on the explicit back-off signals the
        reference reacts to with its blanket 40x5s sleep,
        workers.py:534-554 — here per-host, so one throttling host
        does not stall the fleet);
      an all-successful round      -> delay decreases by decrease_ms
        (additive decrease, probing back toward the floor);
      other failures (404/5xx-mix) -> delay unchanged.

    Delays are integer milliseconds clamped to [min, max] — the whole
    update is integer CASE arithmetic, exactly replayable by the
    DuckDB oracle. Hosts with no traffic this round keep their delay.

    Scale shape: one host-keyed count aggregate over the round's
    results + a broadcast-sized join against the per-host delay table
    (hosts << rows; the delay table is the small side at any corpus
    scale)."""
    obs = results.groupBy(F.col(host_col).alias("host")).agg(
        F.sum(
            F.when(F.col(status_col).isin(429, 503), 1).otherwise(0)
        ).cast("long").alias("n_throttle"),
        F.sum(
            F.when(F.col(status_col) >= 400, 1).otherwise(0)
        ).cast("long").alias("n_fail"),
    )
    cur = current.select(
        F.col(host_col).alias("host"), F.col(delay_ms_col).cast("long").alias("_d")
    )
    nxt = (
        cur.join(obs, on="host", how="left")
        .select(
            "host",
            F.when(F.col("n_throttle") > 0, F.col("_d") * 2)
            .when(
                F.col("n_fail") == 0,
                F.col("_d") - F.lit(decrease_ms),
            )
            .otherwise(F.col("_d"))
            .alias("_raw"),
        )
        .select(
            "host",
            F.greatest(
                F.lit(min_delay_ms),
                F.least(F.lit(max_delay_ms), F.col("_raw")),
            ).cast("long").alias(delay_ms_col),
        )
    )
    return nxt


def host_capacity_plan(
    frontier: DataFrame,
    delays: DataFrame,
    round_seconds: int = 3600,
    host_col: str = "host",
    delay_col: str = "delay_ms",
) -> DataFrame:
    """Politeness-feasibility planner: given per-host crawl delays
    (static, or adapt_crawl_delays' output) and the queued frontier,
    how much of each host's demand can one round legally serve, and
    how many rounds until the queue drains? The scheduler can only
    ORDER requests; this is the arithmetic that says which hosts are
    structurally oversubscribed (demand > capacity no matter the
    order) — those need a budget decision (water-filling) or a longer
    round, not a better sort. The reference discovers this by timing
    out (workers.py backoff); here it is a one-join plan.

    capacity = round_seconds*1000 div delay_ms (min 1 fetch/round),
    deficit  = max(demand - capacity, 0),
    rounds_to_drain = ceil-div(demand, capacity) — all exact int64.

    One demand count agg + one broadcast join against the
    host-cardinality delay table. Hosts with no delay row get
    `default_missing` = 1000 ms.
    """
    demand = frontier.groupBy(host_col).agg(
        F.count("*").cast("long").alias("demand")
    )
    d = delays.select(
        F.col(host_col), F.col(delay_col).cast("long").alias("_delay_ms")
    )
    out = demand.join(F.broadcast(d), host_col, "left").select(
        host_col,
        "demand",
        F.coalesce("_delay_ms", F.lit(1000)).alias("delay_ms"),
    )
    cap = F.greatest(
        F.expr(f"CAST({int(round_seconds)} * 1000 AS BIGINT) div delay_ms"),
        F.lit(1).cast("long"),
    )
    out = out.withColumn("capacity", cap)
    return out.select(
        host_col,
        "demand",
        "delay_ms",
        "capacity",
        F.greatest(F.col("demand") - F.col("capacity"), F.lit(0).cast("long")).alias(
            "deficit"
        ),
        F.expr("CAST((demand + capacity - 1) div capacity AS BIGINT)").alias(
            "rounds_to_drain"
        ),
    )


def parse_retry_after_col(value, now_epoch):
    """RFC 9110 §10.2.3 Retry-After parsing, pure Catalyst: the header
    a 429/503 answer carries is EITHER delta-seconds ('120') or an
    HTTP-date ('Tue, 01 Feb 2024 00:02:00 GMT'); the reference's
    blanket 40x5s backoff (workers.py:534-554) never reads it — this
    lets the AIMD delay controller honor the server's own ask.

    Returns delay seconds from now_epoch (long): the delta value, or
    max(http-date epoch - now_epoch, 0), or NULL when unparseable
    (callers fall back to the AIMD delay). try_to_timestamp keeps the
    unparseable arm NULL instead of throwing under ANSI mode."""
    is_delta = value.rlike(r"^[0-9]{1,9}$")
    # Spark's post-3.0 parser rejects EEE in PARSE patterns (weekday
    # text is format-only), so the weekday token is stripped first —
    # it is redundant with the date anyway
    stripped = F.regexp_replace(
        F.regexp_replace(value, r" GMT$", ""), r"^[A-Za-z]{3}, ", ""
    )
    dt = F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss"))
    return (
        F.when(is_delta, value.cast("long"))
        .when(
            dt.isNotNull(),
            F.greatest(F.unix_timestamp(dt) - now_epoch, F.lit(0).cast("long")),
        )
        .otherwise(F.lit(None).cast("long"))
    )


def robots_cache_audit(
    fetches: DataFrame,
    robots_fetches: DataFrame,
    ttl_s: int = 86400,
) -> DataFrame:
    """RFC 9309 §2.4 robots-cache freshness audit: crawlers MAY cache
    robots.txt, but SHOULD NOT use a cached copy for longer than 24
    hours (the ttl_s default). Given the page-fetch log
    (host, epoch_s, fetch_id) and the observed robots-refetch log
    (host, robots_epoch_s), classify every page fetch:

      fresh   — the latest robots fetch at or before it is <= ttl old
      expired — a cached copy existed but was older than ttl (the
                crawler used stale rules; §2.4 says refetch)
      miss    — no robots fetch preceded the page fetch at all (the
                crawler never had rules for the host: a §2.3.1
                must-fetch-first violation)

    This is an AUDIT of a refetch log, not a cache simulator: the
    robots log is taken as what the crawler actually did, so each
    page fetch classifies independently (relational, replayable) —
    the sequential would-have-refetched simulation lives in the
    streaming crawl loop where state belongs.

    Scale shape: the robots log is host-cardinality × refetch-count
    (tiny vs the fetch log), so it is collapsed to one sorted array
    per host and BROADCAST; the classification is then a narrow
    array_max(filter(...)) scan over the fetch log — zero shuffle on
    the big side, one host-keyed aggregate for the output counts.

    Returns (host, n_fetches, n_fresh, n_expired, n_miss)."""
    rlog = robots_fetches.groupBy("host").agg(
        F.array_sort(F.collect_list(F.col("robots_epoch_s").cast("long"))).alias("_rts")
    )
    t = F.col("epoch_s").cast("long")
    last_robots = F.array_max(F.filter(F.col("_rts"), lambda x: x <= t))
    age = t - last_robots
    cls = (
        F.when(last_robots.isNull(), F.lit("miss"))
        .when(age <= F.lit(int(ttl_s)), F.lit("fresh"))
        .otherwise(F.lit("expired"))
    )
    audited = fetches.join(F.broadcast(rlog), on="host", how="left").select(
        "host", cls.alias("_cls")
    )
    return (
        audited.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum((F.col("_cls") == "fresh").cast("long")).alias("n_fresh"),
            F.sum((F.col("_cls") == "expired").cast("long")).alias("n_expired"),
            F.sum((F.col("_cls") == "miss").cast("long")).alias("n_miss"),
        )
    )
