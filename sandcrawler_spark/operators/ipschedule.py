"""IP-level politeness: virtual-host collapse before scheduling.

A polite crawler must throttle per server ADDRESS, not per hostname —
shared hosting puts many hostnames behind one IP, and a host-keyed
scheduler multiplies the intended per-server rate by the number of
co-hosted names. The reference throttles per origin host only
(/root/reference/python/sandcrawler/workers.py:534-554 backpressure
loop); production crawlers (Heritrix queue-assignment policies,
IRLbot's budgeting) add the IP-level queue on top. Here that layer is
a first-class operator:

  1. resolve each distinct host to an address (deterministic stub DNS
     in this sandbox — no network; the resolution column is the swap
     boundary for a real resolver),
  2. broadcast the tiny host→ip dimension back onto the frontier
     (hosts are ~10^7 at web scale: well inside broadcast range, and
     the map is computed from DISTINCT hosts so the expensive step is
     a near-free distinct over an already host-partitioned frontier),
  3. run the production skew-safe politeness scheduler keyed on ip —
     co-hosted names now share one quota/round budget.

Scale shape: one distinct over hosts + one broadcast join + the same
hot/cold salted ranking schedule_politeness always does. No new
shuffle wider than the host distinct; the ranking key (ip) is
strictly coarser than host, so the hot-key split matters MORE here —
a big shared-hosting IP is the canonical hot key.

The stub DNS is engine-portable (md5-hexchar arithmetic) so a SQL
oracle can recompute the full schedule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resolve_ip_col(host: Column, n_ips: int = 16) -> Column:
    """Deterministic stub resolver: ip_id = (ascii(md5[0])*16 +
    ascii(md5[1])) mod n_ips. Many-to-one by construction, so shared
    hosting (several hosts on one address) actually occurs in any
    fixture with more than n_ips hosts. Swap this single column
    expression for a real resolver table at deploy time."""
    h = F.md5(host)
    code = F.ascii(F.substring(h, 1, 1)) * 16 + F.ascii(F.substring(h, 2, 1))
    return F.pmod(code, F.lit(n_ips)).cast("int")


def host_ip_table(frontier: DataFrame, host_col: str = "host", n_ips: int = 16) -> DataFrame:
    """The DNS dimension: one row per distinct host with its resolved
    ip_id and dotted-quad. Distinct first so resolution cost is
    O(hosts), not O(urls)."""
    return (
        frontier.select(host_col)
        .distinct()
        .select(
            F.col(host_col),
            resolve_ip_col(F.col(host_col), n_ips).alias("ip_id"),
        )
        .withColumn("ip", F.concat(F.lit("10.0.0."), F.col("ip_id").cast("string")))
    )


def schedule_by_ip(
    frontier: DataFrame,
    host_col: str = "host",
    prio_col: str = "priority",
    n_ips: int = 16,
    round_window_s: float = 60.0,
    hot_threshold: int = 2_000_000,
) -> DataFrame:
    """Politeness schedule with virtual-host collapse: frontier rows
    (url, host, priority) are keyed by resolved ip and scheduled by
    the production skew-safe scheduler with a per-IP budget
    (max_parallel = 2 + ip_id % 3 in the stub dimension — in
    production this comes from per-server capacity config). Output
    adds (ip, quota, crawl_round, seq_in_round); co-hosted hostnames
    share rounds, so no address ever sees more than quota fetches per
    round regardless of how many names point at it."""
    from sandcrawler_spark.operators.politeness import schedule_politeness

    dns = host_ip_table(frontier, host_col, n_ips)
    fr = frontier.join(F.broadcast(dns), on=host_col, how="inner")
    budgets = (
        dns.select("ip", "ip_id")
        .distinct()
        .select(
            F.col("ip").alias("host"),
            (F.lit(2) + F.col("ip_id") % 3).cast("int").alias("max_parallel"),
            F.lit(0.5).alias("crawl_delay_s"),
            F.array().cast("array<string>").alias("disallow_prefixes"),
        )
    )
    # schedule_politeness reads the dimension's key from its literal
    # "host" column and re-aliases it to host_col, so budgets keep the
    # name "host" even though the value is an ip
    sched = schedule_politeness(
        fr.select("url", host_col, "ip", prio_col),
        budgets,
        host_col="ip",
        prio_col=prio_col,
        round_window_s=round_window_s,
        hot_threshold=hot_threshold,
    )
    return sched


def cdn_flag_col(ip_id) -> "Column":
    """Stub CDN-membership predicate: an address belongs to a CDN when
    ip_id % 5 == 0. In production this is a broadcast join against a
    CDN ASN/prefix table (public route datasets); one boolean column is
    the swap boundary."""
    return (ip_id % 5 == 0)


def schedule_cdn_aware(
    frontier: DataFrame,
    host_col: str = "host",
    prio_col: str = "priority",
    n_ips: int = 16,
    round_window_s: float = 60.0,
    hot_threshold: int = 2_000_000,
) -> DataFrame:
    """Politeness with CDN-aware key selection. Pure IP collapse
    (schedule_by_ip) is WRONG for CDN edges: thousands of unrelated
    hosts resolve to one CDN address that is engineered for fan-out,
    so keying them together starves the frontier. Production crawlers
    (Heritrix's queue-assignment-policy with ip-based queues plus a
    CDN exception list) throttle CDN-served hosts per HOSTNAME and
    origin servers per ADDRESS. Here:

        sched_key = 'h:' || host   if ip is in the CDN set
                    'ip:' || ip    otherwise

    (the prefixes keep the two key spaces disjoint), with per-key
    budgets: CDN-hosted names get the default host quota (4), shared
    origin IPs get the per-server quota (2 + ip_id % 3). Same
    skew-safe scheduler downstream; same scale shape as schedule_by_ip
    plus one CASE."""
    from sandcrawler_spark.operators.politeness import schedule_politeness

    dns = host_ip_table(frontier, host_col, n_ips).withColumn(
        "is_cdn", cdn_flag_col(F.col("ip_id"))
    )
    fr = frontier.join(F.broadcast(dns), on=host_col, how="inner").withColumn(
        "sched_key",
        F.when(F.col("is_cdn"), F.concat(F.lit("h:"), F.col(host_col))).otherwise(
            F.concat(F.lit("ip:"), F.col("ip"))
        ),
    )
    # budgets from the DNS dimension (one row per host), not the
    # frontier: key space = cdn hosts + distinct origin ips, tiny
    budgets = (
        dns.select(
            F.when(F.col("is_cdn"), F.concat(F.lit("h:"), F.col(host_col)))
            .otherwise(F.concat(F.lit("ip:"), F.col("ip")))
            .alias("sched_key"),
            "ip_id",
            "is_cdn",
        )
        .distinct()
        .select(
            F.col("sched_key").alias("host"),
            F.when(F.col("is_cdn"), F.lit(4))
            .otherwise(F.lit(2) + F.col("ip_id") % 3)
            .cast("int")
            .alias("max_parallel"),
            F.lit(0.5).alias("crawl_delay_s"),
            F.array().cast("array<string>").alias("disallow_prefixes"),
        )
    )
    return schedule_politeness(
        fr.select("url", host_col, "ip", "is_cdn", "sched_key", prio_col),
        budgets,
        host_col="sched_key",
        prio_col=prio_col,
        round_window_s=round_window_s,
        hot_threshold=hot_threshold,
    )
