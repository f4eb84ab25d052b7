"""robots.txt parsing -> the politeness dimension table.

The north rule's politeness scheduler consumes per-host budgets
"(robots.txt rules + crawl-delay budgets)"; this module produces them
from raw robots.txt bodies (the reference delegates robots handling to
its Heritrix crawler config — here it is a first-class, testable
stage feeding schedule_politeness()).

Semantics (RFC 9309 + the de-facto extensions):
  - group selection: the most specific matching User-agent line wins
    (longest agent-token substring match, '*' matches all, groups with
    multiple User-agent lines share rules);
  - Disallow/Allow prefixes collected per group (empty Disallow means
    allow-all); '$'-anchors and '*'-wildcards are kept verbatim in the
    prefix strings (schedule_politeness matches plain prefixes; a
    wildcard-aware matcher can be swapped in without changing this
    parser);
  - Crawl-delay: float seconds (non-standard but ubiquitous);
  - parse errors / non-text bodies -> permissive default (no rules,
    no delay), like every production crawler.

Spark tier: one vectorized pandas UDF `robots_udf(body, agent)` ->
struct(crawl_delay_s, disallow_prefixes, allow_prefixes, n_groups),
so a fetched robots.txt table becomes the broadcast `robots` dimension
in one select.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sandcrawler_spark.functions.extract_text import decode_body_py

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("crawl_delay_s", T.DoubleType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("n_groups", T.IntegerType()),
    ]
)


def parse_robots_py(text: str, agent: str = "*") -> dict:
    """robots.txt text -> rules for `agent` (most specific group wins)."""
    groups: list[dict] = []
    cur: dict | None = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "disallow": [], "allow": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any User-agent line: ignored
        if field == "disallow":
            if value:
                cur["disallow"].append(value)
        elif field == "allow":
            if value:
                cur["allow"].append(value)
        elif field == "crawl-delay":
            try:
                cur["delay"] = float(value)
            except ValueError:
                pass

    agent_l = agent.lower()
    best = None
    best_len = -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best, best_len = g, match_len
    if best is None:
        return {"crawl_delay_s": None, "disallow_prefixes": [], "allow_prefixes": [],
                "n_groups": len(groups)}
    return {
        "crawl_delay_s": best["delay"],
        "disallow_prefixes": list(best["disallow"]),
        "allow_prefixes": list(best["allow"]),
        "n_groups": len(groups),
    }


def _rule_regex_col(p):
    """robots rule pattern -> anchored Java/RE2 regex, pure Catalyst:
    escape regex specials, '*' -> '.*', a trailing '$' anchors, and
    the whole pattern is prefix-anchored with '^'. Runs over the
    host-cardinality rules dimension, never the URL stream."""
    esc = F.regexp_replace(p, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    anchored = F.when(
        p.endswith("$"),
        F.concat(F.substring(esc, F.lit(1), F.length(esc) - 2), F.lit("$")),
    ).otherwise(esc)
    return F.concat(F.lit("^"), anchored)


def robots_disallowed_col(path, disallow_prefixes, allow_prefixes=None):
    """RFC 9309 §2.2.2 rule matching as a Catalyst column: '*' matches
    any run, '$' anchors the end, and among all rules matching the
    path the LONGEST pattern wins, Allow beating Disallow on ties
    (the de-facto Google semantics). Returns a boolean: true iff the
    winning rule is a Disallow. No matching rule -> allowed.

    Rule regexes are built per rules-array element — the arrays live
    on the broadcast robots dimension (one row per host), so the
    regexp construction cost is host-cardinality, not URL-cardinality.
    """
    dis = F.coalesce(disallow_prefixes, F.array().cast("array<string>"))
    alw = (
        F.coalesce(allow_prefixes, F.array().cast("array<string>"))
        if allow_prefixes is not None
        else F.array().cast("array<string>")
    )
    tag = lambda arr, is_allow: F.transform(  # noqa: E731
        arr,
        lambda r: F.struct(
            F.length(r).alias("rule_len"),
            F.lit(is_allow).alias("is_allow"),
            _rule_regex_col(r).alias("rx"),
        ),
    )
    rules = F.concat(tag(dis, 0), tag(alw, 1))
    matched = F.filter(rules, lambda r: F.rlike(path, r["rx"]))
    best = F.array_max(matched)  # struct order: rule_len, then is_allow
    full = F.when(F.size(matched) > 0, best["is_allow"] == 0).otherwise(F.lit(False))
    # Hot-path guard: a non-literal rlike pattern recompiles per row,
    # so hosts whose rules are plain prefixes with no Allow overrides
    # (the overwhelming majority, and the whole bench frontier) take
    # the cheap startswith path — identical verdict there, since with
    # disallow-only plain prefixes longest-match == any-match. The
    # CASE evaluates lazily per row; only wildcard/Allow hosts pay
    # for regex construction.
    needs_regex = (F.size(alw) > 0) | F.exists(
        dis, lambda r: r.contains("*") | r.contains("$")
    )
    simple = F.exists(dis, lambda r: path.startswith(r))
    return F.when(needs_regex, full).otherwise(simple)


@F.pandas_udf(ROBOTS_SCHEMA)
def robots_udf(body: pd.Series, agent: pd.Series) -> pd.DataFrame:  # pragma: no cover - via Spark
    rows = []
    for b, a in zip(body, agent):
        if b is None:
            rows.append({"crawl_delay_s": None, "disallow_prefixes": [],
                         "allow_prefixes": [], "n_groups": 0})
            continue
        try:
            text = decode_body_py(bytes(b)) if isinstance(b, (bytes, bytearray)) else str(b)
            rows.append(parse_robots_py(text, a or "*"))
        except Exception:
            rows.append({"crawl_delay_s": None, "disallow_prefixes": [],
                         "allow_prefixes": [], "n_groups": 0})
    return pd.DataFrame(rows, columns=[f.name for f in ROBOTS_SCHEMA.fields])


def robots_table(
    fetched: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "sandcrawler",
    default_max_parallel: int = 2,
    status_col: str | None = None,
) -> DataFrame:
    """(host, robots.txt body) rows -> the politeness dimension table
    (host, max_parallel, crawl_delay_s, disallow_prefixes,
    allow_prefixes).

    When `status_col` names the robots-fetch HTTP status, RFC 9309
    §2.3.1 access semantics apply:
      - "unavailable" (400-499): allow all — rules and delay dropped;
      - "unreachable" (500-599): complete disallow (rules = ['/']) —
        a failing server must not be hammered;
      - anything else (2xx, or no status column): parse the body.
    """
    parsed = fetched.select(
        F.col(host_col).alias("host"),
        *([F.col(status_col).alias("_status")] if status_col else []),
        robots_udf(F.col(body_col), F.lit(agent)).alias("_r"),
    )
    delay = F.col("_r.crawl_delay_s")
    dis = F.col("_r.disallow_prefixes")
    alw = F.col("_r.allow_prefixes")
    if status_col:
        s = F.col("_status")
        unavailable = (s >= 400) & (s < 500)
        unreachable = (s >= 500) & (s < 600)
        empty = F.array().cast("array<string>")
        delay = F.when(unavailable, F.lit(None).cast("double")).otherwise(delay)
        dis = (
            F.when(unavailable, empty)
            .when(unreachable, F.array(F.lit("/")))
            .otherwise(dis)
        )
        alw = F.when(unavailable | unreachable, empty).otherwise(alw)
    return parsed.select(
        "host",
        F.lit(default_max_parallel).alias("max_parallel"),
        delay.alias("crawl_delay_s"),
        dis.alias("disallow_prefixes"),
        alw.alias("allow_prefixes"),
    )
