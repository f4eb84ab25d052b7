"""Memento TimeMap export (RFC 7089): serialize a URL's capture
history as the application/link-format TimeMap a Memento client
(or the Wayback replay UI the reference fetches through,
`python/sandcrawler/ia.py` WaybackClient) pages over:

    <http://a.example/>; rel="original",
    <http://archive.example/web/20010321/http://a.example/>;
      rel="first memento"; datetime="Wed, 21 Mar 2001 00:00:00 GMT", ...

rel values follow RFC 7089 §5.1.2: the earliest memento is
"first memento", the latest "last memento", interior ones "memento",
and a single-capture URL collapses to "first last memento". The
datetime attribute is an IMF-fixdate rendered with INTEGER civil-date
arithmetic (the Hinnant days-from-civil formula httpdate.py already
twins) — no JVM date formatter, no locale dependence, and the DuckDB
oracle replays the same integer ops.

Scale shape: one per-URL sorted collect of (ts, link) structs —
bounded by per-URL capture count, the same group shape as
lookup_best — then a codegen string fold. No window over the global
index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sandcrawler_spark.functions.httpdate import _MONTHS, _days_from_civil

_DOWS = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]


def imf_fixdate_from_cdx(dt14: Column) -> Column:
    """14-digit CDX timestamp -> IMF-fixdate ('Wed, 21 Mar 2001
    00:00:00 GMT'). Day-of-week = (days_since_epoch + 4) mod 7
    (1970-01-01 was a Thursday); CDX timestamps are post-1970 so the
    modulus sees only non-negative days."""
    y = F.substring(dt14, 1, 4).cast("int")
    mo = F.substring(dt14, 5, 2).cast("int")
    d = F.substring(dt14, 7, 2).cast("int")
    days = _days_from_civil(y, mo, d)
    dow = F.pmod(days + 4, F.lit(7)).cast("int")
    dow_name = F.lit(None).cast("string")
    for i, n in enumerate(_DOWS):
        dow_name = F.when(dow == i, F.lit(n)).otherwise(dow_name)
    mon_name = F.lit(None).cast("string")
    for i, n in enumerate(_MONTHS, start=1):
        mon_name = F.when(mo == i, F.lit(n)).otherwise(mon_name)
    return F.concat(
        dow_name, F.lit(", "), F.substring(dt14, 7, 2), F.lit(" "),
        mon_name, F.lit(" "), F.substring(dt14, 1, 4), F.lit(" "),
        F.substring(dt14, 9, 2), F.lit(":"), F.substring(dt14, 11, 2),
        F.lit(":"), F.substring(dt14, 13, 2), F.lit(" GMT"),
    )


def timemap_export(
    captures: DataFrame,
    url_col: str = "url",
    dt_col: str = "datetime",
    replay_prefix: str = "https://web.archive.example/web/",
) -> DataFrame:
    """(url, n_mementos, timemap) — one link-format TimeMap per URL,
    mementos in timestamp order, ',\\n' joined (RFC 7089 examples'
    layout), rel per §5.1.2."""
    mem = captures.select(
        F.col(url_col).alias("url"),
        F.struct(
            F.col(dt_col).alias("ts"),
            F.concat(
                F.lit("<" + replay_prefix), F.col(dt_col), F.lit("/"),
                F.col(url_col), F.lit('>; datetime="'),
                imf_fixdate_from_cdx(F.col(dt_col)), F.lit('"'),
            ).alias("lk"),
        ).alias("_m"),
    )
    g = mem.groupBy("url").agg(
        F.array_sort(F.collect_list("_m")).alias("_ms"),
        F.count("*").cast("long").alias("n_mementos"),
    )
    n = F.size("_ms")
    # rel depends on position within the sorted memento array
    rel = lambda i: (
        F.when((i == 0) & (i == n - 1), F.lit("first last memento"))
        .when(i == 0, F.lit("first memento"))
        .when(i == n - 1, F.lit("last memento"))
        .otherwise(F.lit("memento"))
    )
    links = F.transform(
        F.col("_ms"),
        lambda m, i: F.concat(
            F.regexp_extract(m["lk"], r"^(<[^>]*>)", 1),
            F.lit('; rel="'), rel(i), F.lit('"; '),
            F.regexp_extract(m["lk"], r"(datetime=\"[^\"]*\")", 1),
        ),
    )
    timemap = F.concat(
        F.lit("<"), F.col("url"), F.lit('>; rel="original",\n'),
        F.array_join(links, ",\n"),
    )
    return g.select("url", "n_mementos", timemap.alias("timemap"))


def timemap_oracle_sql(caps_sql: str, replay_prefix: str = "https://web.archive.example/web/") -> str:
    """DuckDB twin over a (url, datetime) relation: same integer
    civil-date fixdate, same rel rules, string_agg in ts order."""
    months = " ".join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(_MONTHS, start=1))
    dows = " ".join(f"WHEN {i} THEN '{d}'" for i, d in enumerate(_DOWS))
    y, mo, d = "CAST(substr(datetime,1,4) AS INT)", "CAST(substr(datetime,5,2) AS INT)", "CAST(substr(datetime,7,2) AS INT)"
    yy = f"(({y}) - CASE WHEN ({mo}) <= 2 THEN 1 ELSE 0 END)"
    era = f"CAST({yy} // 400 AS BIGINT)"
    yoe = f"(CAST({yy} AS BIGINT) - {era} * 400)"
    mp = f"(CASE WHEN ({mo}) > 2 THEN ({mo}) - 3 ELSE ({mo}) + 9 END)"
    doy = f"((CAST({mp} AS BIGINT) * 153 + 2) // 5 + ({d}) - 1)"
    doe = f"({yoe} * 365 + {yoe} // 4 - {yoe} // 100 + {doy})"
    days = f"({era} * 146097 + {doe} - 719468)"
    fix = (
        f"(CASE ({days} + 4) % 7 {dows} END) || ', ' || substr(datetime,7,2)"
        f" || ' ' || (CASE ({mo}) {months} END) || ' ' || substr(datetime,1,4)"
        f" || ' ' || substr(datetime,9,2) || ':' || substr(datetime,11,2)"
        f" || ':' || substr(datetime,13,2) || ' GMT'"
    )
    return f"""
WITH _tm_caps AS ({caps_sql}),
_tm_pos AS (
  SELECT url, datetime,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY datetime) AS rn,
         COUNT(*) OVER (PARTITION BY url) AS cnt,
         {fix} AS fixdate
  FROM _tm_caps
),
_tm_links AS (
  SELECT url, rn, cnt,
         '<{replay_prefix}' || datetime || '/' || url || '>; rel="'
         || CASE WHEN cnt = 1 THEN 'first last memento'
                 WHEN rn = 1 THEN 'first memento'
                 WHEN rn = cnt THEN 'last memento'
                 ELSE 'memento' END
         || '"; datetime="' || fixdate || '"' AS link
  FROM _tm_pos
)
SELECT url, CAST(cnt AS BIGINT) AS n_mementos,
       '<' || url || '>; rel="original",' || chr(10)
       || string_agg(link, ',' || chr(10) ORDER BY rn) AS timemap
FROM _tm_links GROUP BY url, cnt
""".strip()
