"""HTTP-date parsing (RFC 7231 §7.1.1.1): the three formats a crawler
MUST accept — IMF-fixdate, legacy RFC 850, legacy asctime — to epoch
seconds, in pure integer Catalyst.

Last-Modified / Expires / Retry-After(date form) arrive in all three
shapes from real servers; the cache-plan layer (functions/cachectl.py)
and the recrawl scheduler consume them as epochs. Engine date
functions are deliberately NOT used: to_timestamp's pattern dialects
and session-timezone handling differ across engines, while the
days-from-civil formula (the era/yoe/doy integer algorithm, Hinnant's
formulation of the proleptic Gregorian count) is exact integer
arithmetic both engines evaluate identically — GMT is the only
timezone HTTP dates may carry, so no tz machinery is needed.

RFC 850 two-digit years follow the RFC 6265-style pivot: >= 70 is
19xx, else 20xx. Unparseable strings yield NULL. The pytest goldens
pin the parser against Python's email.utils.parsedate_to_datetime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

IMF_PAT = (
    r"^[A-Z][a-z]{2}, ([0-9]{2}) ([A-Z][a-z]{2}) ([0-9]{4}) "
    r"([0-9]{2}):([0-9]{2}):([0-9]{2}) GMT$"
)
RFC850_PAT = (
    r"^[A-Z][a-z]+, ([0-9]{2})-([A-Z][a-z]{2})-([0-9]{2}) "
    r"([0-9]{2}):([0-9]{2}):([0-9]{2}) GMT$"
)
ASCTIME_PAT = (
    r"^[A-Z][a-z]{2} ([A-Z][a-z]{2}) ([ 0-9][0-9]) "
    r"([0-9]{2}):([0-9]{2}):([0-9]{2}) ([0-9]{4})$"
)


def _month_num(name: Column) -> Column:
    out = F.lit(None).cast("int")
    for i, m in enumerate(_MONTHS, start=1):
        out = F.when(name == m, F.lit(i)).otherwise(out)
    return out


def _days_from_civil(y: Column, m: Column, d: Column) -> Column:
    """Hinnant days-from-civil: exact integer day count since
    1970-01-01 for proleptic-Gregorian (y,m,d). All years here are
    > 0 so the integer divisions are plain floor."""
    yy = y - (m <= 2).cast("int")
    era = F.floor(yy / 400).cast("long")
    yoe = yy.cast("long") - era * 400
    mp = F.when(m > 2, m - 3).otherwise(m + 9).cast("long")
    doy = (mp * 153 + 2) / 5
    doy = F.floor(doy).cast("long") + d.cast("long") - 1
    doe = yoe * 365 + F.floor(yoe / 4).cast("long") - F.floor(yoe / 100).cast("long") + doy
    return era * 146097 + doe - 719468


def _epoch(y: Column, m: Column, d: Column, h: Column, mi: Column, s: Column) -> Column:
    return (
        _days_from_civil(y, m, d) * 86400
        + h.cast("long") * 3600 + mi.cast("long") * 60 + s.cast("long")
    )


def http_date_cols(raw: Column) -> list[Column]:
    """[fmt, epoch_s] — fmt in ('imf','rfc850','asctime') or NULL."""

    def g(pat: str, idx: int) -> Column:
        return F.regexp_extract(raw, pat, idx)

    imf_ok = raw.rlike(IMF_PAT)
    imf = _epoch(
        g(IMF_PAT, 3).cast("int"), _month_num(g(IMF_PAT, 2)),
        g(IMF_PAT, 1).cast("int"), g(IMF_PAT, 4).cast("int"),
        g(IMF_PAT, 5).cast("int"), g(IMF_PAT, 6).cast("int"),
    )
    r850_ok = raw.rlike(RFC850_PAT)
    yy2 = g(RFC850_PAT, 3).cast("int")
    r850_y = F.when(yy2 >= 70, yy2 + 1900).otherwise(yy2 + 2000)
    r850 = _epoch(
        r850_y, _month_num(g(RFC850_PAT, 2)), g(RFC850_PAT, 1).cast("int"),
        g(RFC850_PAT, 4).cast("int"), g(RFC850_PAT, 5).cast("int"),
        g(RFC850_PAT, 6).cast("int"),
    )
    asc_ok = raw.rlike(ASCTIME_PAT)
    asc = _epoch(
        g(ASCTIME_PAT, 6).cast("int"), _month_num(g(ASCTIME_PAT, 1)),
        F.trim(g(ASCTIME_PAT, 2)).cast("int"), g(ASCTIME_PAT, 3).cast("int"),
        g(ASCTIME_PAT, 4).cast("int"), g(ASCTIME_PAT, 5).cast("int"),
    )
    fmt = (
        F.when(imf_ok, F.lit("imf"))
        .when(r850_ok, F.lit("rfc850"))
        .when(asc_ok, F.lit("asctime"))
        .otherwise(F.lit(None).cast("string"))
    )
    epoch = (
        F.when(imf_ok, imf).when(r850_ok, r850).when(asc_ok, asc)
        .otherwise(F.lit(None).cast("long"))
    )
    return [fmt.alias("fmt"), epoch.alias("epoch_s")]


def http_date_oracle_exprs(raw: str) -> tuple[str, str]:
    """(fmt_expr, epoch_expr) — the DuckDB twin over a raw-string SQL
    expression, same patterns, same integer civil-date formula."""
    months = " ".join(
        f"WHEN '{m}' THEN {i}" for i, m in enumerate(_MONTHS, start=1)
    )

    def month(e: str) -> str:
        return f"(CASE {e} {months} END)"

    def epoch(y: str, m: str, d: str, h: str, mi: str, s: str) -> str:
        # flat textual substitution of the same era/yoe/doy formula
        yy = f"(({y}) - CASE WHEN ({m}) <= 2 THEN 1 ELSE 0 END)"
        era = f"CAST({yy} // 400 AS BIGINT)"
        yoe = f"(CAST({yy} AS BIGINT) - {era} * 400)"
        mp = f"(CASE WHEN ({m}) > 2 THEN ({m}) - 3 ELSE ({m}) + 9 END)"
        doy = f"((CAST({mp} AS BIGINT) * 153 + 2) // 5 + ({d}) - 1)"
        doe = f"({yoe} * 365 + {yoe} // 4 - {yoe} // 100 + {doy})"
        days = f"({era} * 146097 + {doe} - 719468)"
        return f"({days} * 86400 + ({h}) * 3600 + ({mi}) * 60 + ({s}))"

    def g(pat: str, idx: int) -> str:
        return f"regexp_extract({raw}, '{pat}', {idx})"

    imf = epoch(
        f"CAST({g(IMF_PAT, 3)} AS INT)", month(g(IMF_PAT, 2)),
        f"CAST({g(IMF_PAT, 1)} AS INT)", f"CAST({g(IMF_PAT, 4)} AS INT)",
        f"CAST({g(IMF_PAT, 5)} AS INT)", f"CAST({g(IMF_PAT, 6)} AS INT)",
    )
    y2 = f"CAST({g(RFC850_PAT, 3)} AS INT)"
    r850 = epoch(
        f"(CASE WHEN {y2} >= 70 THEN {y2} + 1900 ELSE {y2} + 2000 END)",
        month(g(RFC850_PAT, 2)), f"CAST({g(RFC850_PAT, 1)} AS INT)",
        f"CAST({g(RFC850_PAT, 4)} AS INT)", f"CAST({g(RFC850_PAT, 5)} AS INT)",
        f"CAST({g(RFC850_PAT, 6)} AS INT)",
    )
    asc = epoch(
        f"CAST({g(ASCTIME_PAT, 6)} AS INT)", month(g(ASCTIME_PAT, 1)),
        f"CAST(trim({g(ASCTIME_PAT, 2)}) AS INT)",
        f"CAST({g(ASCTIME_PAT, 3)} AS INT)", f"CAST({g(ASCTIME_PAT, 4)} AS INT)",
        f"CAST({g(ASCTIME_PAT, 5)} AS INT)",
    )
    fmt_expr = f"""
CASE WHEN regexp_matches({raw}, '{IMF_PAT}') THEN 'imf'
     WHEN regexp_matches({raw}, '{RFC850_PAT}') THEN 'rfc850'
     WHEN regexp_matches({raw}, '{ASCTIME_PAT}') THEN 'asctime'
END""".strip()
    epoch_expr = f"""
CASE WHEN regexp_matches({raw}, '{IMF_PAT}') THEN {imf}
     WHEN regexp_matches({raw}, '{RFC850_PAT}') THEN {r850}
     WHEN regexp_matches({raw}, '{ASCTIME_PAT}') THEN {asc}
END""".strip()
    return fmt_expr, epoch_expr
