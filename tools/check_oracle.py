"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at the same
sf dir; compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json ORACLE_SWEEP_r4.json [sf_dir]
           (also writes the per-query results as a JSON artifact — the
           committed full-sweep correctness receipt VERDICT r3 asked
           for, so every query has a current-round record even when
           the driver samples)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as entrymod
    from sandcrawler_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"ok": False, "err": f"spark: {type(e).__name__}"}
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            results[name] = {"ok": True, "rows_only": True, "spark_rows": len(srows)}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # the driver may pull DuckDB results through pandas/Arrow,
            # where HUGEINT-family columns degrade to float64 and
            # stringify differently than Spark longs even when every
            # VALUE is identical (r3's only red row, cumulative_events,
            # was exactly this: an uncast windowed SUM(BIGINT)).
            # fetchall() masks it — so fail on the TYPE here.
            otypes = [str(t) for t in con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0").types]
            bad_t = [
                (c, t) for c, t in zip(ocols, otypes)
                if t in ("HUGEINT", "UHUGEINT", "UBIGINT")
            ]
            if bad_t:
                print(
                    f"FAIL  {name}: oracle column(s) {bad_t} are 128-bit/unsigned "
                    "ints — pandas degrades these to float64; CAST to BIGINT"
                )
                results[name] = {"ok": False, "err": f"hugeint cols: {bad_t}"}
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"ok": False, "err": f"duckdb: {type(e).__name__}: {str(e)[:200]}"}
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_hash = ok_cols and ok_count and value_hash(scols, srows) == value_hash(ocols, orows)
        results[name] = {
            "ok": bool(ok_cols and ok_count and ok_hash),
            "rows_match": ok_count, "schema_match": ok_cols, "hash_match": ok_hash,
            "spark_rows": len(srows), "oracle_rows": len(orows),
            "spark_s": round(spark_s, 2),
        }
        if ok_cols and ok_count and ok_hash:
            print(f"OK    {name}: {len(srows)} rows [{spark_s:.1f}s]")
        else:
            failures += 1
            print(
                f"FAIL  {name}: cols={ok_cols} ({sorted(scols)} vs {sorted(ocols)}) "
                f"count={ok_count} ({len(srows)} vs {len(orows)}) hash={ok_hash}"
            )
            if ok_cols and ok_count and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(_norm_cell(r[i]) for i in order) for r in srows)
                oset = sorted("|".join(_norm_cell(r[i]) for i in oorder) for r in orows)
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diff:
                    print(f"        spark: {a[:160]}\n        duck : {b[:160]}")
    print("failures:", failures)
    if json_out is not None:
        import json as _json

        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_failures": failures,
            "results": results,
        }
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1, default=str)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
