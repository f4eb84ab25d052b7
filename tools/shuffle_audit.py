"""Runtime shuffle/spill receipt for the headline queries: how many
bytes each plan actually MOVED, not just what the plan text promised.
plan_audit.py lints the plan shape (pushdown, codegen, join strategy);
this tool measures the executed bytes via Spark's own status REST API
(jobs are tagged with setJobGroup, stages summed per query), which is
the evidence "minimize shuffles" asks for: a query whose shuffle
write is a fixed small multiple of its aggregate output — instead of
its input — stays that way at 1000x the data.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes SHUFFLE_AUDIT_r5.json (per-query bytes) and prints a table.

Thresholds: spill (memory or disk) must be ZERO for every audited
query at the bench SF — any spill at sf0.1 on a 128 GiB heap means a
partition-sizing bug that 1000x data would turn into a cliff. Shuffle
volume itself is a report (the right number depends on the operator);
the JSON artifact makes round-over-round regressions diffable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "politeness_schedule", "seen_bloom", "best_capture", "lineitem_rollup",
    "fingerprint_dedupe", "minhash_lsh", "cosine_knn", "recrawl_frontier",
    "fetch_statuses", "extraction_roundtrip",
    # r5 headline additions (bench.py HEADLINE)
    "ann_ivfpq", "host_pagerank",
]

UI = "http://localhost:4040/api/v1"  # rebound to sc.uiWebUrl at start


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[2:] or DEFAULT_QUERIES

    from sandcrawler_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("shuffle_audit", extra_conf={"spark.ui.enabled": "true"})
    qs = em.queries()
    app_id = spark.sparkContext.applicationId
    # another local app may already hold :4040 — always ask the SC
    # where its UI actually bound
    global UI
    ui_base = spark.sparkContext.uiWebUrl
    if ui_base:
        UI = f"{ui_base}/api/v1"

    results: dict[str, dict] = {}
    failures = 0
    for name in names:
        spark.catalog.clearCache()
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        wall = time.time() - t0
        sc.setJobGroup("", "")

        jobs = _get(f"/applications/{app_id}/jobs")
        stage_ids = sorted(
            {s for j in jobs if j.get("jobGroup") == name for s in j["stageIds"]}
        )
        agg = dict.fromkeys(
            ("input_bytes", "shuffle_read_bytes", "shuffle_write_bytes",
             "memory_spill_bytes", "disk_spill_bytes"), 0)
        n_tasks = 0
        for sid in stage_ids:
            try:
                attempts = _get(f"/applications/{app_id}/stages/{sid}")
            except Exception:
                continue  # skipped stage (AQE reuse): no attempt data
            for a in attempts:
                agg["input_bytes"] += a.get("inputBytes", 0)
                agg["shuffle_read_bytes"] += a.get("shuffleReadBytes", 0)
                agg["shuffle_write_bytes"] += a.get("shuffleWriteBytes", 0)
                agg["memory_spill_bytes"] += a.get("memoryBytesSpilled", 0)
                agg["disk_spill_bytes"] += a.get("diskBytesSpilled", 0)
                n_tasks += a.get("numCompleteTasks", 0)
        spilled = agg["memory_spill_bytes"] + agg["disk_spill_bytes"]
        if spilled:
            failures += 1
        results[name] = {
            "wall_s": round(wall, 2),
            "n_stages": len(stage_ids),
            "n_tasks": n_tasks,
            **{k: int(v) for k, v in agg.items()},
            "spill_free": not spilled,
        }
        mb = 1024 * 1024
        print(
            f"{'FAIL' if spilled else 'OK  '}  {name}: {wall:5.1f}s  "
            f"in={agg['input_bytes'] / mb:8.1f}MB  "
            f"shuf_w={agg['shuffle_write_bytes'] / mb:8.1f}MB  "
            f"shuf_r={agg['shuffle_read_bytes'] / mb:8.1f}MB  "
            f"spill={spilled / mb:6.1f}MB  stages={len(stage_ids)}"
        )

    out = {
        "sf_dir": sf_dir,
        "queries": results,
        "spill_failures": failures,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHUFFLE_AUDIT_r5.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"spill failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
