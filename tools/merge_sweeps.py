"""Merge per-SF check_oracle --json payloads into one round artifact.

Usage: python tools/merge_sweeps.py OUT.json main=/path/a.json heavy_sf0.1=/path/b.json
Each section keeps its full payload (sf_dir, n_queries, n_failures,
per-query results incl. spark_s), so the artifact carries both the
full-coverage leg and the 10x heavy-family leg the r4 verdict asked
for (item 3)."""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path = sys.argv[1]
    merged: dict = {}
    for spec in sys.argv[2:]:
        name, _, path = spec.partition("=")
        with open(path) as f:
            merged[name] = json.load(f)
    total_fail = sum(v.get("n_failures", 0) for v in merged.values())
    merged["summary"] = {
        "sections": {
            k: {"sf_dir": v["sf_dir"], "n_queries": v["n_queries"],
                "n_failures": v["n_failures"]}
            for k, v in merged.items() if k != "summary"
        },
        "total_failures": total_fail,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path}: "
          + ", ".join(f"{k}={v['n_queries']}q/{v['n_failures']}f"
                      for k, v in merged["summary"]["sections"].items()))
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
