"""Print the current output of the four GOLDEN-oracle queries
(fetch_statuses, extraction_roundtrip, grobid_hook, revisit_resolution)
so the frozen VALUES tables in __spark_entry__.oracle_sql() can be
refreshed after an intentional engine/corpus change.

The goldens are sf-independent: these queries read only the seed=42
synthetic corpus, never the driver tables.

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = ["fetch_statuses", "extraction_roundtrip", "grobid_hook", "revisit_resolution"]


def main() -> None:
    import __spark_entry__ as em
    from sandcrawler_spark.session import get_spark

    spark = get_spark("regen_goldens")
    sf = "/root/testdata/sf0.01"
    for name in GOLDEN_QUERIES:
        df = em.queries()[name](spark, sf)
        print(f"=== {name} {df.columns}")
        for r in sorted(df.collect()):
            print(tuple(r))
    spark.stop()


if __name__ == "__main__":
    main()
