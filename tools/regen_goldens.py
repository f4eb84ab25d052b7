"""Rebuild the persisted seed=42 corpus parquet fixture
(fixtures/corpus_seed42/) after an intentional corpus/extractor change.

Since round 3 the four corpus queries (fetch_statuses,
extraction_roundtrip, grobid_hook, revisit_resolution) have TRUE DuckDB
twins over this fixture — there are no frozen VALUES goldens left to
regenerate. This tool now just (a) rebuilds the fixture from scratch and
(b) prints the current Spark-side output of those queries for eyeball
comparison.

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_QUERIES = ["fetch_statuses", "extraction_roundtrip", "grobid_hook", "revisit_resolution"]


def main() -> None:
    import __spark_entry__ as em
    from sandcrawler_spark.session import get_spark

    fixture = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", "corpus_seed42")
    if os.path.isdir(fixture):
        shutil.rmtree(fixture)
    print("rebuilt fixture:", em._corpus_dir())

    spark = get_spark("regen_goldens")
    sf = "/root/testdata/sf0.01"
    for name in CORPUS_QUERIES:
        df = em.queries()[name](spark, sf)
        print(f"=== {name} {df.columns}")
        for row in df.collect():
            print(tuple(row))


if __name__ == "__main__":
    main()
