"""sandcrawler_spark — a from-scratch, PySpark-native rebuild of the
capabilities of bnewbold/sandcrawler (Internet Archive scholarly-web
ingest pipeline).

This is NOT a port: the reference is a Kafka/Hadoop/HBase dataflow
system; this package re-expresses the same *semantics* (URL frontier,
URL-seen de-dupe, per-host politeness, fetch simulation, vectorized
extraction, keyed upsert persistence, scoring joins) as declarative
DataFrame plans so Catalyst/Tungsten/AQE pick the physical strategy.

Layout:
  functions/  — scalar/vectorized column functions (URL canon, hashes,
                mimetype, CDX parsing, text extraction, biblio, slug)
  sources/    — synthetic page corpus generator + CDX line scan
  operators/  — frontier, seen-set (bloom + anti-join), politeness,
                fetch/hop-loop, best-capture ranking, dedupe, ANN,
                scoring joins
  plans/      — snapshot-versioned keyed tables (Iceberg-equivalent
                MERGE / lineage / metrics on plain parquet)
  streaming/  — micro-batch crawl rounds with checkpoint/resume
"""

__version__ = "0.1.0"

from sandcrawler_spark.session import get_spark  # noqa: F401
