"""Persistence plans: snapshot-versioned keyed tables (Iceberg-style
MERGE / time-travel / lineage on plain parquet) + metrics."""
