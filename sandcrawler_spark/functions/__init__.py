"""Column-level function library (Spark-first; pandas UDFs only where
built-ins genuinely cannot express the semantics)."""
