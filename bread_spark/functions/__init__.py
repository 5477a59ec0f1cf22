"""Scalar/text function library — all JVM-side expressions, no Python UDFs
in any hot path (SURVEY.md §2.10: the reference's Series.apply row functions
all map to native Spark expressions)."""
