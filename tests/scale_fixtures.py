"""Shared replicated-data fixtures for the scale-smoke family
(test_scale_smoke*.py — split in r13, VERDICT r12 #3). Module-scoped in
each consuming file; construction is one localCheckpoint of a
replicated sf0.001 table, cheap enough to pay per file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.io import load_table
from tests.conftest import SF_DIR

REPS = 10


@pytest.fixture(scope="module")
def big_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
    )
    return big.localCheckpoint()


@pytest.fixture(scope="module")
def big_docs_r6(spark):
    """documents replicated with disjoint doc_id spaces (same texts →
    term statistics scale by exactly REPS)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source", "lang"
    )
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
        "source",
        "lang",
    )
    return big.localCheckpoint()
