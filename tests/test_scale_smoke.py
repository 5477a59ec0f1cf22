"""Scale smoke: heavy operators on 10-20x replicated data — catches
anything accidentally quadratic (correctness of counts, not timing;
wall-clock assertions would be flaky)."""

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


def test_sessionize_scales(spark, big_events):
    from bread_spark.streaming.sessions import session_stats

    base = load_table(spark, SF_DIR, "events")
    small = session_stats(base).count()
    big = session_stats(big_events).count()
    # replicas have disjoint user spaces → sessions scale exactly linearly
    assert big == small * REPS


def test_asof_scales(spark, big_events):
    from bread_spark.operators.asof import asof_join

    purchases = (
        big_events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    out = asof_join(big_events.select("event_id", "user_id", "ts"), purchases, on="ts", by="user_id")
    # as-of join never multiplies rows
    assert out.count() == big_events.count()


def test_minhash_scales(spark):
    from bread_spark.extensions.dedup import _word_shingles, minhash_signatures

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    ).localCheckpoint()
    sigs = minhash_signatures(_word_shingles(big_docs))
    # one signature per doc regardless of duplication factor
    assert sigs.count() == big_docs.count()
    # replicated docs carry identical signatures
    n_distinct = sigs.select("signature").distinct().count()
    base_distinct = (
        minhash_signatures(_word_shingles(docs)).select("signature").distinct().count()
    )
    assert n_distinct == base_distinct
