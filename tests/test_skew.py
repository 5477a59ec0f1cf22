"""Skew-mitigation helpers: salted plans must be result-identical to the
plain plans they replace."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.plans.skew import salted_distinct_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of fact rows share one hot key."""
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_equals_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "label")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_join_left_outer(skewed):
    fact, dim = skewed
    dim_holes = dim.filter(F.col("k") != 7)  # hot key unmatched
    plain = fact.join(dim_holes, "k", "left").select("k", "payload", "label")
    salted = salted_join(fact, dim_holes, "k", n_salts=4, how="left").select(
        "k", "payload", "label"
    )
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_distinct_count_exact(spark):
    df = spark.range(0, 30_000).select(
        (F.col("id") % 3).alias("g"),
        # hot group 0 sees many distinct values; duplicates everywhere
        (F.col("id") % 5000).alias("v"),
    )
    got = {r["g"]: r["n_distinct"] for r in salted_distinct_count(df, "g", "v").collect()}
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_salt_is_deterministic(skewed):
    """Content-derived salts: same input → same partition assignment
    (retry-safe, unlike rand())."""
    fact, dim = skewed
    a = salted_join(fact, dim, "k", n_salts=8)
    b = salted_join(fact, dim, "k", n_salts=8)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
