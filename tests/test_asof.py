"""As-of join semantics: inclusivity, missing-prior NULLs, per-key
isolation — plus plan shape (one shuffle, no range blow-up)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bread_spark.operators.asof import asof_join

T0 = datetime.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "e0"), (1, _ts(10), "e1"), (1, _ts(20), "e2"), (2, _ts(10), "e3")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(20), 200.0), (2, _ts(11), 300.0)],
        "k long, ts timestamp, px double",
    )
    got = {
        r["name"]: (r["asof_ts"], r["px"])
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert got["e0"] == (None, None)          # no prior right row
    assert got["e1"] == (_ts(5), 100.0)       # most recent before 10
    assert got["e2"] == (_ts(20), 200.0)      # equal ts is inclusive
    assert got["e3"] == (None, None)          # key 2's right row is later


def test_asof_multiple_value_columns_and_keys(spark):
    left = spark.createDataFrame(
        [("a", 1, _ts(10)), ("b", 1, _ts(10))], "grp string, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", 1, _ts(3), 1.0, "x"), ("b", 1, _ts(7), 2.0, "y")],
        "grp string, k long, ts timestamp, v double, tag string",
    )
    rows = asof_join(left, right, on="ts", by=["grp", "k"]).collect()
    got = {r["grp"]: (r["v"], r["tag"], r["asof_ts"]) for r in rows}
    assert got == {"a": (1.0, "x", _ts(3)), "b": (2.0, "y", _ts(7))}


def test_asof_null_value_column_not_resurrected(spark):
    """When the matched (most recent) right row has a NULL value column,
    that NULL must be carried — not the previous non-null value. All
    carried columns must come from the SAME right row (struct carry)."""
    left = spark.createDataFrame(
        [(1, _ts(30), "e0")], "k long, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0, "old"), (1, _ts(20), None, "new")],
        "k long, ts timestamp, px double, tag string",
    )
    (row,) = asof_join(left, right, on="ts", by="k").collect()
    assert row["asof_ts"] == _ts(20)
    assert row["px"] is None          # matched row's NULL, not 100.0
    assert row["tag"] == "new"        # same row as asof_ts


def test_asof_plan_is_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    plan = (
        asof_join(left, right, on="ts", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # composition is union + window: exactly one hash exchange on the key,
    # no join operator (and so no possibility of a range-join blow-up)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# Interval (range) join
# ---------------------------------------------------------------------------

def test_interval_join_semantics(spark):
    from bread_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(30)), (3, _ts(65)), (4, _ts(200))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts(25), _ts(70)), (11, _ts(60), _ts(61))],
        "iid long, s timestamp, e timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "s", "e", bucket_seconds=3600).collect()
    )
    # point 2 ∈ [25,70]; point 3 ∈ [25,70] only (65 ∉ [60,61]); 1 & 4 nowhere
    assert got == [(2, 10), (3, 10)]


def test_interval_join_bucket_boundary(spark):
    """Intervals spanning a bucket boundary still match points in both
    buckets (the 2-bucket explode)."""
    from bread_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, _ts(59)), (2, _ts(61))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(10, _ts(58), _ts(62))], "iid long, s timestamp, e timestamp"
    )
    got = sorted(
        r["pid"]
        for r in interval_join(points, intervals, "ts", "s", "e", bucket_seconds=3600).collect()
    )
    assert got == [1, 2]
