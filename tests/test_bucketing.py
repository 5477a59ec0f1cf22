"""Bucketed-table co-located joins: bucketing on the join key at write
time removes the shuffle from every downstream join on that key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.io import load_table, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast: at test scale Catalyst would broadcast the
    # tiny dim; the bucketing win shows on the big-big join shape where
    # broadcast isn't an option (which is exactly when you bucket)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is the same as the shuffled parquet join
        plain = load_table(spark, SF_DIR, "lineitem").join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    agg = spark.table("lineitem_b").groupBy("o_orderkey").agg(
        F.sum("l_extendedprice").alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
