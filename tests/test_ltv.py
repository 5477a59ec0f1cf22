"""Customer-lifetime analytics — hand-computed pins on constructed
order frames; full-result correctness rides the DuckDB oracle."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from bread_spark.extensions import ltv as L


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_custkey bigint, o_orderkey bigint, o_orderdate timestamp, o_totalprice double"
    )


def test_revenue_cohorts_exact_month_arithmetic(spark):
    """Cohort month = the customer's FIRST order month; offsets are
    exact year*12+month integer deltas (a Dec->Jan boundary is offset
    1, never a float months_between artifact)."""
    rows = [
        # customer 1: first order Dec 2019, second Jan 2020 -> offset 1
        (1, 10, datetime(2019, 12, 15), 100.00),
        (1, 11, datetime(2020, 1, 2), 50.50),
        # customer 2: both orders in Dec 2019 -> offset 0 twice
        (2, 20, datetime(2019, 12, 1), 10.00),
        (2, 21, datetime(2019, 12, 30), 20.00),
    ]
    df = L.revenue_cohorts_df(
        _orders(spark, rows).select("o_custkey", "o_orderdate", "o_totalprice")
    )
    got = {
        (str(r.cohort_month), r.month_offset): (r.n_customers, r.n_orders, r.revenue)
        for r in df.collect()
    }
    assert got == {
        ("2019-12-01", 0): (2, 3, 130.0),   # c1's 100 + c2's 10+20
        ("2019-12-01", 1): (1, 1, 50.5),
    }


def test_interarrival_gaps_deterministic_tiebreak(spark):
    """Gaps are exact integer days over (orderdate, orderkey) order;
    same-day orders yield a 0-day gap counted once."""
    orders = _orders(
        spark,
        [
            (1, 1, datetime(2020, 1, 1), 1.0),
            (1, 2, datetime(2020, 1, 11), 1.0),   # gap 10
            (1, 3, datetime(2020, 1, 11), 1.0),   # same day: gap 0
            (2, 4, datetime(2020, 3, 1), 1.0),    # single order: no gap
        ],
    ).select("o_custkey", "o_orderkey", "o_orderdate")
    cust = spark.createDataFrame(
        [(1, 0), (2, 0)], "c_custkey bigint, c_nationkey int"
    )
    nation = spark.createDataFrame([(0, "N0")], "n_nationkey int, n_name string")
    rows = L.interarrival_df(orders, cust, nation).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.nation, r.n_gaps, r.mean_gap_days) == ("N0", 2, 5)  # (10+0) div 2


@pytest.mark.nightly
def test_revenue_cohorts_mass_conservation(spark, sf_dir):
    """The triangle's total revenue equals the orders table's total
    (cents-exact), and every offset is non-negative."""
    from bread_spark.io import load_table

    df = L.revenue_cohorts(spark, sf_dir)
    total = df.agg(F.round(F.sum("revenue"), 2)).collect()[0][0]
    orders = load_table(spark, sf_dir, "orders")
    expect = orders.agg(
        F.round(
            F.expr(
                "CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
                " / 100.0"
            ),
            2,
        )
    ).collect()[0][0]
    assert abs(total - expect) < 0.02  # rounded-per-cell re-sum tolerance
    assert df.filter(F.col("month_offset") < 0).count() == 0


def test_order_gap_survival_hand_computed(spark):
    """Gaps 0, 10, 30, 100 days: S(0)=1e6 (4/4), week 1 (>=7d) keeps
    3/4 = 750_000, week 2 (>=14d) keeps 2/4, week 5 (>=35d) keeps 1/4,
    and the 100-day gap lands in the absorbing last bucket so S(13)
    is still 250_000; every silent week is an explicit row."""
    gaps = spark.createDataFrame(
        [(1, 0), (1, 10), (2, 30), (3, 100)], "o_custkey bigint, gap_days int"
    )
    from bread_spark.extensions.ltv import order_gap_survival_df

    rows = {r.week: r for r in order_gap_survival_df(spark, gaps).collect()}
    assert len(rows) == 14
    assert rows[0].survival_ppm == 1_000_000
    assert rows[1].survival_ppm == 750_000
    assert rows[2].survival_ppm == 500_000
    assert rows[5].survival_ppm == 250_000
    assert rows[13].survival_ppm == 250_000
    assert rows[13].n_bucket == 1          # the 100-day tail absorbed
    assert rows[4].n_bucket == 1           # 30d -> week 4
    assert all(r.n_surviving >= 0 for r in rows.values())


def test_revenue_cohorts_incremental_equals_batch_with_cohort_move(spark):
    """The splice equals the batch triangle even when the new batch
    contains an EARLIER order that moves a customer's cohort month
    (their whole history re-cells inside the affected recompute), a
    brand-new customer, and an untouched customer whose cells must
    survive unmodified."""
    from bread_spark.extensions.ltv import (
        revenue_cohorts_df,
        revenue_cohorts_incremental_df,
    )

    base = _orders(
        spark,
        [
            (1, 10, datetime(2020, 3, 5), 100.0),   # c1: cohort Mar... until the move
            (1, 11, datetime(2020, 4, 1), 40.0),
            (2, 20, datetime(2020, 1, 1), 10.0),    # c2: untouched
        ],
    ).select("o_custkey", "o_orderdate", "o_totalprice")
    new = _orders(
        spark,
        [
            (1, 12, datetime(2020, 1, 15), 7.0),    # EARLIER: c1 cohort -> Jan
            (3, 30, datetime(2020, 5, 2), 99.0),    # brand-new customer
        ],
    ).select("o_custkey", "o_orderdate", "o_totalprice")

    batch = revenue_cohorts_df(base.unionByName(new))
    incr = revenue_cohorts_incremental_df(base, new)
    key = ["cohort_month", "month_offset"]
    b = {tuple(r[k] for k in key): (r.n_customers, r.n_orders, r.revenue)
         for r in batch.collect()}
    i = {tuple(r[k] for k in key): (r.n_customers, r.n_orders, r.revenue)
         for r in incr.collect()}
    assert b == i
    # the move really happened: c1 now contributes to the Jan cohort
    # at offsets 0 (Jan 15), 2 (Mar), 3 (Apr)
    from datetime import date
    assert (date(2020, 1, 1), 2) in i
