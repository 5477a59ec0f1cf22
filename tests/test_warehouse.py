"""Warehouse decision-support suite — semantics pins for the three
queries whose logic goes beyond a single join-aggregate (Q21's
solely-to-blame EXISTS/NOT-EXISTS, Q17's integer small-quantity
threshold, Q22's exact scalar balance threshold), each on constructed
frames with hand-computed expectations and an explicit boundary row.
The full-result correctness of all 13 entries rides the DuckDB oracle
differential (test_oracle.py, auto-parameterized)."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from bread_spark.extensions import warehouse as W


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_blamed_lines_solely_late_semantics(spark):
    """Blame requires: the line is late, ANOTHER supplier exists in the
    order, and NO other supplier is late. Day-30 is NOT late (strict >
    orderdate+30, the certified Q12 predicate)."""
    li = spark.createDataFrame(
        [
            # order 1: supp 10 late, supp 11 on time -> blame (1, 10)
            (1, 10, _ts("2020-03-01")),
            (1, 11, _ts("2020-01-05")),
            # order 2: both late -> nobody solely to blame
            (2, 10, _ts("2020-03-01")),
            (2, 11, _ts("2020-03-02")),
            # order 3: single supplier late -> no other supplier, no blame
            (3, 12, _ts("2020-03-01")),
            # order 4: supp 13 exactly on day 30 (NOT late), supp 14 late
            (4, 13, _ts("2020-01-31")),
            (4, 14, _ts("2020-03-01")),
        ],
        "l_orderkey bigint, l_suppkey bigint, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(k, _ts("2020-01-01")) for k in (1, 2, 3, 4)],
        "o_orderkey bigint, o_orderdate timestamp",
    )
    got = {
        (r.b_okey, r.b_skey)
        for r in W.blamed_lines_df(li, orders).collect()
    }
    assert got == {(1, 10), (4, 14)}


def test_small_lines_integer_threshold_boundary(spark):
    """qty·5·cnt < sum_qty — strict inequality on exact integers: the
    row sitting exactly at 20% of its part's mean quantity is
    EXCLUDED, with no double 0.2·avg anywhere."""
    li_b = spark.createDataFrame(
        [
            # part 1: qtys (1, 20): sum=21, cnt=2 -> 1*5*2=10 < 21 keep;
            # 20*5*2=200 not < 21 drop
            (1, 1, 100),
            (1, 20, 100),
            # part 2: qtys (2, 18): sum=20, cnt=2 -> 2*5*2=20 == 20,
            # strict < fails: the exact-boundary row is dropped
            (2, 2, 100),
            (2, 18, 100),
        ],
        "l_partkey bigint, qty bigint, price_cents bigint",
    )
    got = {(r.l_partkey, r.qty) for r in W.small_lines_df(li_b).collect()}
    assert got == {(1, 1)}


def test_idle_high_balance_exact_threshold_and_recency(spark):
    """bal·n_pos > sum_pos on cents integers: positives are 100/200/300/
    250 dollars (sum 85000 cents, n=4, mean $212.50). The $200 customer
    fails strictly, the $300 customer is rich but recently active (anti-
    joined away), the $250 idle customer is the single survivor."""
    cust = spark.createDataFrame(
        [
            (1, 0, 10000),   # $100  below mean
            (2, 0, 20000),   # $200  below mean (strictly)
            (3, 0, -5000),   # negative: not in the positive stats
            (4, 1, 30000),   # $300  rich but has a recent order
            (5, 1, 25000),   # $250  rich and idle -> survives
        ],
        "c_custkey bigint, c_nationkey int, bal_cents bigint",
    )
    recent = spark.createDataFrame([(4,)], "o_custkey bigint")
    nation = spark.createDataFrame(
        [(0, "NATION_0"), (1, "NATION_1")], "n_nationkey int, n_name string"
    )
    rows = W.idle_high_balance_df(cust, recent, nation).collect()
    assert [(r.nation, r.numcust, r.total_acctbal) for r in rows] == [
        ("NATION_1", 1, 250.0)
    ]


@pytest.mark.nightly
def test_shipping_priority_topk_ordering(spark, sf_dir):
    """Top-10 comes back revenue-descending with the orderkey
    tie-break, and orderkeys are unique."""
    rows = W.shipping_priority_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len({r.o_orderkey for r in rows}) == len(rows)


@pytest.mark.nightly
def test_market_share_ppm_bounded(spark, sf_dir):
    """Shares are exact ppm integers inside [0, 1e6]."""
    rows = W.market_share_by_year(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.mkt_share_ppm <= 1_000_000


@pytest.mark.nightly
def test_customer_order_distribution_mass(spark, sf_dir):
    """The distribution's total customer mass equals the customer
    table row count (LEFT join keeps the zero-order cohort)."""
    from bread_spark.io import load_table

    dist = W.customer_order_distribution(spark, sf_dir)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "customer").count()


def test_fulfillment_latency_hand_computed(spark):
    """Per-order first/last ship lags in exact integer days, folded
    per priority: orders at lag (first,last) = (2,10) and (4,4) give
    mean_first = 3, mean_last = 7 (truncating div)."""
    li = spark.createDataFrame(
        [
            (1, _ts("2020-01-03")), (1, _ts("2020-01-11")),  # lags 2,10
            (2, _ts("2020-02-05")),                            # lag 4,4
        ],
        "l_orderkey bigint, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(1, _ts("2020-01-01"), "1-URGENT"), (2, _ts("2020-02-01"), "1-URGENT")],
        "o_orderkey bigint, o_orderdate timestamp, o_orderpriority string",
    )
    r = W.fulfillment_latency_df(li, orders).collect()[0]
    assert (r.n_orders, r.mean_first_days, r.mean_last_days) == (2, 3, 7)
    assert r.p50_first_days == 3.0   # percentile interpolates 2..4
    assert r.p90_last_days == 9.4    # interpolates 4..10 at 0.9
