"""Market-basket mining — hand-computed pair/rule pins on constructed
frames; full-result correctness rides the DuckDB oracle differential
(auto-parameterized in test_oracle.py)."""

from __future__ import annotations

import pytest

from bread_spark.extensions import basket as B


def test_pair_counts_inside_orders_only(spark):
    """Pairs are generated inside an order with part_a < part_b; a part
    repeated on two lines of one order counts once."""
    li = spark.createDataFrame(
        [
            (1, 1), (1, 2), (1, 3),
            (2, 2), (2, 3),
            (2, 3),          # duplicate line: same part twice in order 2
            (3, 7),          # single-item order: no pairs
        ],
        "l_orderkey bigint, l_partkey bigint",
    )
    got = {
        (r.part_a, r.part_b): r.pair_count
        for r in B.pair_counts_df(B.order_part_df(li)).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_association_rules_exact_integer_scores(spark):
    """confidence_ppm and lift_micro are exact truncating-division
    integers in BOTH rule directions: A in 3 of 4 orders, B in 2, pair
    in 2 -> conf(A->B) = 2e6 div 3 = 666_666, conf(B->A) = 1e6,
    lift = 2e6*4 div 6 = 1_333_333 (same both ways)."""
    op = spark.createDataFrame(
        [
            (1, 100), (1, 200),
            (2, 100), (2, 200),
            (3, 100),
            (4, 999),  # unrelated order so N=4
        ],
        "l_orderkey bigint, l_partkey bigint",
    )
    rows = {
        (r.antecedent, r.consequent): (r.pair_count, r.confidence_ppm, r.lift_micro)
        for r in B.association_rules_df(op, n_orders=4).collect()
    }
    assert rows[(100, 200)] == (2, 666_666, 1_333_333)
    assert rows[(200, 100)] == (2, 1_000_000, 1_333_333)
    # the support-1 pairs (100,999) etc. never existed; nothing else
    assert set(rows) == {(100, 200), (200, 100)}


@pytest.mark.nightly
def test_min_support_filters_rules_not_pairs(spark, sf_dir):
    """Every emitted rule carries support >= MIN_SUPPORT, and the
    top-50 cut is the (lift, antecedent, consequent) total order."""
    rows = B.association_rules(spark, sf_dir).collect()
    assert 0 < len(rows) <= B.TOP_K
    assert all(r.pair_count >= B.MIN_SUPPORT for r in rows)
    key = [(-r.lift_micro, r.antecedent, r.consequent) for r in rows]
    assert key == sorted(key)


@pytest.mark.nightly
def test_copurchase_components_transitive_merge(spark, sf_dir):
    """a~b and b~c land in one community even when a,c never co-occur:
    every community's members share its min-part label, sizes are
    consistent, and all members appear in a support>=2 edge."""
    from bread_spark.io import load_table

    comp = B.copurchase_components(spark, sf_dir)
    rows = comp.collect()
    assert rows
    by_comm = {}
    for r in rows:
        by_comm.setdefault(r.community, []).append(r)
    for comm, members in by_comm.items():
        assert comm == min(m.l_partkey for m in members)
        assert all(m.community_size == len(members) for m in members)
    # node set == edge endpoints of the support>=2 pair graph
    op = B.order_part_df(load_table(spark, sf_dir, "lineitem"))
    pairs = B.pair_counts_df(op).filter("pair_count >= 2").collect()
    endpoints = {p.part_a for p in pairs} | {p.part_b for p in pairs}
    assert {r.l_partkey for r in rows} == endpoints
