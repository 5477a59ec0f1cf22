"""Data-quality suite: profile semantics, tamper sensitivity, and
constraint verdicts on both clean and deliberately-broken inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bread_spark.extensions.profile import (
    _PROFILE_COLUMNS,
    constraint_checks,
    constraint_checks_df,
    table_profile,
    table_profile_df,
)
from bread_spark.io import load_table
from tests.conftest import SF_DIR


def _profile_rows(df):
    return {
        (r["table_name"], r["column_name"]): (
            r["n_rows"],
            r["n_nonnull"],
            r["n_distinct"],
            r["xor_lane"],
        )
        for r in df.collect()
    }


def test_profile_covers_declared_surface(spark):
    prof = _profile_rows(table_profile(spark, SF_DIR))
    assert set(prof) == {(t, c) for t, c, _ in _PROFILE_COLUMNS}
    # primary keys profile as fully distinct, fully non-null
    for table, col in [("orders", "o_orderkey"), ("documents", "doc_id")]:
        n_rows, n_nonnull, n_distinct, _ = prof[(table, col)]
        assert n_rows == n_nonnull == n_distinct
    # every column of one table sees the same row count
    orders_counts = {v[0] for k, v in prof.items() if k[0] == "orders"}
    assert len(orders_counts) == 1


@pytest.mark.nightly  # builds two full profiles; default tier keeps the coverage + constraint pins
def test_profile_is_partitioning_invariant(spark):
    """Counts and the XOR lane are commutative folds — shuffling input
    partitioning/order must reproduce the identical profile table."""
    orders = load_table(spark, SF_DIR, "orders")
    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")
    base = _profile_rows(table_profile_df(orders, docs, events))
    shuffled = _profile_rows(
        table_profile_df(
            orders.repartition(7, "o_custkey").sortWithinPartitions(
                F.desc("o_orderkey")
            ),
            docs.repartition(5),
            events.repartition(9, "user_id"),
        )
    )
    assert base == shuffled


@pytest.mark.nightly  # builds two full profiles; tamper sensitivity is certification, not smoke
def test_profile_detects_single_value_tamper(spark):
    """Perturbing one double in one column must move exactly that
    column's fingerprint (counts unchanged; sibling columns unchanged)."""
    orders = load_table(spark, SF_DIR, "orders")
    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")
    tampered = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == 1, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    a = _profile_rows(table_profile_df(orders, docs, events))
    b = _profile_rows(table_profile_df(tampered, docs, events))
    assert a[("orders", "o_totalprice")][3] != b[("orders", "o_totalprice")][3]
    assert a[("orders", "o_totalprice")][:2] == b[("orders", "o_totalprice")][:2]
    for key in a:
        if key != ("orders", "o_totalprice"):
            assert a[key] == b[key]


def test_constraint_checks_clean_data_all_pass(spark):
    rows = {
        r["check_name"]: r for r in constraint_checks(spark, SF_DIR).collect()
    }
    assert len(rows) == 9
    for r in rows.values():
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
        assert r["n_checked"] > 0
    # the synthetic generator honors PKs, FKs, and value domains
    assert all(r["passed"] == 1 for r in rows.values())


def test_constraint_checks_count_injected_violations(spark):
    """Craft inputs with one violation of each class and pin the exact
    per-check violation counts."""
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0),
            (1, 10, "F", 100.0),  # duplicate PK
            (2, 99, "X", 100.0),  # bad status + orphan custkey
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [
            (1, 1.0, 0.05),  # ok
            (1, 99.0, 0.05),  # quantity out of range
            (7, 10.0, 0.5),  # orphan orderkey + discount out of range
        ],
        "l_orderkey long, l_quantity double, l_discount double",
    )
    documents = spark.createDataFrame(
        [(1, "abc", 3), (2, "abc", 99)],  # second row: n_chars inconsistent
        "doc_id long, text string, n_chars long",
    )
    events = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)],  # one negative; NULL is legal
        "event_id long, value double",
    )
    rows = {
        r["check_name"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in constraint_checks_df(
            orders, customer, lineitem, documents, events
        ).collect()
    }
    assert rows["orders_pk_unique"] == (3, 1, 0)
    assert rows["orders_status_domain"] == (3, 1, 0)
    assert rows["orders_custkey_fk"] == (3, 1, 0)
    assert rows["lineitem_qty_range"] == (3, 1, 0)
    assert rows["lineitem_discount_range"] == (3, 1, 0)
    assert rows["lineitem_orderkey_fk"] == (3, 1, 0)
    assert rows["documents_pk_unique"] == (2, 0, 1)
    assert rows["documents_nchars_consistent"] == (2, 1, 0)
    assert rows["events_value_nonnegative"] == (3, 1, 0)
