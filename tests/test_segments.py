"""RFM segmentation and MAD outliers: hand-computed buckets/z values,
quartile balance, and the zero-MAD guard."""

from __future__ import annotations

import pytest

import datetime

from bread_spark.extensions.segments import (
    mad_outliers_df,
    rfm_df,
    rfm_segments,
)

EV_SCHEMA = "event_id long, event_type string, user_id long, ts timestamp, value double"


def _ts(day):
    return datetime.datetime(2024, 1, day)


def test_rfm_hand_computed(spark):
    """Four users, one metric axis decisive each: buckets follow the
    (metric, user_id) order and rfm_code composes r·100+f·10+m."""
    rows = [
        # user 1: most recent, most frequent, highest value
        (1, "t", 1, _ts(10), 100.0),
        (2, "t", 1, _ts(10), 100.0),
        (3, "t", 1, _ts(10), 100.0),
        (4, "t", 1, _ts(10), 100.0),
        # user 2
        (5, "t", 2, _ts(8), 50.0),
        (6, "t", 2, _ts(8), 50.0),
        (7, "t", 2, _ts(8), 50.0),
        # user 3
        (8, "t", 3, _ts(5), 20.0),
        (9, "t", 3, _ts(5), 20.0),
        # user 4: oldest, least frequent, lowest value
        (10, "t", 4, _ts(1), 1.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA).select("user_id", "ts", "value")
    got = {r["user_id"]: r for r in rfm_df(ev).collect()}
    assert got[1]["recency_days"] == 0
    assert got[4]["recency_days"] == 9
    assert (got[1]["r_bucket"], got[1]["f_bucket"], got[1]["m_bucket"]) == (1, 1, 1)
    assert (got[4]["r_bucket"], got[4]["f_bucket"], got[4]["m_bucket"]) == (4, 4, 4)
    assert got[2]["frequency"] == 3
    assert got[3]["monetary_micro"] == 40_000_000
    for r in got.values():
        assert r["rfm_code"] == r["r_bucket"] * 100 + r["f_bucket"] * 10 + r["m_bucket"]


def test_rfm_real_corpus_quartiles_balanced(spark, sf_dir):
    rows = rfm_segments(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for axis in ["r_bucket", "f_bucket", "m_bucket"]:
        sizes = {}
        for r in rows:
            assert 1 <= r[axis] <= 4
            sizes[r[axis]] = sizes.get(r[axis], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE balance
        assert sum(sizes.values()) == n


def test_mad_flags_planted_outlier_and_guards_zero_mad(spark):
    """Type 'a': tight cluster + one wild point → only the wild point
    flagged. Type 'b': over half the mass AT the median → MAD rounds
    to 0 → NO rows (guard, not a divide error)."""
    rows = (
        [(i, "a", 1, _ts(1), 10.0 + (i % 3) * 0.1) for i in range(9)]
        + [(100, "a", 1, _ts(1), 1000.0)]
        + [(200 + i, "b", 1, _ts(1), 5.0) for i in range(6)]
        + [(300, "b", 1, _ts(1), 9999.0)]
    )
    ev = spark.createDataFrame(rows, EV_SCHEMA).select(
        "event_id", "event_type", "value"
    )
    got = mad_outliers_df(ev).collect()
    flagged = {(r["event_id"], r["event_type"]) for r in got}
    assert (100, "a") in flagged
    assert all(t != "b" for _, t in flagged)  # zero-MAD type absent
    assert all(eid == 100 for eid, t in flagged if t == "a")


@pytest.mark.nightly
def test_segment_migration_mass_and_churn_bounds(spark, sf_dir):
    """Matrix mass = users active in both halves; churn ppm bounded;
    churn mass = first-half users (default-tier agreement pins for
    both operators are their oracle differentials)."""
    from pyspark.sql import functions as F

    from bread_spark.extensions.segments import (
        SPLIT_TS,
        segment_churn_rates,
        segment_migration_matrix,
    )
    from bread_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").filter("user_id IS NOT NULL")
    h1_users = ev.filter(f"ts < TIMESTAMP '{SPLIT_TS}'").select("user_id").distinct()
    h2_users = ev.filter(f"ts >= TIMESTAMP '{SPLIT_TS}'").select("user_id").distinct()
    both = h1_users.intersect(h2_users).count()

    mig = segment_migration_matrix(spark, sf_dir)
    assert mig.agg(F.sum("n_users")).collect()[0][0] == both

    churn = segment_churn_rates(spark, sf_dir)
    rows = churn.collect()
    assert sum(r.n_users for r in rows) == h1_users.count()
    assert all(0 <= r.churn_ppm <= 1_000_000 for r in rows)
    assert sum(r.n_churned for r in rows) == h1_users.count() - both
