"""Daily operations rollups: hand-computed bands/shares/growth cases
and the growth-accounting conservation invariant."""

from __future__ import annotations

import datetime

from bread_spark.extensions.daily import (
    daily_percentiles_df,
    daily_type_counts_df,
    daily_value_percentiles,
    new_vs_returning_df,
    new_vs_returning_users,
    type_share_by_day,
    type_share_df,
)

EV_SCHEMA = (
    "event_id long, event_type string, user_id long, ts timestamp, value double"
)


def _ts(day):
    return datetime.datetime(2024, 1, day)


def test_daily_percentiles_integer_lattice(spark):
    """Four values on one (type, day): p50 interpolates the half
    lattice exactly; p90 = a + 0.9·(b−a) on exact integer operands."""
    rows = [
        (1, "t", 1, _ts(1), 1.0),
        (2, "t", 1, _ts(1), 2.0),
        (3, "t", 1, _ts(1), 3.0),
        (4, "t", 1, _ts(1), 10.0),
        (5, "t", 1, _ts(2), 5.0),  # other day — separate band
        (6, "t", 1, _ts(1), None),  # excluded
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["day"]: r for r in daily_percentiles_df(ev).collect()}
    d1 = got[datetime.date(2024, 1, 1)]
    assert d1["n"] == 4
    assert d1["p50_micro"] == 2_500_000.0  # (2e6+3e6)/2
    # p90: pos 2.7 between 3e6 and 10e6 → 3e6 + 0.7·7e6
    assert d1["p90_micro"] == 7_900_000.0
    assert got[datetime.date(2024, 1, 2)]["n"] == 1


def test_type_share_exact_ppm(spark):
    rows = [
        (1, "a", 1, _ts(1), 1.0),
        (2, "a", 1, _ts(1), 1.0),
        (3, "b", 1, _ts(1), 1.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["event_type"]: r
        for r in type_share_df(daily_type_counts_df(ev)).collect()
    }
    assert got["a"]["share_ppm"] == 666_666  # truncating, not 666_667
    assert got["b"]["share_ppm"] == 333_333
    assert all(r["day_total"] == 3 for r in got.values())


def test_new_vs_returning_hand_case(spark):
    """User 1 active day 1+2 (new on 1, returning on 2); user 2 first
    appears day 2."""
    rows = [
        (1, "t", 1, _ts(1), 1.0),
        (2, "t", 1, _ts(2), 1.0),
        (3, "t", 2, _ts(2), 1.0),
        (4, "t", 1, _ts(2), 1.0),  # same user+day dup — distinct'd
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["day"]: r for r in new_vs_returning_df(ev).collect()}
    d1, d2 = got[datetime.date(2024, 1, 1)], got[datetime.date(2024, 1, 2)]
    assert (d1["n_active"], d1["n_new"], d1["n_returning"]) == (1, 1, 0)
    assert (d2["n_active"], d2["n_new"], d2["n_returning"]) == (2, 1, 1)
    assert d2["new_ppm"] == 500_000
    assert d1["new_ppm"] == 1_000_000


def test_daily_family_corpus_invariants(spark, sf_dir):
    """Bands ordered; shares sum to ≤1e6 per day (truncation) and
    day_total is consistent; Σ n_new over days ≡ total distinct
    users (growth accounting conserves)."""
    from bread_spark.io import load_table
    import pyspark.sql.functions as F

    bands = daily_value_percentiles(spark, sf_dir).collect()
    assert bands
    for r in bands:
        assert r["p50_micro"] <= r["p90_micro"]

    shares = type_share_by_day(spark, sf_dir).collect()
    by_day = {}
    for r in shares:
        by_day.setdefault(r["day"], []).append(r)
    for rs in by_day.values():
        tot = rs[0]["day_total"]
        assert sum(r["cnt"] for r in rs) == tot
        s = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000

    growth = new_vs_returning_users(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert sum(r["n_new"] for r in growth) == n_users
    for r in growth:
        assert r["n_active"] == r["n_new"] + r["n_returning"]


def test_activity_heatmap_hand_case(spark):
    """2024-01-01 was a Monday → dow 1 (0=Sunday, the certified
    seasonal mapping); hours split exactly; ppm is the truncating
    corpus share."""
    rows = [
        (1, "t", 1, datetime.datetime(2024, 1, 1, 9, 5), 1.0),
        (2, "t", 1, datetime.datetime(2024, 1, 1, 9, 55), 1.0),
        (3, "t", 1, datetime.datetime(2024, 1, 7, 23, 0), 1.0),  # Sunday
    ]
    from bread_spark.extensions.daily import activity_heatmap_df

    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {(r["dow"], r["hour"]): r for r in activity_heatmap_df(ev).collect()}
    assert set(got) == {(1, 9), (0, 23)}
    assert got[(1, 9)]["n"] == 2 and got[(1, 9)]["share_ppm"] == 666_666
    assert got[(0, 23)]["share_ppm"] == 333_333


def test_activity_heatmap_corpus(spark, sf_dir):
    from bread_spark.extensions.daily import activity_heatmap
    from bread_spark.io import load_table

    rows = activity_heatmap(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000
