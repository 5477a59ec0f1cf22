"""Stats family: hand-computed OLS/Pearson/Benford/Gini/rolling-window
cases plus real-corpus invariants."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bread_spark.extensions.stats import (
    BENFORD_PPM,
    benford_counts_df,
    benford_digit_qc,
    benford_report_df,
    concentration_df,
    correlation_from_daily,
    rolling_7d_distinct_users,
    rolling_distinct_df,
    source_concentration,
    trend_from_daily,
    type_correlation_matrix,
    value_trend_by_type,
)

DAILY_SCHEMA = "event_type string, day date, x long"
EV_SCHEMA = (
    "event_id long, event_type string, user_id long, ts timestamp, value double"
)


def _d(day):
    return datetime.date(2024, 1, day)


def _ts(day):
    return datetime.datetime(2024, 1, day)


# ---------------------------------------------------------------------------
# OLS trend
# ---------------------------------------------------------------------------


def test_trend_exact_line_and_degenerate_guards(spark):
    """Type a: y = 1e6·(t+1) → slope exactly 1e6, r² = 1, intercept =
    1e6. Type b: one day → den = 0 → slope NULL. Type c: constant →
    slope 0 but r² NULL (zero y-variance)."""
    rows = (
        [("a", _d(i + 1), 1_000_000 * (i + 1)) for i in range(5)]
        + [("b", _d(3), 42)]
        + [("c", _d(1), 7), ("c", _d(2), 7)]
    )
    daily = spark.createDataFrame(rows, DAILY_SCHEMA)
    got = {r["event_type"]: r for r in trend_from_daily(daily).collect()}
    a = got["a"]
    assert a["n_days"] == 5
    # n·Σty − Σt·Σy = 5·40e6 − 10·15e6 = 50e6; den = 5·30 − 100 = 50
    assert (a["slope_num"], a["slope_den"]) == ("50000000", "50")
    assert a["slope_micro_per_day"] == 1_000_000.0
    assert a["intercept_micro"] == 1_000_000.0
    assert a["r2"] == 1.0
    b = got["b"]
    assert b["slope_den"] == "0" and b["slope_micro_per_day"] is None
    assert b["r2"] is None
    c = got["c"]
    assert c["slope_micro_per_day"] == 0.0 and c["r2"] is None


def test_trend_centering_is_per_type(spark):
    """A type starting 100 days later must see the same small t
    indices — the slope depends only on its own day offsets."""
    rows = [("late", _d(20), 10), ("late", _d(25), 20)]
    daily = spark.createDataFrame(rows, DAILY_SCHEMA)
    r = trend_from_daily(daily).collect()[0]
    # t = 0, 5 → num = 2·100 − 5·30 = 50, den = 2·25 − 25 = 25 → slope 2
    assert (r["slope_num"], r["slope_den"]) == ("50", "25")
    assert r["slope_micro_per_day"] == 2.0


# ---------------------------------------------------------------------------
# Pairwise correlation
# ---------------------------------------------------------------------------


def test_correlation_signs_and_pair_ordering(spark):
    """b = 2a → r = 1; c = −a + const → r = −1; pairs come out
    lexicographically ordered (type_a < type_b)."""
    rows = []
    for i, ya in enumerate([1, 2, 3]):
        rows += [
            ("a", _d(i + 1), ya),
            ("b", _d(i + 1), 2 * ya),
            ("c", _d(i + 1), 10 - 2 * ya),
        ]
    daily = spark.createDataFrame(rows, DAILY_SCHEMA)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in correlation_from_daily(daily).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")]["r"] == 1.0
    assert got[("a", "c")]["r"] == -1.0
    assert got[("b", "c")]["r"] == -1.0
    assert all(r["n_days"] == 3 for r in got.values())


def test_correlation_day_alignment_inner(spark):
    """Days present in only one series drop out of the pair's n."""
    rows = [
        ("a", _d(1), 1),
        ("a", _d(2), 2),
        ("a", _d(9), 5),  # a-only day
        ("b", _d(1), 3),
        ("b", _d(2), 1),
    ]
    daily = spark.createDataFrame(rows, DAILY_SCHEMA)
    r = correlation_from_daily(daily).collect()[0]
    assert r["n_days"] == 2
    assert r["r"] == -1.0  # two aligned points, opposite slope


def test_correlation_constant_series_is_null(spark):
    rows = [("a", _d(1), 1), ("a", _d(2), 2), ("k", _d(1), 5), ("k", _d(2), 5)]
    daily = spark.createDataFrame(rows, DAILY_SCHEMA)
    r = correlation_from_daily(daily).collect()[0]
    assert r["r"] is None  # zero variance on one side → undefined


# ---------------------------------------------------------------------------
# Benford QC
# ---------------------------------------------------------------------------


def test_benford_hand_counts_and_exact_ppm(spark):
    """Digits come from the micro-quantized bigint; zero/NULL excluded;
    obs/excess are exact truncating-division integers."""
    rows = [
        (1, "t", 1, _ts(1), 1.0),  # vu 1_000_000 → digit 1
        (2, "t", 1, _ts(1), 1.5),  # vu 1_500_000 → digit 1
        (3, "t", 1, _ts(1), 25.0),  # digit 2
        (4, "t", 1, _ts(1), 0.000003),  # vu 3 → digit 3
        (5, "t", 1, _ts(1), 0.0),  # vu 0 → excluded
        (6, "t", 1, _ts(1), None),  # excluded
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA).select("event_type", "value")
    got = {r["digit"]: r for r in benford_report_df(benford_counts_df(ev)).collect()}
    assert {d: got[d]["cnt"] for d in got} == {1: 2, 2: 1, 3: 1}
    assert all(r["total"] == 4 for r in got.values())
    assert got[1]["obs_ppm"] == 500_000
    assert got[2]["obs_ppm"] == 250_000
    assert got[1]["expected_ppm"] == 301_030
    assert got[1]["excess_ppm"] == 500_000 - 301_030
    assert got[3]["excess_ppm"] == 250_000 - 124_939


def test_benford_expected_ppm_sums_to_one_million():
    assert sum(BENFORD_PPM.values()) == 1_000_000
    assert list(BENFORD_PPM) == list(range(1, 10))


def test_benford_real_corpus_invariants(spark, sf_dir):
    rows = benford_digit_qc(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert 1 <= r["digit"] <= 9
        assert r["excess_ppm"] == r["obs_ppm"] - r["expected_ppm"]
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        total = rs[0]["total"]
        assert sum(r["cnt"] for r in rs) == total
        # truncating division: shares sum to ≤ 1e6, within 9 ulps
        s = sum(r["obs_ppm"] for r in rs)
        assert 1_000_000 - 9 <= s <= 1_000_000


# ---------------------------------------------------------------------------
# Source concentration
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, source string, n_chars long"


def test_concentration_uniform_is_zero_gini(spark):
    rows = [(i, f"s{i}", 10) for i in range(3)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    r = concentration_df(docs).collect()[0]
    assert (r["n_sources"], r["total_chars"]) == (3, 30)
    assert r["gini_num"] == "0" and r["gini"] == 0.0
    assert r["hhi"] == round(300 / 900, 6)
    assert r["top_share_ppm"] == 333_333


def test_concentration_dominant_source(spark):
    rows = [(1, "a", 1), (2, "b", 1), (3, "c", 98)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    r = concentration_df(docs).collect()[0]
    # ascending (1,a),(1,b),(98,c): six = 1 + 2 + 294 = 297
    assert r["gini_num"] == str(2 * 297 - 4 * 100)
    assert r["gini"] == round(194 / 300, 6)
    assert r["hhi"] == round((1 + 1 + 98 * 98) / 10_000, 6)
    assert r["top_share_ppm"] == 980_000


def test_concentration_real_corpus(spark, sf_dir):
    r = source_concentration(spark, sf_dir).collect()[0]
    assert r["n_sources"] > 0
    assert 0.0 <= r["gini"] < 1.0
    # HHI of n sources lives in [1/n, 1]
    assert r["hhi"] >= round(1.0 / r["n_sources"], 6) - 1e-6
    assert r["top_share_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users
# ---------------------------------------------------------------------------


def test_rolling_hand_case_with_gap(spark):
    rows = [
        (1, "t", 1, _ts(1), 1.0),
        (2, "t", 2, _ts(1), 1.0),
        (3, "t", 2, _ts(2), 1.0),
        (4, "t", 3, _ts(9), 1.0),  # beyond day 2's +6 reach
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA).select("ts", "user_id")
    got = {r["day"]: r for r in rolling_distinct_df(ev).collect()}
    assert set(got) == {_d(1), _d(2), _d(9)}  # event days only, gap days absent
    assert (got[_d(1)]["users_1d"], got[_d(1)]["users_7d"]) == (2, 2)
    assert (got[_d(2)]["users_1d"], got[_d(2)]["users_7d"]) == (1, 2)
    assert (got[_d(9)]["users_1d"], got[_d(9)]["users_7d"]) == (1, 1)


def test_rolling_window_boundary_inclusive(spark):
    """Day 7 is exactly 6 days after day 1 → still inside the window;
    day 8 is not."""
    rows = [
        (1, "t", 1, _ts(1), 1.0),
        (2, "t", 2, _ts(7), 1.0),
        (3, "t", 3, _ts(8), 1.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA).select("ts", "user_id")
    got = {r["day"]: r["users_7d"] for r in rolling_distinct_df(ev).collect()}
    assert got[_d(7)] == 2  # users 1 and 2
    assert got[_d(8)] == 2  # users 2 and 3 — user 1 aged out


def test_rolling_real_corpus_monotone_vs_daily(spark, sf_dir):
    rows = rolling_7d_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["users_7d"] >= r["users_1d"] > 0


# ---------------------------------------------------------------------------
# Catalog smoke: the two seam readers agree with their cores
# ---------------------------------------------------------------------------


def test_trend_and_corr_ride_the_daily_seam(spark, sf_dir):
    """The catalog entries must equal the unseamed folds over a fresh
    daily table — the seam changes the plan, never the values."""
    from bread_spark.extensions.timeseries import _daily_micro
    from bread_spark.io import load_table

    daily = _daily_micro(load_table(spark, sf_dir, "events"))
    t_seam = {tuple(r) for r in value_trend_by_type(spark, sf_dir).collect()}
    t_core = {tuple(r) for r in trend_from_daily(daily).collect()}
    assert t_seam == t_core
    c_seam = {
        tuple(r) for r in type_correlation_matrix(spark, sf_dir).collect()
    }
    c_core = {tuple(r) for r in correlation_from_daily(daily).collect()}
    assert c_seam == c_core


def test_engagement_ratios_hand_computed(spark):
    """u1 active daily for 10 days, u2 on day 1 only: on day 8 the
    trailing week holds just u1 (dau/wau = 1e6) while the 30-day
    window still holds both (dau/mau = 500_000); day 1 is 1e6 across
    the panel. Ratios are exact truncating divisions."""
    from datetime import datetime

    from bread_spark.extensions.stats import engagement_df

    rows = [(1, datetime(2024, 1, d, 12)) for d in range(1, 11)]
    rows.append((2, datetime(2024, 1, 1, 13)))
    # NULL-user events are dropped up front (r10 ADVICE): without the
    # filter, users_1d would count the (day, NULL) row while the
    # countDistinct windows drop it, letting dau_wau_ppm exceed 1e6.
    rows.append((None, datetime(2024, 1, 8, 14)))
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp").select(
        "ts", "user_id"
    )
    got = {str(r.day): r for r in engagement_df(ev).collect()}
    d1, d8 = got["2024-01-01"], got["2024-01-08"]
    assert (d1.users_1d, d1.users_7d, d1.users_30d) == (2, 2, 2)
    assert (d1.dau_wau_ppm, d1.dau_mau_ppm, d1.wau_mau_ppm) == (
        1_000_000, 1_000_000, 1_000_000,
    )
    assert (d8.users_1d, d8.users_7d, d8.users_30d) == (1, 1, 2)
    assert (d8.dau_wau_ppm, d8.dau_mau_ppm, d8.wau_mau_ppm) == (
        1_000_000, 500_000, 500_000,
    )
