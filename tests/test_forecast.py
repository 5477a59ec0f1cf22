"""Forecast baselines — hand-computed pins on constructed daily
frames (the seam's (event_type, day, x) shape); full-result
correctness rides the DuckDB oracle differential."""

from __future__ import annotations

from datetime import date

from bread_spark.extensions import forecast as FC


def _daily(spark, rows):
    return spark.createDataFrame(rows, "event_type string, day date, x bigint")


def test_seasonal_naive_error_hand_computed(spark):
    """8 consecutive days: exactly ONE (day, day-7) forecast pair;
    mae/mape are exact truncating divisions; bias is the signed sum."""
    rows = [("a", date(2020, 1, d), v) for d, v in zip(range(1, 9), (10, 20, 30, 40, 50, 60, 70, 80))]
    out = {r.event_type: r for r in FC.seasonal_naive_error_df(_daily(spark, rows)).collect()}
    a = out["a"]
    assert (a.n_days, a.n_forecasts) == (8, 1)
    assert a.mae_micro == 70                      # |80 - 10|
    assert a.mape_ppm == 875_000                  # 70e6 div 80
    assert a.bias_sum_micro == 70


def test_seasonal_naive_short_series_and_negative_bias(spark):
    """A <8-day type reports n_forecasts=0 with null errors; a
    forecast ABOVE the actual yields a negative exact bias."""
    rows = [("short", date(2020, 1, 1), 5)] + [
        ("neg", date(2020, 1, d), v)
        for d, v in zip((1, 8), (80, 10))  # day8 actual 10, forecast 80
    ]
    out = {r.event_type: r for r in FC.seasonal_naive_error_df(_daily(spark, rows)).collect()}
    s = out["short"]
    assert (s.n_forecasts, s.mae_micro, s.mape_ppm, s.bias_sum_micro) == (0, None, None, None)
    n = out["neg"]
    assert (n.n_forecasts, n.mae_micro, n.bias_sum_micro) == (1, 70, -70)


def test_ewma_integer_lattice_hand_computed(spark):
    """Two consecutive days: ewma(d2) = (200·2^19 + 100·2^18) div
    (2^19 + 2^18) = 500·2^18 div 3·2^18 = 166; a day with no history
    inside the 20-day horizon equals its own value."""
    rows = [
        ("a", date(2020, 1, 1), 100),
        ("a", date(2020, 1, 2), 200),
        ("a", date(2020, 2, 20), 777),  # >20 days later: fresh start
    ]
    out = {r.day: r for r in FC.ewma_df(_daily(spark, rows)).collect()}
    assert out[date(2020, 1, 1)].ewma_micro == 100
    assert out[date(2020, 1, 1)].n_terms == 1
    assert out[date(2020, 1, 2)].ewma_micro == 166
    assert out[date(2020, 1, 2)].n_terms == 2
    assert out[date(2020, 2, 20)].ewma_micro == 777
    assert out[date(2020, 2, 20)].n_terms == 1


def test_ewma_missing_day_renormalizes(spark):
    """A gap drops the missing day from BOTH sums: days d, d+2 ->
    anchor d+2 mixes weights 2^19 (itself) and 2^17 (d), so
    ewma = (200·2^19 + 100·2^17) div (2^19 + 2^17) = 900·2^17 div
    5·2^17 = 180."""
    rows = [("a", date(2020, 1, 1), 100), ("a", date(2020, 1, 3), 200)]
    out = {r.day: r for r in FC.ewma_df(_daily(spark, rows)).collect()}
    assert out[date(2020, 1, 3)].ewma_micro == 180
    assert out[date(2020, 1, 3)].n_terms == 2
