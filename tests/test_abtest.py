"""A/B variant report: hand-computed Welch t, null exclusion, and the
small-sample NULL guard."""

from __future__ import annotations

import math

from bread_spark.extensions.abtest import (
    ab_moments_df,
    ab_report_df,
    ab_variant_report,
)

EV_SCHEMA = "event_type string, user_id long, value double"


def _report(spark, rows):
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    return {
        r["event_type"]: r for r in ab_report_df(ab_moments_df(ev)).collect()
    }


def test_hand_computed_welch(spark):
    """A = {1, 2, 3} (even user_ids), B = {5, 5} (odd): means 2 vs 5,
    var_a = 1, var_b = 0 → t = (2−5)/sqrt(1e12/3 + 0) on the micro
    scale = −3/sqrt(1/3) = −5.1962."""
    rows = [
        ("t", 0, 1.0),
        ("t", 2, 2.0),
        ("t", 4, 3.0),
        ("t", 1, 5.0),
        ("t", 3, 5.0),
    ]
    r = _report(spark, rows)["t"]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["mean_a_micro"] == 2_000_000
    assert r["mean_b_micro"] == 5_000_000
    assert r["diff_micro"] == -3_000_000
    want = round(-3_000_000 / math.sqrt((1_000_000.0**2) / 3 + 0.0), 4)
    assert r["welch_t"] == want


def test_null_values_excluded_and_small_sample_guard(spark):
    rows = [
        ("t", 0, 1.0),
        ("t", 2, None),  # excluded from both moments
        ("t", 4, 3.0),
        ("t", 1, 7.0),  # single B observation → welch_t NULL
    ]
    r = _report(spark, rows)["t"]
    assert (r["n_a"], r["n_b"]) == (2, 1)
    assert r["mean_a_micro"] == 2_000_000
    assert r["mean_b_micro"] == 7_000_000
    assert r["welch_t"] is None


def test_missing_variant_yields_null_means_not_errors(spark):
    rows = [("t", 0, 1.0), ("t", 2, 2.0)]  # no odd user_ids at all
    r = _report(spark, rows)["t"]
    assert r["n_b"] == 0
    assert r["mean_b_micro"] is None
    assert r["diff_micro"] is None
    assert r["welch_t"] is None


def test_real_corpus_report_shape(spark, sf_dir):
    rows = ab_variant_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert r["diff_micro"] == r["mean_a_micro"] - r["mean_b_micro"]
        assert int(r["sum_sq_a"]) >= 0 and int(r["sum_sq_b"]) >= 0
