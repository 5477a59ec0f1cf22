"""CUSUM and seasonal decomposition: planted-shift detection, the
window-identity equivalence, and seasonality absorption."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from bread_spark.extensions.timeseries import (
    CUSUM_H_MAD,
    CUSUM_K_DIV,
    SEAS_H_MAD,
    cusum_df,
    seasonal_df,
)
from tests.conftest import SF_DIR

D0 = datetime.date(2024, 3, 4)  # a Monday


def _daily(spark, rows):
    return spark.createDataFrame(
        [(t, D0 + datetime.timedelta(days=d), x) for t, d, x in rows],
        "event_type string, day date, x long",
    )


def test_cusum_matches_clamped_recurrence(spark):
    """The window-function identity S_t = P_t - min(0, min P_j) must
    equal the literal clamped recurrence fold — checked value for
    value on a series with sign changes and a level shift."""
    xs = [100, 90, 110, 95, 105, 140, 150, 145, 155, 160]
    daily = _daily(spark, [("a", i, x) for i, x in enumerate(xs)])
    got = {
        r["day"]: (r["s_pos"], r["s_neg"])
        for r in cusum_df(daily, base_days=5).collect()
    }
    base = xs[:5]
    mu = sum(base) // len(base)
    k = abs(mu) // CUSUM_K_DIV
    sp = sn = 0
    for i, x in enumerate(xs):
        sp = max(0, sp + (x - mu - k))
        sn = max(0, sn - (x - mu + k))
        assert got[D0 + datetime.timedelta(days=i)] == (sp, sn)


def test_cusum_detects_small_persistent_shift(spark):
    """A +8% level shift — too small for any single day to look odd
    against the baseline noise — must alarm within a few days of
    onset, and never before it (the baseline window is the first 20
    days, i.e. the pre-shift regime)."""
    base = 1_000_000
    rows = [("a", i, base + (i % 3) * 1000) for i in range(20)]
    rows += [
        ("a", i, int(base * 1.08) + (i % 3) * 1000) for i in range(20, 40)
    ]
    out = sorted(
        cusum_df(_daily(spark, rows), base_days=20).collect(),
        key=lambda r: r["day"],
    )
    alarms = [i for i, r in enumerate(out) if r["alarm"] == 1]
    assert alarms, "shift never detected"
    assert min(alarms) >= 20, "false alarm before the shift"
    assert min(alarms) <= 25, "detection too slow"
    assert all(out[i]["alarm"] == 0 for i in range(20))


def test_cusum_two_sided_catches_drops(spark):
    """The lower side: a persistent DROP alarms via s_neg (baseline
    here is noisy so mad > 0 and the gate is meaningful)."""
    rows = [("a", i, 1_000_000 + (i % 5) * 2000) for i in range(20)]
    rows += [("a", i, 920_000) for i in range(20, 40)]
    out = sorted(
        cusum_df(_daily(spark, rows), base_days=20).collect(),
        key=lambda r: r["day"],
    )
    hit = [r for r in out if r["alarm"] == 1]
    assert hit and all(r["s_neg"] >= r["s_pos"] for r in hit)
    assert all(r["alarm"] == 0 for r in out[:20])


def test_cusum_alarms_surfaces_silent_types(spark):
    """Types that never alarm appear with null report fields — the
    monitoring rollup shows its silent rows (ADVICE r7 convention)."""
    from bread_spark.extensions.timeseries import cusum_alarms

    rows = {
        r["event_type"]: r for r in cusum_alarms(spark, SF_DIR).collect()
    }
    assert len(rows) == 5  # every event_type present
    for r in rows.values():
        if r["first_alarm_day"] is None:
            assert r["n_alarm_days"] is None and r["peak_stat"] is None
        else:
            assert r["n_alarm_days"] >= 1 and r["peak_stat"] > r["h"]


def test_seasonal_absorbs_weekly_pattern_flags_oneoff(spark):
    """A spike that repeats EVERY Monday is seasonality, not an
    anomaly; a one-off spike on a single Wednesday is. The residual
    gate must distinguish them."""
    rows = []
    for i in range(35):  # 5 full weeks starting Monday
        dow_spike = 400_000 if i % 7 == 0 else 0  # every Monday
        oneoff = 2_000_000 if i == 16 else 0  # one Wednesday
        rows.append(("a", i, 1_000_000 + dow_spike + oneoff))
    daily = _daily(spark, rows)
    dec = {r["day"]: r for r in seasonal_df(daily).collect()}
    mondays = [D0 + datetime.timedelta(days=7 * j) for j in range(5)]
    # the weekly component carries the Monday lift, residuals stay low
    for m in mondays[1:-1]:
        assert dec[m]["seasonal"] > 200_000
    spike_day = D0 + datetime.timedelta(days=16)
    mad = (
        sum(abs(r["residual"]) for r in dec.values()) // len(dec)
    )
    assert abs(dec[spike_day]["residual"]) > SEAS_H_MAD * mad
    quiet = [
        r
        for d, r in dec.items()
        if abs((d - spike_day).days) > 3 and d.weekday() != 0
    ]
    assert all(
        abs(r["residual"]) <= SEAS_H_MAD * mad for r in quiet
    )


def test_seasonal_anomalies_entry_shapes(spark):
    """Catalog entry sanity on the fixture: every flagged row exceeds
    its gate and severity is >= 100%."""
    from bread_spark.extensions.timeseries import seasonal_anomalies

    for r in seasonal_anomalies(spark, SF_DIR).collect():
        assert abs(r["residual"]) > SEAS_H_MAD * r["mad"]
        assert r["severity_pct"] >= 100


def test_psi_flags_planted_distribution_shift(spark, monkeypatch):
    """A value distribution that changes SHAPE while keeping its mean
    flat (mass splits from one price point to two symmetric ones) must
    read as drifted (psi > 0.25) for the shifted type and stable
    (psi < 0.1) for the unshifted one — the case CUSUM cannot see."""
    import datetime as dt

    from bread_spark.extensions import timeseries as T

    rows = []
    eid = 0
    for day in range(28):
        d = dt.datetime(2024, 3, 1) + dt.timedelta(days=day)
        for i in range(40):
            # type a: constant 100 in ref days, 50/150 split after
            if day < T.PSI_REF_DAYS:
                va = 100.0
            else:
                va = 50.0 if i % 2 == 0 else 150.0
            rows.append((eid, d, 1, "a", va)); eid += 1
            rows.append((eid, d, 1, "b", 100.0 + (i % 5))); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    monkeypatch.setattr(T, "load_table", lambda sp, sf, t: ev)
    got = {r["event_type"]: r for r in T.value_psi_by_type(spark, "x").collect()}
    assert got["a"]["psi"] > 0.25
    assert got["b"]["psi"] < 0.1
    assert got["a"]["n_ref"] == T.PSI_REF_DAYS * 40


def test_monitoring_dashboard_cells_equal_members(spark):
    """VERDICT r7 #4 convention: the dashboard's cells must EQUAL the
    member operators' outputs joined on event_type — frame-level
    equality, not just both passing their own oracles — so a member
    changing rounding or gaining a seam can never drift silently."""
    from bread_spark.extensions.timeseries import (
        cusum_alarms,
        events_monitoring_dashboard,
        seasonal_anomalies,
        value_psi_by_type,
    )

    dash = {
        r["event_type"]: r
        for r in events_monitoring_dashboard(spark, SF_DIR).collect()
    }
    alarms = {
        r["event_type"]: r for r in cusum_alarms(spark, SF_DIR).collect()
    }
    psi = {
        r["event_type"]: r for r in value_psi_by_type(spark, SF_DIR).collect()
    }
    anom: dict = {}
    for r in seasonal_anomalies(spark, SF_DIR).collect():
        a = anom.setdefault(r["event_type"], {"n": 0, "peak": 0})
        a["n"] += 1
        a["peak"] = max(a["peak"], r["severity_pct"])
    assert set(dash) == set(alarms) == set(psi)
    for t, row in dash.items():
        assert row["first_alarm_day"] == alarms[t]["first_alarm_day"]
        assert row["n_alarm_days"] == alarms[t]["n_alarm_days"]
        assert row["psi"] == psi[t]["psi"]
        got_anom = anom.get(t, {"n": 0, "peak": None})
        assert row["n_seasonal_anomalies"] == got_anom["n"]
        assert row["peak_severity_pct"] == got_anom["peak"]


def test_acf_alternating_series_exact_signs(spark):
    """A strict period-2 series has acf(1) = -1 and acf(2) = +1 exactly
    (every aligned pair anti-/co-varies), with the expected pair
    counts; a constant series yields NULL acf (zero variance guard).
    Hand-checks the exact-moment arithmetic end to end."""
    from bread_spark.extensions.timeseries import acf_from_daily

    xs = [100, 200, 100, 200, 100, 200]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("c", i, 50) for i in range(6)]  # constant: NULL acf
    got = {
        (r.event_type, r.lag): r
        for r in acf_from_daily(_daily(spark, rows), max_lag=2).collect()
    }
    a1, a2 = got[("a", 1)], got[("a", 2)]
    assert (a1.n_pairs, a1.acf) == (5, -1.0)
    assert (a2.n_pairs, a2.acf) == (4, 1.0)
    # cov_num is the exact integer string: lag-1 numerator =
    # n*sab - sa*sb over the 5 aligned pairs
    pairs1 = list(zip(xs, xs[1:]))
    n = len(pairs1)
    sa = sum(p[0] for p in pairs1)
    sb = sum(p[1] for p in pairs1)
    sab = sum(p[0] * p[1] for p in pairs1)
    assert a1.cov_num == str(n * sab - sa * sb)
    assert got[("c", 1)].acf is None
    assert got[("c", 1)].cov_num == "0"


def test_acf_gap_alignment_contract(spark):
    """A missing day drops exactly the pairs that touch it (aligned
    inner join — no imputation): 5 observed days with day 2 absent
    leave 3 lag-1 pairs and 2 lag-2 pairs."""
    from bread_spark.extensions.timeseries import acf_from_daily

    rows = [("a", d, x) for d, x in [(0, 10), (1, 30), (3, 20), (4, 80), (5, 60)]]
    got = {
        r.lag: r.n_pairs
        for r in acf_from_daily(_daily(spark, rows), max_lag=2).collect()
    }
    assert got == {1: 3, 2: 2}
