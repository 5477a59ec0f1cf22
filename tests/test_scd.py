"""SCD2 interval construction: hand-computed chain, tie-break order,
and the one-open-interval-per-user corpus invariant."""

from __future__ import annotations

import datetime

from bread_spark.operators.scd import scd2_intervals_df, scd2_user_state

EV_SCHEMA = (
    "event_id long, event_type string, user_id long, ts timestamp, value double"
)


def _ts(day, minute=0):
    return datetime.datetime(2024, 1, day, 0, minute)


def test_scd2_hand_chain(spark):
    """User 1's three states chain into half-open intervals with exact
    second durations; the last is open-ended and current."""
    rows = [
        (1, "signup", 1, _ts(1, 0), 1.0),
        (2, "click", 1, _ts(1, 1), 2.5),
        (3, "purchase", 1, _ts(1, 3), 9.0),
        (4, "view", 2, _ts(1, 0), 0.5),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["event_id"]: r for r in scd2_intervals_df(ev).collect()}
    assert len(got) == 4  # exactly one interval per event
    assert got[1]["duration_s"] == 60 and not got[1]["is_current"]
    assert got[2]["duration_s"] == 120 and not got[2]["is_current"]
    assert got[3]["valid_to_us"] is None and got[3]["is_current"]
    assert got[3]["duration_s"] is None
    assert got[4]["is_current"]  # single-event user: open from the start
    assert got[1]["valid_to_us"] == got[2]["valid_from_us"]  # half-open chain
    assert got[2]["value_micro"] == 2_500_000


def test_scd2_tie_break_is_event_id(spark):
    """Same-timestamp events order by event_id: the lower id closes at
    the higher id's open, a zero-length interval — deterministic, not
    an engine coin flip."""
    rows = [
        (10, "click", 1, _ts(1), 1.0),
        (11, "click", 1, _ts(1), 2.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["event_id"]: r for r in scd2_intervals_df(ev).collect()}
    assert got[10]["duration_s"] == 0 and not got[10]["is_current"]
    assert got[11]["is_current"]


def test_scd2_corpus_invariants(spark, sf_dir):
    """Row-per-event, exactly one open interval per user, and every
    closed interval is non-negative."""
    from bread_spark.io import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    rows = scd2_user_state(spark, sf_dir).collect()
    assert len(rows) == n_events
    open_by_user = {}
    for r in rows:
        if r["is_current"]:
            open_by_user[r["user_id"]] = open_by_user.get(r["user_id"], 0) + 1
        else:
            assert r["duration_s"] >= 0
    assert all(v == 1 for v in open_by_user.values())
