"""Event-sequence analytics: hand-built journeys, exact probabilities,
rank determinism."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from bread_spark.extensions.paths import (
    PROB_SCALE,
    path_trigrams_df,
    transitions_df,
)

T0 = datetime.datetime(2024, 3, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, T0 + datetime.timedelta(minutes=m), u, t, 1.0)
            for eid, m, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_transitions_hand_checked(spark):
    """user 1: view->click->purchase; user 2: view->view->click.
    Transitions never cross users."""
    ev = _ev(
        spark,
        [
            (1, 0, 1, "view"),
            (2, 1, 1, "click"),
            (3, 2, 1, "purchase"),
            (4, 0, 2, "view"),
            (5, 1, 2, "view"),
            (6, 2, 2, "click"),
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in transitions_df(ev).collect()
    }
    assert got == {
        ("view", "click"): 2,
        ("click", "purchase"): 1,
        ("view", "view"): 1,
    }


def test_transition_probs_are_exact_ratios(spark):
    """prob_micro = n * 1e6 div from_total — exact integers that sum
    to <= 1e6 per from-row (floor leaks, never rounds up)."""
    from bread_spark.extensions import paths as P

    ev = _ev(
        spark,
        [(i, i, 1, t) for i, t in enumerate(["a", "b", "a", "c", "a", "b"])],
    )
    import types

    orig = P.load_table
    P.load_table = lambda sp, sf, t: ev
    try:
        rows = P.event_transition_matrix(spark, "x").collect()
    finally:
        P.load_table = orig
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
        tot = sum(
            x["n"] for x in rows if x["from_type"] == r["from_type"]
        )
        assert r["prob_micro"] == r["n"] * PROB_SCALE // tot
    for rs in by_from.values():
        assert sum(r["prob_micro"] for r in rs) <= PROB_SCALE


def test_trigrams_use_same_order_as_pairs(spark):
    """Ties in ts break on event_id — the trigram window and the pair
    window must read the same sequence."""
    ev = _ev(
        spark,
        [(10, 0, 1, "a"), (2, 0, 1, "b"), (5, 0, 1, "c"), (7, 1, 1, "d")],
    )
    # order by (ts, event_id): b(2) -> c(5) -> d? no: (0,2)b,(0,5)c,(0,10)a,(1,7)d
    tri = {
        (r["t1"], r["t2"], r["t3"]): r["n"]
        for r in path_trigrams_df(ev).collect()
    }
    assert tri == {("b", "c", "a"): 1, ("c", "a", "d"): 1}


def test_top_paths_rank_total_order(spark):
    """Equal-count paths rank lexicographically by (t1, t2) — the cut
    at TOP_PATHS can never be ambiguous."""
    from tests.conftest import SF_DIR

    from bread_spark.extensions.paths import top_paths_to_purchase

    rows = sorted(
        top_paths_to_purchase(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert rows and rows[0]["rank"] == 1
    for a, b in zip(rows, rows[1:]):
        assert (-a["n"], a["t1"], a["t2"]) < (-b["n"], b["t1"], b["t2"])


def test_followup_matrix_hand_computed(spark):
    """Strictly-after, within-one-hour, same-user, EXISTS-collapsed:
    two b-followups of one a count once; a hit at exactly +1h counts;
    one at +1h+1s does not; another user's b never matches."""
    from datetime import datetime

    from bread_spark.extensions.paths import followup_matrix_df

    ev = spark.createDataFrame(
        [
            (1, 1, "view", datetime(2024, 1, 1, 10, 0, 0)),
            (2, 1, "click", datetime(2024, 1, 1, 10, 10, 0)),   # +10m
            (3, 1, "click", datetime(2024, 1, 1, 10, 20, 0)),   # 2nd click: EXISTS once
            (4, 1, "buy", datetime(2024, 1, 1, 11, 0, 0)),      # exactly +1h: counts
            (5, 2, "click", datetime(2024, 1, 1, 10, 30, 0)),   # other user
            (6, 1, "view", datetime(2024, 1, 1, 12, 30, 0)),    # next view
            (7, 1, "late", datetime(2024, 1, 1, 11, 0, 1)),     # +1h1s after ev1
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    got = {
        (r.a_type, r.b_type): (r.n_a, r.n_with_followup, r.followup_ppm)
        for r in followup_matrix_df(ev).collect()
    }
    # view #1 sees click (x2 -> once) and buy (+1h boundary), NOT late
    assert got[("view", "click")] == (2, 1, 500_000)
    assert got[("view", "buy")] == (2, 1, 500_000)
    assert ("view", "late") not in got
    # clicks #2 and #3 both see the buy within the hour; user 2's
    # lone click (in the denominator!) sees nothing -> 2 of 3
    assert got[("click", "buy")] == (3, 2, 666_666)
    # view #6 at 12:30 is >1h after both clicks: pair absent entirely
    assert ("click", "view") not in got
