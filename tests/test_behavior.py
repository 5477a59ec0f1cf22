"""Behavioral timing + quality ranking: hand-computed latency/cadence
cases, ordering guards, and real-corpus invariants."""

from __future__ import annotations

import datetime

from bread_spark.extensions.behavior import (
    conversion_firsts_df,
    conversion_report_df,
    gap_stats_df,
    inter_event_gap_stats,
    time_to_conversion,
)
from bread_spark.functions.text import quality_rank_df, quality_rank_by_source

EV_SCHEMA = (
    "event_id long, event_type string, user_id long, ts timestamp, value double"
)


def _ts(day, hour=0, minute=0):
    return datetime.datetime(2024, 1, day, hour, minute)


def test_conversion_hand_case(spark):
    """User 1 converts in 90 s; user 2 signs up only; user 3 purchased
    BEFORE signing up (not a conversion); user 4 purchases with no
    signup."""
    rows = [
        (1, "signup", 1, _ts(1, 0, 0), 0.0),
        (2, "purchase", 1, _ts(1, 0, 1), 1.0),  # +60 s
        (3, "purchase", 1, _ts(2), 1.0),  # later purchase — ignored
        (4, "signup", 2, _ts(1), 0.0),
        (5, "purchase", 3, _ts(1, 0, 0), 1.0),
        (6, "signup", 3, _ts(1, 0, 5), 0.0),
        (7, "purchase", 4, _ts(1), 1.0),
        (8, "click", 1, _ts(1), 0.0),  # other types never counted
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    r = conversion_report_df(conversion_firsts_df(ev)).collect()[0]
    assert r["n_signup_users"] == 3  # users 1, 2, 3
    assert r["n_purchase_users"] == 3  # users 1, 3, 4
    assert r["n_converted"] == 1  # only user 1
    assert r["conversion_ppm"] == 1_000_000 // 3
    assert r["mean_delay_s"] == 60
    assert r["p50_delay_s"] == 60.0 and r["p90_delay_s"] == 60.0


def test_conversion_empty_and_no_signup_guards(spark):
    ev = spark.createDataFrame(
        [(1, "purchase", 1, _ts(1), 1.0)], EV_SCHEMA
    )
    r = conversion_report_df(conversion_firsts_df(ev)).collect()[0]
    assert r["n_signup_users"] == 0
    assert r["conversion_ppm"] is None  # guarded, not a divide error
    assert r["mean_delay_s"] is None and r["p50_delay_s"] is None


def test_gap_stats_hand_case(spark):
    """User 1 clicks at 0/60/180 s → gaps 60, 120; user 2's single
    click yields no gap; types don't mix."""
    rows = [
        (1, "click", 1, _ts(1, 0, 0), 0.0),
        (2, "click", 1, _ts(1, 0, 1), 0.0),
        (3, "click", 1, _ts(1, 0, 3), 0.0),
        (4, "click", 2, _ts(1, 0, 0), 0.0),
        (5, "view", 1, _ts(1, 5, 0), 0.0),  # different type — no gap
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["event_type"]: r for r in gap_stats_df(ev).collect()}
    assert set(got) == {"click"}  # view/user-2 produce no gaps
    c = got["click"]
    assert c["n_gaps"] == 2
    assert c["mean_gap_s"] == 90  # (60+120) div 2
    assert c["p50_gap_s"] == 90.0  # interpolated median
    assert c["p90_gap_s"] == 114.0  # 60 + 0.9·(120−60)


def test_gap_ordering_tie_break_is_event_id(spark):
    """Two same-timestamp events order by event_id, so the gaps are
    (0, 60), not an engine-dependent (60, 0) vs (0, 60) coin flip."""
    rows = [
        (10, "click", 1, _ts(1, 0, 0), 0.0),
        (11, "click", 1, _ts(1, 0, 0), 0.0),
        (12, "click", 1, _ts(1, 0, 1), 0.0),
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    c = gap_stats_df(ev).collect()[0]
    assert c["n_gaps"] == 2
    assert c["mean_gap_s"] == 30  # gaps 0 and 60


def test_behavior_real_corpus_invariants(spark, sf_dir):
    r = time_to_conversion(spark, sf_dir).collect()[0]
    assert r["n_converted"] <= min(r["n_signup_users"], r["n_purchase_users"])
    assert 0 <= r["conversion_ppm"] <= 1_000_000
    if r["n_converted"] > 0:
        assert r["p50_delay_s"] <= r["p90_delay_s"]
        assert r["mean_delay_s"] >= 0
    gaps = inter_event_gap_stats(spark, sf_dir).collect()
    assert gaps
    for g in gaps:
        assert g["n_gaps"] > 0
        assert 0 <= g["p50_gap_s"] <= g["p90_gap_s"]


DOC_SCHEMA = "doc_id long, source string, text string"


def test_quality_rank_hand_case(spark):
    """Three docs in one source: ranks follow exact stop_ppm with the
    doc_id tie-break; rank_ppm hits 0 / 500000 / 1000000. A singleton
    source gets rank_ppm 0, not a divide error. Zero-token docs are
    filtered."""
    rows = [
        (1, "s", "the the the the"),  # stop_ppm 1_000_000
        (2, "s", "zebra quark flux"),  # stop_ppm 0
        (3, "s", "the zebra"),  # stop_ppm 500_000
        (4, "solo", "the end"),
        (5, "s", "   "),  # zero tokens → dropped
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r for r in quality_rank_df(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2]["rank_ppm"] == 0
    assert got[3]["rank_ppm"] == 500_000
    assert got[1]["rank_ppm"] == 1_000_000
    assert got[4]["rank_ppm"] == 0  # singleton-source guard
    assert got[1]["stop_ppm"] == 1_000_000
    assert got[3]["stop_ppm"] == 500_000


def test_quality_rank_real_corpus_is_consistent(spark, sf_dir):
    """Within every source: rank_ppm spans [0, 1e6], and sorting by
    rank_ppm never inverts stop_ppm (rank respects the score)."""
    rows = quality_rank_by_source(spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: (r["rank_ppm"], r["doc_id"]))
        assert rs[0]["rank_ppm"] == 0
        if len(rs) > 1:
            assert rs[-1]["rank_ppm"] == 1_000_000
        for a, b in zip(rs, rs[1:]):
            assert a["stop_ppm"] <= b["stop_ppm"]
