"""Streaming stats twins: the daily micro-sum and Benford count tables
maintained online must equal the batch folds and feed the batch
trend/correlation/report projections (default tier); the same
checkpoint must keep folding (nightly)."""

from __future__ import annotations

import json
import os

import pytest

from bread_spark.extensions.stats import (
    benford_counts_df,
    benford_report_df,
    correlation_from_daily,
    trend_from_daily,
)
from bread_spark.extensions.timeseries import _daily_micro
from bread_spark.streaming.stats import benford_counts_stream, daily_micro_stream
from tests.test_stats import EV_SCHEMA

BATCH1 = [
    ("a", 1, "2024-01-01T05:00:00", 1.0),
    ("a", 2, "2024-01-02T05:00:00", 2.0),
    ("b", 1, "2024-01-01T05:00:00", 3.0),
    ("b", 2, "2024-01-02T05:00:00", 1.5),
]
BATCH2 = [
    ("a", 3, "2024-01-03T05:00:00", 4.0),
    ("b", 3, "2024-01-03T05:00:00", 0.5),
]


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for etype, uid, ts, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_type": etype,
                        "user_id": uid,
                        "ts": ts,
                        "value": value,
                    }
                )
                + "\n"
            )


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, __import__("datetime").datetime.fromisoformat(ts), v)
         for i, (t, u, ts, v) in enumerate(rows)],
        EV_SCHEMA,
    )


def _run(spark, src, ckpt, table, fold):
    stream = spark.readStream.schema(EV_SCHEMA).json(src)
    q = (
        fold(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {table}")


def test_daily_stream_matches_batch_and_feeds_trend_and_corr(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    from bread_spark.extensions.timeseries import acf_from_daily

    got = _run(spark, src, ckpt, "stats_d1", daily_micro_stream)
    batch = _daily_micro(_batch_df(spark, BATCH1))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch.collect()
    }
    for proj in (trend_from_daily, correlation_from_daily, acf_from_daily):
        snap = proj(got).collect()
        ref = proj(batch).collect()
        assert sorted(map(tuple, snap)) == sorted(map(tuple, ref))


def test_benford_stream_matches_batch_and_feeds_report(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    got = _run(spark, src, ckpt, "stats_b1", benford_counts_stream)
    batch = benford_counts_df(_batch_df(spark, BATCH1))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch.collect()
    }
    rep_s = benford_report_df(got).collect()
    rep_b = benford_report_df(batch).collect()
    assert sorted(map(tuple, rep_s)) == sorted(map(tuple, rep_b))


@pytest.mark.nightly
def test_daily_stream_folds_on_the_same_checkpoint(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, "stats_n1", daily_micro_stream)
    _write(src, "b2.json", BATCH2)
    got2 = _run(spark, src, ckpt, "stats_n2", daily_micro_stream)
    both = _daily_micro(_batch_df(spark, BATCH1 + BATCH2))
    assert {tuple(r) for r in got2.collect()} == {
        tuple(r) for r in both.collect()
    }
    snap = trend_from_daily(got2).collect()
    ref = trend_from_daily(both).collect()
    assert sorted(map(tuple, snap)) == sorted(map(tuple, ref))


def test_type_counts_stream_matches_batch_and_feeds_shares(spark, tmp_path):
    from bread_spark.extensions.daily import daily_type_counts_df, type_share_df
    from bread_spark.streaming.stats import daily_type_counts_stream

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    got = _run(spark, src, ckpt, "stats_c1", daily_type_counts_stream)
    batch = daily_type_counts_df(_batch_df(spark, BATCH1))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch.collect()
    }
    snap = type_share_df(got).collect()
    ref = type_share_df(batch).collect()
    assert sorted(map(tuple, snap)) == sorted(map(tuple, ref))


def test_daily_stream_feeds_forecast_folds(spark, tmp_path):
    """A snapshot of the streamed daily micro table fed through the
    BATCH forecast folds (seasonal-naive backtest, lattice EWMA) IS
    the batch answer — the forecast family's streaming surface, per
    its module note."""
    from bread_spark.extensions.forecast import (
        ewma_df,
        seasonal_naive_error_df,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1 + BATCH2)
    got = _run(spark, src, ckpt, "stats_fc1", daily_micro_stream)
    batch = _daily_micro(_batch_df(spark, BATCH1 + BATCH2))
    for proj in (seasonal_naive_error_df, lambda d: ewma_df(d)):
        snap = proj(got).collect()
        ref = proj(batch).collect()
        assert sorted(map(tuple, snap)) == sorted(map(tuple, ref))


def test_engagement_hll_merge_equivalence(spark):
    """Default-tier sibling of the nightly streaming twin: the panel's
    trailing-window estimate is computed by max-merging PER-DAY register
    tables, and HLL mergeability makes that identical to a one-shot
    register build over the whole window's events — asserted through
    the public estimator (users_7d/30d at the anchor == users_1d of the
    direct build)."""
    import datetime

    from bread_spark.extensions.stats import (
        engagement_hll_panel_df,
        engagement_user_registers_df,
    )

    rows = []
    for d, (lo, hi) in enumerate([(1, 15), (10, 25), (20, 35)]):
        for u in range(lo, hi + 1):
            rows.append((u, datetime.datetime(2024, 1, d + 1, 12)))
    # the one-shot build of the SAME events, parked on a day >30 days
    # away so both panels compute in a single plan without their
    # trailing windows overlapping (default-tier budget: one panel job
    # instead of two)
    rows_direct = [(u, datetime.datetime(2024, 6, 1, 12)) for u, _ in rows]
    ev = spark.createDataFrame(
        rows + rows_direct, "user_id bigint, ts timestamp"
    ).select("ts", "user_id")
    panel = {
        str(r.day): r
        for r in engagement_hll_panel_df(
            engagement_user_registers_df(ev)
        ).collect()
    }
    anchor, direct = panel["2024-01-03"], panel["2024-06-01"]
    assert anchor.users_7d_est == direct.users_1d_est
    assert anchor.users_30d_est == direct.users_1d_est
    # register dominance: wider windows can never estimate lower
    for r in panel.values():
        assert r.users_1d_est <= r.users_7d_est <= r.users_30d_est


@pytest.mark.nightly
def test_engagement_register_stream_matches_batch_and_feeds_panel(
    spark, tmp_path
):
    """A closed day's streamed register rows are bit-identical to the
    batch `engagement_user_registers_df` build over that day's events
    (NULL users dropped on both paths), and the snapshot through
    `engagement_hll_panel_df` IS the batch panel estimate."""
    from bread_spark.extensions.stats import (
        engagement_hll_panel_df,
        engagement_user_registers_df,
    )
    from bread_spark.streaming.stats import engagement_register_stream

    B1 = [
        ("a", u, f"2024-03-01T0{u % 6}:00:00", 1.0) for u in range(1, 13)
    ] + [
        ("a", u, f"2024-03-02T0{u % 6}:00:00", 1.0) for u in range(8, 20)
    ]
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    os.makedirs(src)
    _write(src, "b1.json", B1)
    with open(os.path.join(src, "b1null.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "event_type": "a",
                    "user_id": None,
                    "ts": "2024-03-01T03:00:00",
                    "value": 1.0,
                }
            )
            + "\n"
        )

    def run():
        stream = spark.readStream.schema(EV_SCHEMA).json(src)
        q = (
            engagement_register_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # advance the watermark past both days so they finalize and emit
    _write(src, "b2.json", [("a", 99, "2024-03-06T00:00:00", 1.0)])
    run()

    got = spark.read.parquet(sink)
    batch = engagement_user_registers_df(_batch_df(spark, B1))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch.collect()
    }
    snap = engagement_hll_panel_df(got).collect()
    ref = engagement_hll_panel_df(batch).collect()
    assert sorted(map(tuple, snap)) == sorted(map(tuple, ref))
