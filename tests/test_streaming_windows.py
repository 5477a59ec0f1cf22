"""Watermarked tumbling-window aggregation: batch parity + true
streaming late-data semantics (kept within lateness, dropped beyond)."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from bread_spark.streaming.windows import windowed_value_by_type
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duckdb_con

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)


def test_batch_matches_oracle(spark):
    from bread_spark.io import load_table

    got = windowed_value_by_type(load_table(spark, SF_DIR, "events"))
    con = duckdb_con(SF_DIR)
    from bread_spark.streaming.windows import ORACLE_SQL

    ok, msg = compare(got, con, ORACLE_SQL["windowed_value_by_type"])
    assert ok, msg


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for ts, etype, value in rows:
            f.write(
                json.dumps({"ts": ts.isoformat(), "event_type": etype, "value": value}) + "\n"
            )


def test_stream_late_data_watermark(spark, tmp_path):
    """Batch 1 advances event time; batch 2 delivers one row late-but-
    within-lateness (counted) and one beyond the watermark (dropped)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    h = datetime.timedelta(hours=1)

    # batch 1: events in hours 0 and 6 → watermark ≈ 06:30 − 2h = 04:30
    _write_batch(src, "b1.json", [
        (BASE + datetime.timedelta(minutes=10), "a", 1.0),
        (BASE + datetime.timedelta(minutes=20), "a", 2.0),
        (BASE + 6 * h + datetime.timedelta(minutes=30), "b", 5.0),
    ])

    stream = spark.readStream.schema("ts timestamp, event_type string, value double").json(src)
    out = windowed_value_by_type(stream, window="1 hour", lateness="2 hours")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    # parquet sink (memory sink can't recover from a checkpoint restart)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    # batch 2: hour-5 row is AFTER the 04:30 watermark → kept;
    # hour-0 row is far behind it → dropped
    _write_batch(src, "b2.json", [
        (BASE + 5 * h + datetime.timedelta(minutes=15), "a", 7.0),
        (BASE + datetime.timedelta(minutes=40), "a", 100.0),  # too late
        # advance event time so hours 0..5 all finalize
        (BASE + 12 * h, "c", 0.5),
    ])
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    rows = {
        (r["window_start"].hour, r["event_type"]): (r["total_value"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    # hour 0 finalized WITHOUT the too-late 100.0 row
    assert rows[(0, "a")] == (3.0, 2)
    # the within-lateness hour-5 row was accepted
    assert rows[(5, "a")] == (7.0, 1)
    assert rows[(6, "b")] == (5.0, 1)


def test_stream_ohlc_agrees_with_batch(spark, tmp_path):
    """min_by/max_by run in streaming state: the streamed tumbling-window
    OHLC bars must equal the batch run of the same definition over the
    same events — including an out-of-order earlier event inside the
    lateness bound that retakes `open`."""
    from bread_spark.streaming.windows import windowed_ohlc

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)

    def w(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for eid, ts, etype, value in rows:
                f.write(
                    json.dumps(
                        {"event_id": eid, "ts": ts.isoformat(),
                         "event_type": etype, "value": value}
                    )
                    + "\n"
                )

    def run():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).json(src)
        q = (
            windowed_ohlc(stream, window="1 hour", lateness="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [
        (1, BASE + 10 * m, "click", 5.0),
        (2, BASE + 20 * m, "click", 9.0),
        (3, BASE + 50 * m, "click", 2.0),
    ]
    # out-of-order but within lateness: an EARLIER event that becomes open
    b2 = [(4, BASE + 5 * m, "click", 7.0)]
    b3 = [(9, BASE + 10 * h, "click", 1.0)]  # watermark push, own window
    w("b1.json", b1); run()
    w("b2.json", b2); run()
    w("b3.json", b3); run()

    got = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in spark.read.parquet(sink).collect()
    }
    first = (BASE, "click")
    assert got[first] == (7.0, 9.0, 2.0, 2.0, 4)

    batch = spark.createDataFrame(
        [(e, t, ty, v) for e, t, ty, v in b1 + b2],
        "event_id long, ts timestamp, event_type string, value double",
    )
    want = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in windowed_ohlc(batch).collect()
    }
    assert got[first] == want[first]


def test_native_session_window_matches_custom_sessionizer(spark):
    """Spark's built-in session_window must produce the same sessions as
    the repo's two-pass window sessionizer on the real events table:
    identical (user, start, n_events, value) multiset, and the native
    window end is exactly last-event + gap."""
    from bread_spark.io import load_table
    from bread_spark.streaming.sessions import SESSION_GAP_MIN, session_stats
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    custom = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"]):
            r["session_end"]
        for r in session_stats(ev).collect()
    }
    native_rows = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .collect()
    )
    native = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"]):
            (r["session_end"], r["sw"]["end"])
        for r in native_rows
    }
    assert set(native) == set(custom)
    gap = datetime.timedelta(minutes=SESSION_GAP_MIN)
    for key, (last_ts, sw_end) in native.items():
        assert custom[key] == last_ts
        assert sw_end == last_ts + gap
