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
