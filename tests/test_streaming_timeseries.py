"""Streaming CUSUM: the online fold must equal the batch window
identity row for row, across micro-batches and a checkpoint restart."""

from __future__ import annotations

import datetime
import json
import os

BASE = datetime.datetime(2024, 3, 1)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for event_id, ts, etype, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts": ts.isoformat(),
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


def _run(spark, src, ckpt, sink, fn):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).json(src)
    q = (
        fn(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_cusum_agrees_with_batch(spark, tmp_path):
    """Feed a level-shifted event stream in two in-order micro-batches
    (the second run reopens the checkpoint — the restart pin): every
    per-event (s_pos, s_neg, alarm) must equal the batch core's window
    identity under the same frozen baseline, and the alarm fires only
    after the shift."""
    from bread_spark.extensions.timeseries import cusum_baseline, event_cusum_df
    from bread_spark.streaming.timeseries import cusum_stream_against_base

    m = datetime.timedelta(minutes=1)
    base_rows = [
        (i, BASE + i * m, "a", 100.0 + (i % 3)) for i in range(40)
    ]
    shift_rows = [
        (i, BASE + i * m, "a", 115.0 + (i % 3)) for i in range(40, 80)
    ]
    # a second type that never shifts
    quiet = [
        (1000 + i, BASE + i * m, "b", 50.0) for i in range(80)
    ]
    all_rows = sorted(base_rows + shift_rows + quiet, key=lambda r: r[1])

    base_df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in base_rows + quiet[:40]],
        "event_id long, ts timestamp, event_type string, value double",
    )
    baseline = cusum_baseline(base_df).localCheckpoint()

    full_df = spark.createDataFrame(
        all_rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    expected = {
        r["event_id"]: (r["s_pos"], r["s_neg"], r["alarm"])
        for r in event_cusum_df(full_df, baseline).collect()
    }

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    half = len(all_rows) // 2
    fn = lambda s: cusum_stream_against_base(s, baseline)
    _write(src, "b1.json", all_rows[:half])
    _run(spark, src, ckpt, sink, fn)
    _write(src, "b2.json", all_rows[half:])
    _run(spark, src, ckpt, sink, fn)

    got = {
        r["event_id"]: (r["s_pos"], r["s_neg"], r["alarm"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == expected
    # the planted shift alarms, and only in the shifted regime
    a_alarms = {i for i, (_, _, al) in got.items() if al == 1 and i < 1000}
    assert a_alarms and min(a_alarms) >= 40
    assert not any(al for i, (_, _, al) in got.items() if i >= 1000)


def test_stream_cusum_ignores_unseen_types(spark, tmp_path):
    """A type absent from the frozen baseline must emit NOTHING — a
    zero baseline would turn every value into a huge deviation and
    alarm-storm. Scored types in the same batch are unaffected."""
    from bread_spark.extensions.timeseries import cusum_baseline
    from bread_spark.streaming.timeseries import cusum_stream_against_base

    m = datetime.timedelta(minutes=1)
    base_df = spark.createDataFrame(
        [(i, BASE + i * m, "a", 100.0) for i in range(20)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    baseline = cusum_baseline(base_df).localCheckpoint()

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    _write(
        src, "b1.json",
        [(1, BASE, "a", 100.0), (2, BASE + m, "ghost", 9999.0),
         (3, BASE + 2 * m, "a", 101.0)],
    )
    _run(spark, src, ckpt, sink, lambda s: cusum_stream_against_base(s, baseline))
    rows = spark.read.parquet(sink).collect()
    assert {r["event_type"] for r in rows} == {"a"}
    assert {r["event_id"] for r in rows} == {1, 3}
