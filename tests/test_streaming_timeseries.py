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


def test_stream_psi_agrees_with_first_principles(spark, tmp_path):
    """Streaming PSI per window vs the frozen reference must equal a
    plain-Python computation with the same lattice, union and add-1
    smoothing — for a window whose distribution matches the reference
    (psi ~ 0) and one whose mass shifted (psi large)."""
    import math

    from bread_spark.streaming.timeseries import (
        psi_reference,
        psi_stream_against_base,
    )

    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)
    ref_df = spark.createDataFrame(
        [(i, BASE, "a", 100.0) for i in range(30)]
        + [(100 + i, BASE, "a", 200.0) for i in range(10)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    reference = psi_reference(ref_df).localCheckpoint()

    # window 1: same shape as reference; window 2: mass moved to 400
    w1 = [(1000 + i, BASE, "a", 100.0) for i in range(15)] + [
        (1100 + i, BASE, "a", 200.0) for i in range(5)
    ]
    w2 = [(2000 + i, BASE + 20 * m, "a", 400.0) for i in range(20)]
    closer = [(9999, BASE + 5 * h, "a", 100.0)]

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    _write(src, "b1.json", w1 + w2)
    fn = lambda s: psi_stream_against_base(s, reference)
    _run(spark, src, ckpt, sink, fn)
    _write(src, "b2.json", closer)
    _run(spark, src, ckpt, sink, fn)

    rows = {
        r["window"]["start"].minute: r
        for r in spark.read.parquet(sink).collect()
    }
    assert 0 in rows and 20 in rows

    def bucket(v):
        iv = int(math.floor(v * 100 + 0.5))
        sh = max(0, iv.bit_length() - 1 - 4)
        return sh * 16 + (iv >> sh)

    def psi_py(ref_vals, cur_vals):
        rm, cm = {}, {}
        for v in ref_vals:
            rm[bucket(v)] = rm.get(bucket(v), 0) + 1
        for v in cur_vals:
            cm[bucket(v)] = cm.get(bucket(v), 0) + 1
        keys = set(rm) | set(cm)
        nb, nr, nc = len(keys), sum(rm.values()), sum(cm.values())
        tot = 0.0
        for b in keys:
            p = (rm.get(b, 0) + 1) / (nr + nb)
            q = (cm.get(b, 0) + 1) / (nc + nb)
            tot += (p - q) * math.log(p / q)
        return round(tot, 6)

    ref_vals = [100.0] * 30 + [200.0] * 10
    assert rows[0]["psi"] == psi_py(ref_vals, [100.0] * 15 + [200.0] * 5)
    assert rows[20]["psi"] == psi_py(ref_vals, [400.0] * 20)
    assert rows[0]["psi"] < 0.05 < rows[20]["psi"]
