"""Streaming z-score monitor: stateless scoring against static reference
stats, agreeing exactly with the batch operator on the same corpus."""

from __future__ import annotations

import datetime
import json
import os

BASE = datetime.datetime(2024, 4, 1)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for event_id, ts, typ, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts": ts.isoformat(),
                        "event_type": typ,
                        "value": value,
                    }
                )
                + "\n"
            )


def test_stream_monitor_matches_batch_flags(spark, tmp_path):
    from bread_spark.models import event_type_stats
    from bread_spark.streaming.anomaly import zscore_monitor_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)

    # history: 30 clicks around 10, one spike; 10 views around 50, no spike
    hist_rows = [
        (i, BASE + i * m, "click", 10.0 + 0.1 * (i % 7)) for i in range(29)
    ]
    hist_rows.append((29, BASE + 29 * m, "click", 1000.0))
    hist_rows += [(100 + i, BASE + i * m, "view", 50.0 + i % 3) for i in range(10)]
    hist = spark.createDataFrame(
        [(e, t, ty, v) for e, t, ty, v in hist_rows],
        "event_id long, ts timestamp, event_type string, value double",
    )
    stats = event_type_stats(hist).localCheckpoint(eager=True)

    # batch ground truth over the same corpus
    from pyspark.sql import functions as F

    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    batch_flagged = {
        r["event_id"]
        for r in hist.join(stats, "event_type").filter(F.abs(z) > 3).collect()
    }
    assert batch_flagged == {29}

    # stream the same events through the monitor
    _write(src, "b1.json", hist_rows)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).json(src)
    q = (
        zscore_monitor_stream(stream, stats)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    assert {r["event_id"] for r in got} == batch_flagged
    assert abs(got[0]["z"] - 5.2946) < 1e-9


def test_stream_monitor_passes_unknown_types(spark, tmp_path):
    """A type with no reference stats produces no verdicts (inner join) —
    new event types don't crash or false-positive before retraining."""
    from bread_spark.models import event_type_stats
    from bread_spark.streaming.anomaly import zscore_monitor_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    hist = spark.createDataFrame(
        [(i, BASE, "click", 10.0 + i) for i in range(10)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    stats = event_type_stats(hist).localCheckpoint(eager=True)
    _write(src, "b1.json", [(1, BASE, "brand_new_type", 1e9)])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).json(src)
    q = (
        zscore_monitor_stream(stream, stats)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 0
