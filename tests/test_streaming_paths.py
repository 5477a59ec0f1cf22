"""Streaming transitions: the per-user last-event fold must reproduce
the batch LEAD pairs exactly, across micro-batches and a restart."""

from __future__ import annotations

import datetime
import json
import os

BASE = datetime.datetime(2024, 3, 1)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for event_id, ts, user_id, etype in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts": ts.isoformat(),
                        "user_id": user_id,
                        "event_type": etype,
                    }
                )
                + "\n"
            )


def _run(spark, src, ckpt, sink, fn):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
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


def test_stream_transitions_agree_with_batch_lead(spark, tmp_path):
    """Real fixture events, split in two in-order micro-batches with a
    checkpoint restart between them: the streamed transition set
    (keyed by arriving event_id) must equal the batch LEAD pairs —
    including transitions that SPAN the batch boundary (the carried
    last-event state), and the trigram context (prev2_type) must match
    the batch LEAD(2) view."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from bread_spark.io import load_table
    from bread_spark.streaming.paths import transition_stream
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected = {
        r["next_id"]: (r["event_type"], r["next_type"], r["prev_type"])
        for r in ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.lead("event_id").over(w).alias("next_id"),
        )
        .filter(F.col("next_type").isNotNull())
        .collect()
    }

    rows = sorted(
        ev.collect(), key=lambda r: (r["ts"], r["event_id"])
    )
    half = len(rows) // 2
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    fn = transition_stream
    _write(
        src, "b1.json",
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"])
         for r in rows[:half]],
    )
    _run(spark, src, ckpt, sink, fn)
    _write(
        src, "b2.json",
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"])
         for r in rows[half:]],
    )
    _run(spark, src, ckpt, sink, fn)

    got = {
        r["event_id"]: (r["from_type"], r["to_type"], r["prev2_type"])
        for r in spark.read.parquet(sink).collect()
    }
    assert {k: (v[0], v[1]) for k, v in got.items()} == {
        k: (v[0], v[1]) for k, v in expected.items()
    }
    # prev2 context matches batch LAG over the same order
    for k, (_, _, prev2) in got.items():
        assert prev2 == expected[k][2]
