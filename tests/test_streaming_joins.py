"""Stream-stream join: matches within the time window across micro-
batches, state bounded by watermark + range condition."""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import functions as F

from bread_spark.streaming.joins import join_within

BASE = datetime.datetime(2024, 4, 1)


def _write(src, name, rows, ts_field):
    with open(os.path.join(src, name), "w") as f:
        for rid, user, minutes in rows:
            f.write(
                json.dumps({"id": rid, "user_id": user, ts_field: (BASE + datetime.timedelta(minutes=minutes)).isoformat()}) + "\n"
            )


def test_stream_stream_join_within_window(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc), os.makedirs(rsrc)

    # left: purchases; right: confirmations expected within 10 min
    _write(lsrc, "b1.json", [(1, 7, 0), (2, 7, 30), (3, 8, 5)], "ts")
    _write(rsrc, "b1.json", [(101, 7, 4), (102, 7, 45), (103, 8, 5)], "r_ts")

    left = spark.readStream.schema("id long, user_id long, ts timestamp").json(lsrc)
    right = (
        spark.readStream.schema("id long, user_id long, r_ts timestamp")
        .json(rsrc)
        .withColumnRenamed("id", "r_id")
    )
    joined = join_within(left, right, key="user_id", window_seconds=600)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["id"], r["r_id"]) for r in spark.read.parquet(sink).collect()}
    # purchase 1 (t=0) ↔ conf 101 (t=4): in window; conf 102 (t=45) is 15min
    # after purchase 2 (t=30): out; purchase 3 ↔ conf 103 same instant: in
    assert got == {(1, 101), (3, 103)}

    # second micro-batch: a confirmation arriving later still joins if
    # within the window of a buffered purchase
    _write(rsrc, "b2.json", [(104, 7, 31)], "r_ts")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["r_id"]) for r in spark.read.parquet(sink).collect()}
    assert (2, 104) in got  # purchase 2 (t=30) ↔ conf 104 (t=31)


def test_join_within_batch_semantics(spark):
    """Same function on batch frames = the oracle for the stream run."""
    left = spark.createDataFrame(
        [(1, 7, BASE), (2, 7, BASE + datetime.timedelta(minutes=30))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 7, BASE + datetime.timedelta(minutes=4))],
        "r_id long, user_id long, r_ts timestamp",
    )
    rows = join_within(left, right, key="user_id").select("id", "r_id").collect()
    assert [(r["id"], r["r_id"]) for r in rows] == [(1, 101)]
