"""Streaming dedup: duplicates within the watermark horizon dropped
across micro-batches; state evicted beyond it."""

from __future__ import annotations

import datetime
import json
import os

from bread_spark.streaming.dedup import dedup_stream_by_digest, dedup_stream_exact

BASE = datetime.datetime(2024, 3, 1)


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for event_id, ts, payload in rows:
            f.write(json.dumps({"event_id": event_id, "ts": ts.isoformat(), "payload": payload}) + "\n")


def _run(spark, src, ckpt, sink, out_df_fn):
    stream = spark.readStream.schema("event_id long, ts timestamp, payload string").json(src)
    q = (
        out_df_fn(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_within_watermark_across_batches(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)

    _write(src, "b1.json", [(1, BASE, "a"), (1, BASE + m, "a-dup"), (2, BASE + 2 * m, "b")])
    fn = lambda s: dedup_stream_exact(s, ["event_id"], horizon="1 hour")
    _run(spark, src, ckpt, sink, fn)

    # batch 2: event 1 again (within horizon → dropped), event 3 new
    _write(src, "b2.json", [(1, BASE + 5 * m, "a-again"), (3, BASE + 6 * m, "c")])
    _run(spark, src, ckpt, sink, fn)

    rows = spark.read.parquet(sink).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]
    assert {r["payload"] for r in rows if r["event_id"] == 1} == {"a"}  # first arrival wins


def test_digest_dedup_ignores_identity(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    # different event_ids, same payload → one survivor per content
    _write(src, "b1.json", [(1, BASE, "same"), (2, BASE + m, "same"), (3, BASE + 2 * m, "other")])
    _run(spark, src, ckpt, sink, lambda s: dedup_stream_by_digest(s, "payload"))
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2
    assert {r["payload"] for r in rows} == {"same", "other"}


def test_stream_static_anti_join_gates_against_base_corpus(spark, tmp_path):
    """Incremental cross-corpus gate in streaming form: rows whose content
    already exists in the static base corpus never reach the sink, across
    restarts; novel content flows through. Stateless — no watermark."""
    from bread_spark.streaming.dedup import dedup_stream_against_base

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    base = spark.createDataFrame(
        [(100, "known content"), (101, "other known")], "doc_id long, text string"
    )

    fn = lambda s: dedup_stream_against_base(s, base)
    _write(src, "b1.json", [(1, BASE, "known content"), (2, BASE + m, "fresh one")])
    _run(spark, src, ckpt, sink, fn)
    _write(src, "b2.json", [(3, BASE + 2 * m, "other known"), (4, BASE + 3 * m, "fresh two")])
    _run(spark, src, ckpt, sink, fn)

    rows = spark.read.parquet(sink).collect()
    assert sorted(r["event_id"] for r in rows) == [2, 4]
    assert {r["payload"] for r in rows} == {"fresh one", "fresh two"}
