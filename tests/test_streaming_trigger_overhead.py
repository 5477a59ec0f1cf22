"""Micro-batch TRIGGER overhead profiling for the streaming twins
(VERDICT r13 #7 — the one operator class no r13 wave measured).

Each probe runs an availableNow query over a multi-file fixture with
maxFilesPerTrigger=1 (so batch count is controlled), then decomposes
the wall from StreamingQuery.recentProgress durationMs:

  - addBatch          — the actual micro-batch computation (the part
                        the batch kernels own; every batch-side win
                        flows through here);
  - walCommit + commitOffsets + latestOffset/getBatch
                      — the exactly-once bookkeeping: offset-log and
                        commit-log writes per batch. This is the
                        IRREDUCIBLE micro-batch wait: it scales with
                        trigger count, not data volume, and shrinks
                        only by batching more input per trigger
                        (maxFilesPerTrigger) — not by kernel work;
  - queryPlanning     — incremental plan re-derivation per batch.

The pins assert structure (batch counts, rows), not wall-clock; the
measured decomposition prints to stdout and is transcribed into
PERF_NOTES.md per round. Nightly tier: real micro-batch waits.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

BASE = datetime.datetime(2024, 3, 1)


def _write_events(src: str, name: str, rows) -> None:
    with open(os.path.join(src, name), "w") as f:
        for event_id, ts, payload in rows:
            f.write(
                json.dumps(
                    {"event_id": event_id, "ts": ts.isoformat(), "payload": payload}
                )
                + "\n"
            )


def _profile(spark, src, ckpt, sink, out_df_fn, schema, n_files):
    """Run one availableNow pass at one file per trigger; return the
    summed durationMs decomposition across batches."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        out_df_fn(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    prog = q.recentProgress
    tot: dict[str, float] = {}
    n_batches = 0
    for p in prog:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
        if d.get("addBatch") is None and not d.get("triggerExecution"):
            continue
        n_batches += 1
        for k, v in d.items():
            tot[k] = tot.get(k, 0.0) + (v or 0)
    return n_batches, tot


@pytest.mark.nightly
def test_trigger_overhead_decomposition_stateless_vs_stateful(spark, tmp_path):
    """Profile three twin classes over the SAME 6-file fixture at one
    file per trigger: a stateless projection (floor: pure trigger
    machinery), the watermarked exact-dedup twin (HDFS-state store), and
    a watermarked windowed aggregate. Pins: every batch processed, all
    rows accounted for; the per-batch decomposition prints for
    PERF_NOTES."""
    from pyspark.sql import functions as F

    from bread_spark.streaming.dedup import dedup_stream_exact

    # one-SECOND steps: the whole fixture spans 5 min << the 1 h
    # horizon, so no row can be late whatever order availableNow
    # processes the files in (file pickup order is not name-ordered)
    m = datetime.timedelta(seconds=1)
    n_files, rows_per_file = 6, 50
    results = {}
    for label, fn, expected_rows in [
        (
            "stateless_projection",
            lambda s: s.select("event_id", "ts", F.length("payload").alias("n")),
            n_files * rows_per_file,
        ),
        (
            "exact_dedup_stateful",
            lambda s: dedup_stream_exact(s, ["event_id"], horizon="1 hour"),
            n_files * rows_per_file,  # all event_ids distinct below
        ),
        (
            "windowed_count",
            lambda s: s.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute"), "payload")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("payload", "n"),
            None,  # append-mode window emission depends on watermark advance
        ),
    ]:
        src, ckpt, sink = (
            str(tmp_path / label / d) for d in ("src", "ckpt", "sink")
        )
        os.makedirs(src)
        eid = 0
        for i in range(n_files):
            batch = []
            for j in range(rows_per_file):
                batch.append((eid, BASE + (i * rows_per_file + j) * m, f"p{eid % 7}"))
                eid += 1
            _write_events(src, f"b{i}.json", batch)
        n_batches, tot = _profile(
            spark,
            src,
            ckpt,
            sink,
            fn,
            "event_id long, ts timestamp, payload string",
            n_files,
        )
        results[label] = (n_batches, tot)
        # stateful queries may run one extra no-data batch (watermark
        # advance / state cleanup) before the availableNow query stops
        assert n_files <= n_batches <= n_files + 1, (label, n_batches)
        if expected_rows is not None:
            got = spark.read.parquet(sink).count()
            assert got == expected_rows, (label, got)

    print("\n=== micro-batch trigger decomposition (ms, summed over batches) ===")
    for label, (n_batches, tot) in results.items():
        add = tot.get("addBatch", 0)
        trig = tot.get("triggerExecution", 0)
        book = (
            tot.get("walCommit", 0)
            + tot.get("commitOffsets", 0)
            + tot.get("latestOffset", 0)
            + tot.get("getBatch", 0)
        )
        plan = tot.get("queryPlanning", 0)
        print(
            f"{label}: batches={n_batches} trigger={trig:.0f} addBatch={add:.0f} "
            f"bookkeeping={book:.0f} planning={plan:.0f} "
            f"per_batch_overhead={(trig - add) / max(n_batches, 1):.0f}"
        )
