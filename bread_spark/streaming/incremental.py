"""Incremental bronze→silver parse — Structured Streaming file source.

Replaces the reference's hand-rolled processed-file ledger
(parse.py:66-111, SRC11/S5 — which has a membership-test bug causing
silent reprocessing; SURVEY §2.9) with the engine-native mechanism:
``readStream`` over the landing zone + ``Trigger.AvailableNow`` +
checkpoint. The checkpoint's file-source log IS the ledger — exactly-once
per file, crash-safe, no custom code.

Scale: AvailableNow drains all pending files in rate-limited micro-batches
(maxFilesPerTrigger) and stops — the `dbt run`-style batch cadence of the
reference, but restartable and incremental. At 100 TB of history the
initial load is just the same job with a bigger file list; subsequent runs
only touch new files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..parse import parse_blocks, parse_log_attributes, parse_tx_result
from ..schemas import RAW_BLOCK_SCHEMA, RAW_TX_SCHEMA


def incremental_blocks(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
) -> StreamingQuery:
    """Stream new block JSON files → silver blocks parquet, partitioned.

    Each restart processes exactly the files not yet in the checkpoint log.
    """
    raw = (
        spark.readStream.schema(RAW_BLOCK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    silver = parse_blocks(raw)
    return (
        silver.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("year", "month", "day")
        .trigger(availableNow=True)
        .start()
    )


def _run_id_for_checkpoint(checkpoint_dir: str) -> str:
    """Stable per-checkpoint run id, minted on first use and persisted
    INSIDE the checkpoint directory — so a deleted/recreated checkpoint
    (whose batch ids restart at 0) gets a fresh id instead of silently
    reusing the old marker namespace. Deliberately random, not
    path-derived: the same path with a wiped checkpoint is exactly the
    identity change that must be detected (ADVICE r2 #3)."""
    import os
    import uuid

    token = os.path.join(checkpoint_dir, "_bread_run_id")
    if os.path.exists(token):
        return open(token).read().strip()
    os.makedirs(checkpoint_dir, exist_ok=True)
    rid = uuid.uuid4().hex[:16]
    tmp = token + ".tmp"
    with open(tmp, "w") as f:
        f.write(rid)
    os.replace(tmp, token)
    return rid


def incremental_blocks_compactable(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
    force_new_run: bool = False,
) -> StreamingQuery:
    """Streaming blocks sink whose output IS maintainable by
    `io.compact_partitioned` — the foreachBatch alternative to the plain
    file sink (whose `_spark_metadata` log pins the original files and
    makes in-place compaction unsafe; `io.compact_partitioned` refuses it).

    Idempotency without the sink log: each micro-batch appends to the
    plain partitioned directory only after checking a per-batch marker
    (`<out>/_batch_markers/<id>`), written AFTER the parquet append. On
    crash-and-replay the checkpoint re-delivers the same batch_id; the
    marker makes the replay a no-op, so the table holds each batch at
    most once while staying an ordinary parquet directory — readable,
    appendable, and compactable like any batch table.

    The write→marker pair is not atomic: a crash BETWEEN them replays an
    already-appended batch (duplicates) — the same at-least-once window
    every non-transactional foreachBatch sink has. The dedup repair is a
    digest anti-join; a table format closes it with real transactions.

    Markers are NAMESPACED by a per-checkpoint run id
    (`_batch_markers/<run_id>/<batch_id>`): batch ids restart at 0 when a
    checkpoint is deleted, so un-namespaced markers from a previous run
    would make the new run's first batches look already-written — silent
    data loss (ADVICE r2 #3). A fresh checkpoint pointed at an out_dir
    holding another run's markers REFUSES to start; pass
    ``force_new_run=True`` only when knowingly re-appending (duplicate
    rows become the caller's to repair).
    """
    import os

    raw = (
        spark.readStream.schema(RAW_BLOCK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    silver = parse_blocks(raw)
    run_id = _run_id_for_checkpoint(checkpoint_dir)
    markers_root = os.path.join(out_dir, "_batch_markers")
    if os.path.isdir(markers_root):
        foreign = [
            d for d in os.listdir(markers_root)
            if d != run_id and not d.startswith(".")
        ]
        if foreign and not force_new_run:
            raise ValueError(
                f"out_dir {out_dir!r} holds batch markers from other run(s) "
                f"{sorted(foreign)} but checkpoint {checkpoint_dir!r} is run "
                f"{run_id!r} — its batch ids restart at 0 and would re-append "
                "data the previous run already wrote. Reuse the original "
                "checkpoint, write to a fresh out_dir, or pass "
                "force_new_run=True to append anyway."
            )
    markers = os.path.join(markers_root, run_id)

    def write_batch(df, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return  # replayed batch — already fully written
        df.write.mode("append").partitionBy("year", "month", "day").parquet(out_dir)
        os.makedirs(markers, exist_ok=True)
        open(marker, "w").close()

    return (
        silver.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_tx_result(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
) -> StreamingQuery:
    """Stream new tx JSON files → silver tx_result parquet.

    Note: the block-time join (J1) is deliberately NOT in the streaming
    path — stream-static joins against a growing blocks table re-read the
    static side per micro-batch. The join happens at gold-build time
    (attach_block_time), keeping the stream a pure narrow map.
    """
    raw = (
        spark.readStream.schema(RAW_TX_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    silver = parse_tx_result(raw)
    return (
        silver.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_log_attributes(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
) -> StreamingQuery:
    raw = (
        spark.readStream.schema(RAW_TX_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    silver = parse_log_attributes(raw)
    return (
        silver.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
