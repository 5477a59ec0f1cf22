"""Streaming dedup: duplicates within the watermark horizon dropped
across micro-batches; state evicted beyond it."""

from __future__ import annotations

import pytest

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


def test_stream_span_gate_scores_recycled_content(spark, tmp_path):
    """Span-coverage gate in streaming form: a verbatim copy of base
    content and a mostly-recycled stitch are flagged (keep=False), light
    quoting and fresh content pass — verdicts emit once the event-time
    watermark finalizes their window. Mirrors the batch
    `cross_dedup_spans` ground-truth test."""
    from bread_spark.extensions.dedup import SPAN_W as W
    from bread_spark.streaming.dedup import span_gate_stream_against_base

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)

    tok = lambda idxs: " ".join(f"t{i}" for i in idxs)
    base_run = list(range(1000, 1000 + 3 * W))
    base = spark.createDataFrame([(1, tok(base_run))], "doc_id long, text string")

    copy = tok(base_run)
    stitched = tok(list(range(2000, 2005)) + base_run[: 2 * W])
    quoter = tok(list(range(3000, 3000 + 3 * W)) + base_run[:W])
    fresh = tok(range(4000, 4000 + 2 * W))

    fn = lambda s: span_gate_stream_against_base(
        s, base, window="10 minutes", lateness="1 hour"
    )
    _write(src, "b1.json", [
        (10, BASE, copy), (11, BASE + m, stitched),
        (12, BASE + 2 * m, quoter), (13, BASE + 3 * m, fresh),
    ])
    _run(spark, src, ckpt, sink, fn)
    # advance event time far past the lateness horizon so window finalizes
    _write(src, "b2.json", [(99, BASE + 3 * h, fresh)])
    _run(spark, src, ckpt, sink, fn)

    rows = {r["event_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) >= {10, 11, 12, 13}
    assert rows[10]["base_frac"] == 1.0 and rows[10]["keep"] is False
    assert rows[11]["n_windows"] == W + 6
    assert rows[11]["n_base_windows"] == W + 1
    assert rows[11]["keep"] is False
    assert rows[12]["n_base_windows"] == 1 and rows[12]["keep"] is True
    assert rows[13]["n_base_windows"] == 0 and rows[13]["keep"] is True


@pytest.mark.nightly  # staging-form variant; default tier keeps the span-gate semantics pin (r9 tier split)
def test_stream_span_gate_prestaged_base_spans(spark, tmp_path):
    """The production form: the base span table is built once
    (`base_span_table` + localCheckpoint) and passed via `base_spans`, so
    micro-batches pay only the join — verdicts must match the raw-base
    path exactly."""
    from bread_spark.extensions.dedup import SPAN_W as W
    from bread_spark.streaming.dedup import (
        base_span_table,
        span_gate_stream_against_base,
    )

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)

    tok = lambda idxs: " ".join(f"t{i}" for i in idxs)
    base_run = list(range(1000, 1000 + 3 * W))
    base = spark.createDataFrame([(1, tok(base_run))], "doc_id long, text string")
    staged = base_span_table(base).localCheckpoint(eager=True)
    assert staged.columns == ["span"]
    assert staged.count() == 2 * W + 1  # 3W tokens → 3W-W+1 stride-1 windows

    copy, fresh = tok(base_run), tok(range(4000, 4000 + 2 * W))
    fn = lambda s: span_gate_stream_against_base(
        s, base_spans=staged, window="10 minutes", lateness="1 hour"
    )
    _write(src, "b1.json", [(10, BASE, copy), (13, BASE + m, fresh)])
    _run(spark, src, ckpt, sink, fn)
    _write(src, "b2.json", [(99, BASE + 3 * h, fresh)])
    _run(spark, src, ckpt, sink, fn)

    rows = {r["event_id"]: r for r in spark.read.parquet(sink).collect()}
    assert rows[10]["base_frac"] == 1.0 and rows[10]["keep"] is False
    assert rows[13]["n_base_windows"] == 0 and rows[13]["keep"] is True


def test_stream_fuzzy_gate_agrees_with_batch(spark, tmp_path):
    """The fuzzy edit-distance gate in streaming form must agree with
    the batch matcher EXACTLY — same matched base doc, same integer
    distance, same candidate count for every probe doc — across two
    micro-batches and a checkpoint restart (the second _run reopens the
    same checkpoint). Probes are the real fixture corpus split the same
    way as `cross_fuzzy_matches`."""
    from bread_spark.extensions.fuzzy import fuzzy_matches_df
    from bread_spark.io import load_table
    from bread_spark.streaming.dedup import (
        base_fuzzy_tables,
        fuzzy_gate_stream_against_base,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = docs.filter("doc_id < 250")
    probe = docs.filter("doc_id >= 250")
    expected = {
        r["doc_id"]: (r["matched_doc"], r["dist"], r["n_candidates"])
        for r in fuzzy_matches_df(base, probe).collect()
    }
    assert expected, "fixture split should contain cross fuzzy matches"

    sel, norm = base_fuzzy_tables(base)
    tables = (sel.localCheckpoint(), norm.localCheckpoint())

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)
    probes = probe.collect()
    half = len(probes) // 2
    fn = lambda s: fuzzy_gate_stream_against_base(
        s, base_tables=tables, window="10 minutes", lateness="1 hour"
    )
    _write(
        src, "b1.json",
        [(r["doc_id"], BASE, r["text"]) for r in probes[:half]],
    )
    _run(spark, src, ckpt, sink, fn)
    _write(
        src, "b2.json",
        [(r["doc_id"], BASE + m, r["text"]) for r in probes[half:]]
        + [(999999, BASE + 3 * h, "window closer content xyz")],
    )
    _run(spark, src, ckpt, sink, fn)

    got = {
        r["event_id"]: (r["matched_doc"], r["dist"], r["n_candidates"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == expected


def _dup_saturation_fixture(spark):
    tok = lambda idxs: " ".join(f"t{i}" for i in idxs)
    hot = tok(range(100, 110))  # 8 shingles, in BOTH base docs → df = 2
    cold = tok(range(200, 210))  # in ONE base doc → df = 1
    base = spark.createDataFrame(
        [(1, hot), (2, hot + " " + tok(range(300, 310))), (3, cold)],
        "doc_id long, text string",
    )
    incoming = [
        (10, hot),  # 8/8 duplicated shingles
        (11, cold),  # 0/8 — base has it once, not duplicated
        (12, tok(range(400, 410))),  # fresh
        # stitch: hot run then fresh run — the 2 seam shingles are
        # novel, so 8 of 18 distinct shingles are duplicated
        (13, hot + " " + tok(range(500, 510))),
        # <3 tokens: no shingles — EXCLUDED from the scored output
        # (and must not trip ANSI on sequence(0, negative))
        (14, "t100 t101"),
    ]
    return base, incoming


def _assert_dup_saturation_rows(rows):
    assert set(rows) >= {10, 11, 12, 13}
    assert rows[10]["n_shingles"] == 8 and rows[10]["dup_frac"] == 1.0
    assert rows[11]["n_shingles"] == 8 and rows[11]["dup_frac"] == 0.0
    assert rows[12]["dup_frac"] == 0.0
    assert rows[13]["n_shingles"] == 18 and rows[13]["n_dup_shingles"] == 8
    # ADVICE r12: <3-token docs are excluded (size filter runs BEFORE
    # the shingle projection, so ANSI never sees sequence(0, -1))
    assert 14 not in rows


def test_dup_saturation_gate_semantics_static(spark):
    """Default-tier agreement pin for the streaming memorization-risk
    gate (r12): the operator is pure DataFrame ops, so the identical
    plan evaluates on a static frame — same base, same verdicts as the
    nightly micro-batch form, without the micro-batch waits."""
    from bread_spark.streaming.dedup import dup_saturation_stream_against_base

    base, incoming = _dup_saturation_fixture(spark)
    m = datetime.timedelta(minutes=1)
    static = spark.createDataFrame(
        [(i, BASE + j * m, text) for j, (i, text) in enumerate(incoming)],
        "event_id long, ts timestamp, payload string",
    )
    rows = {
        r["event_id"]: r
        for r in dup_saturation_stream_against_base(
            static, base, window="10 minutes", lateness="1 hour"
        ).collect()
    }
    _assert_dup_saturation_rows(rows)


@pytest.mark.nightly  # micro-batch emission/watermark form; default tier keeps the static-frame semantics pin (r9 tier split)
def test_stream_dup_saturation_scores_recycled_shingles(spark, tmp_path):
    """Memorization-risk gate in streaming form (r12): an incoming doc
    built from the base corpus's DUPLICATED trigrams scores dup_frac
    1.0; one from base text that appears only once scores 0.0 (df < 2
    shingles are not 'duplicated'); fresh content scores 0.0; and a
    half-recycled stitch lands exactly between. Base-vs-stream
    semantics mirror the batch `doc_dup_saturation` df >= 2 rule."""
    from bread_spark.streaming.dedup import dup_saturation_stream_against_base

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)

    tok = lambda idxs: " ".join(f"t{i}" for i in idxs)
    hot = tok(range(100, 110))  # 8 shingles, in BOTH base docs → df = 2
    cold = tok(range(200, 210))  # in ONE base doc → df = 1
    base = spark.createDataFrame(
        [(1, hot), (2, hot + " " + tok(range(300, 310))), (3, cold)],
        "doc_id long, text string",
    )

    copy_hot = hot  # 8/8 duplicated shingles
    copy_cold = cold  # 0/8 — base has it once, not duplicated
    fresh = tok(range(400, 410))
    # stitch: hot run then fresh run — the 2 seam shingles bridging
    # t109→t500 are novel, so 8 of 18 shingles are duplicated
    stitch = hot + " " + tok(range(500, 510))

    fn = lambda s: dup_saturation_stream_against_base(
        s, base, window="10 minutes", lateness="1 hour"
    )
    _write(src, "b1.json", [
        (10, BASE, copy_hot), (11, BASE + m, copy_cold),
        (12, BASE + 2 * m, fresh), (13, BASE + 3 * m, stitch),
    ])
    _run(spark, src, ckpt, sink, fn)
    # advance event time far past the lateness horizon so windows finalize
    _write(src, "b2.json", [(99, BASE + 3 * h, fresh)])
    _run(spark, src, ckpt, sink, fn)

    rows = {r["event_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) >= {10, 11, 12, 13}
    assert rows[10]["n_shingles"] == 8 and rows[10]["dup_frac"] == 1.0
    assert rows[11]["n_shingles"] == 8 and rows[11]["dup_frac"] == 0.0
    assert rows[12]["dup_frac"] == 0.0
    assert rows[13]["n_shingles"] == 18 and rows[13]["n_dup_shingles"] == 8
