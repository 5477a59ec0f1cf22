"""Streaming sketch monitors: the running HLL register table and
count-min counter grid over a document stream must agree EXACTLY with
the batch sketches over the same data (both sketches' merge operators —
MAX and SUM — are what grouped streaming aggregation applies per
micro-batch), and must keep folding new batches in on restart."""

from __future__ import annotations

import pytest

import json
import os

from pyspark.sql import functions as F

from bread_spark.extensions.sketch import cms_sketch_df, hll_registers_df
from bread_spark.streaming.sketch import cms_sketch_stream, hll_register_stream

DOCS_SCHEMA = "doc_id long, source string, text string"

BATCH1 = [
    (1, "s1", "alpha beta gamma alpha delta"),
    (2, "s1", "beta beta epsilon"),
    (3, "s2", "zeta eta theta iota"),
]
BATCH2 = [
    (4, "s2", "kappa zeta lam mu"),
    (5, "s3", "nu xi omicron pi alpha"),
]


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for doc_id, source, text in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "source": source, "text": text}) + "\n"
            )


def _run_complete(spark, src, ckpt, table, fn):
    stream = spark.readStream.schema(DOCS_SCHEMA).json(src)
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {table}").collect()


def _batch_docs(spark, rows):
    return spark.createDataFrame(
        [{"doc_id": d, "source": s, "text": t} for d, s, t in rows],
        DOCS_SCHEMA,
    )


def test_hll_stream_matches_batch_and_folds_new_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck1")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    got1 = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in _run_complete(spark, src, ckpt, "hll_t1", hll_register_stream)
    }
    want1 = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers_df(_batch_docs(spark, BATCH1)).collect()
    }
    assert got1 == want1

    # a second batch lands; the SAME checkpoint folds it in by MAX
    _write(src, "b2.json", BATCH2)
    got2 = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in _run_complete(spark, src, ckpt, "hll_t2", hll_register_stream)
    }
    want2 = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers_df(_batch_docs(spark, BATCH1 + BATCH2)).collect()
    }
    assert got2 == want2
    assert got2 != got1  # the new sources/tokens actually moved registers


def test_cms_stream_matches_batch(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck2")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    _write(src, "b2.json", BATCH2)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in _run_complete(spark, src, ckpt, "cms_t1", cms_sketch_stream)
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch_df(
            _batch_docs(spark, BATCH1 + BATCH2).select("text")
        ).collect()
    }
    assert got == want
    # total mass conservation: sum over any one hash row d == total tokens
    total_tokens = sum(len(t.split()) for _, _, t in BATCH1 + BATCH2)
    for d in {k[0] for k in got}:
        assert sum(v for (dd, _), v in got.items() if dd == d) == total_tokens


def test_hll_windowed_registers_match_batch_per_window(spark, tmp_path):
    """Each finalized event-time window's register rows are bit-identical
    to a batch register build over exactly that window's documents, and
    emit in append mode once the watermark passes."""
    import datetime

    from bread_spark.extensions.sketch import HLL_M, _HLL_U32, _rho_sql
    from bread_spark.streaming.sketch import hll_windowed_register_stream

    BASE_TS = datetime.datetime(2024, 3, 1)
    m = datetime.timedelta(minutes=1)
    h = datetime.timedelta(hours=1)

    win1 = [(1, BASE_TS, "alpha beta gamma"), (2, BASE_TS + m, "beta delta")]
    win2 = [(3, BASE_TS + 15 * m, "epsilon zeta")]
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ck", "sink"))
    os.makedirs(src)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for doc_id, ts, text in rows:
                f.write(
                    json.dumps(
                        {"doc_id": doc_id, "ts": ts.isoformat(), "text": text}
                    )
                    + "\n"
                )

    def run():
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).json(src)
        q = (
            hll_windowed_register_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b1.json", win1 + win2)
    run()
    write("b2.json", [(9, BASE_TS + 3 * h, "late")])  # advance watermark
    run()

    got: dict = {}
    for r in spark.read.parquet(sink).collect():
        got.setdefault(r["window_start"], {})[r["bucket"]] = r["max_rho"]

    def batch_regs(rows):
        frame = spark.createDataFrame(
            [{"text": t} for _, _, t in rows], "text string"
        )
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        return {
            r["bucket"]: r["max_rho"]
            for r in frame.select(F.explode(toks).alias("token"))
            .select(
                F.expr(f"{_HLL_U32} % {HLL_M}").alias("bucket"),
                F.expr(_rho_sql(f"({_HLL_U32} div {HLL_M})")).alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("max_rho"))
            .collect()
        }

    assert got[BASE_TS] == batch_regs(win1)
    assert got[BASE_TS + 10 * m] == batch_regs(win2)


VALUES_SCHEMA = "event_id long, value double"

VBATCH1 = [(1, 12.34), (2, 0.01), (3, 480.5), (4, 35.0), (5, 35.02)]
VBATCH2 = [(6, 99.99), (7, 0.15), (8, 250.0)]


def _write_values(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for eid, v in rows:
            f.write(json.dumps({"event_id": eid, "value": v}) + "\n")


def test_hdr_stream_matches_batch_and_folds_new_batches(spark, tmp_path):
    """The running log-histogram over a value stream equals the batch
    sketch over everything seen (SUM is the histogram's merge operator),
    and the same checkpoint keeps folding new batches in."""
    from bread_spark.extensions.sketch import hdr_sketch_df
    from bread_spark.streaming.sketch import hdr_sketch_stream

    src, ckpt = str(tmp_path / "vsrc"), str(tmp_path / "vck")
    os.makedirs(src)
    _write_values(src, "b1.json", VBATCH1)

    def run(table):
        stream = spark.readStream.schema(VALUES_SCHEMA).json(src)
        q = (
            hdr_sketch_stream(stream)
            .writeStream.format("memory")
            .queryName(table)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["bucket"]: (r["cnt"], r["lb"], r["ub"])
            for r in spark.sql(f"SELECT * FROM {table}").collect()
        }

    def batch(rows):
        frame = spark.createDataFrame(
            [{"event_id": e, "value": v} for e, v in rows], VALUES_SCHEMA
        )
        return {
            r["bucket"]: (r["cnt"], r["lb"], r["ub"])
            for r in hdr_sketch_df(frame).collect()
        }

    assert run("hdr_t1") == batch(VBATCH1)
    _write_values(src, "b2.json", VBATCH2)
    got2 = run("hdr_t2")
    assert got2 == batch(VBATCH1 + VBATCH2)


def _run_kmv(spark, src, ckpt, out):
    """update-mode stateful output through foreachBatch→parquet — the
    memory sink cannot recover from a checkpoint, and checkpoint
    recovery is exactly what the restart-fold assertion exercises."""
    from bread_spark.streaming.sketch import kmv_sketch_stream

    stream = spark.readStream.schema(DOCS_SCHEMA).json(src)
    q = (
        kmv_sketch_stream(stream.select("source", "text"))
        .writeStream.foreachBatch(
            lambda batch_df, _bid: batch_df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r["source"] not in latest or r["ver"] > latest[r["source"]]:
            latest[r["source"]] = r["ver"]
    return {
        (r["source"], r["rk"]): r["h"]
        for r in rows
        if r["ver"] == latest[r["source"]]
    }


@pytest.mark.nightly  # restart/multi-batch wait dominates (r9 tier split)
def test_kmv_stream_matches_batch_and_folds_on_restart(spark, tmp_path):
    """The bottom-k state after any stream prefix equals the batch
    sketch over that prefix — including across a checkpoint restart
    (the state is the sketch; micro-batches fold by union-truncate,
    merge_kmv_sketches' operator)."""
    from bread_spark.extensions.sketch import kmv_sketch_df

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckkmv")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    out = str(tmp_path / "kmv_out")
    got1 = _run_kmv(spark, src, ckpt, out)
    want1 = {
        (r["source"], r["rk"]): r["h"]
        for r in kmv_sketch_df(
            _batch_docs(spark, BATCH1).select("source", "text")
        ).collect()
    }
    assert got1 == want1

    _write(src, "b2.json", BATCH2)
    got2 = _run_kmv(spark, src, ckpt, out)
    # the parquet dir is cumulative; max-ver per source already overlays
    # run-1 state for sources batch 2 never touched
    want2 = {
        (r["source"], r["rk"]): r["h"]
        for r in kmv_sketch_df(
            _batch_docs(spark, BATCH1 + BATCH2).select("source", "text")
        ).collect()
    }
    assert got2 == want2
    assert any(k[0] == "s3" for k in got2)  # the new source surfaced


@pytest.mark.nightly  # restart/multi-batch wait dominates (r9 tier split)
def test_fd_sketch_stream_bound_holds_across_restart(spark, tmp_path):
    """Streaming FD: after two micro-batches (checkpoint restart
    between them), each source's MAX(ver) sketch satisfies the FD
    guarantee ||A^T A - B^T B||_2 <= ||A||_F^2 / ell against that
    source's FULL vector history — the state carried across the
    restart is a valid sketch of everything seen (row values are
    arrival-order-dependent; the BOUND is the contract, as with the
    lossy MG merge)."""
    import numpy as np

    from bread_spark.extensions.spectral import FD_ELL
    from bread_spark.streaming.sketch import fd_sketch_stream

    rng = np.random.default_rng(3)
    d = 16
    vecs = {
        "s1": rng.normal(0, 1.0, (120, d)) + rng.normal(0, 4.0, (120, 1)),
        "s2": rng.normal(0, 2.0, (90, d)),
    }
    rows = [
        (s, [float(x) for x in v])
        for s, m in vecs.items()
        for v in m
    ]
    src, ckpt, sink = (str(tmp_path / p) for p in ("src", "ckpt", "sink"))
    os.makedirs(src)

    def write_batch(name, batch_rows):
        with open(os.path.join(src, name), "w") as f:
            for s, v in batch_rows:
                f.write(json.dumps({"source": s, "embedding": v}) + "\n")

    def run():
        stream = spark.readStream.schema(
            "source string, embedding array<double>"
        ).json(src)
        q = (
            fd_sketch_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(rows) // 2
    write_batch("b1.json", rows[:half])
    run()
    write_batch("b2.json", rows[half:])
    run()

    out = spark.read.parquet(sink).collect()
    for s, a in vecs.items():
        latest = max(r["ver"] for r in out if r["source"] == s)
        b = np.array(
            [
                r["vector"]
                for r in sorted(
                    (r for r in out if r["source"] == s and r["ver"] == latest),
                    key=lambda r: r["row_idx"],
                )
            ]
        )
        assert len(b) <= FD_ELL
        err = np.linalg.norm(a.T @ a - b.T @ b, 2)
        bound = (a**2).sum() / FD_ELL
        assert err <= bound, (s, err, bound)
