"""Streaming A-ES reservoir (streaming/sampling.py): the per-source
reservoir after any stream prefix must equal the batch stratified
sampler over exactly that prefix — the priorities are the SHARED
deterministic `_wrs_scored` expression, so agreement is exact, row for
row, including across a checkpoint restart."""

from __future__ import annotations

import pytest

import json
import os

DOCS_SCHEMA = "doc_id long, source string, text string"

BATCH1 = [
    (1, "s1", "alpha beta gamma alpha delta"),
    (2, "s1", "beta beta epsilon"),
    (3, "s1", "zeta eta theta iota kappa lam mu nu"),
    (4, "s2", "one two"),
    (5, "s2", "three"),
]
BATCH2 = [
    (6, "s1", "short"),
    (7, "s2", "four five six seven"),
    (8, "s3", "fresh source text here"),
    (9, "s3", ""),  # zero tokens: carries no mass, never sampled
]


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for doc_id, source, text in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "source": source, "text": text}) + "\n"
            )


def _batch_docs(spark, rows):
    return spark.createDataFrame(
        [{"doc_id": d, "source": s, "text": t} for d, s, t in rows], DOCS_SCHEMA
    )


def _run(spark, src, ckpt, out, k):
    from bread_spark.streaming.sampling import weighted_reservoir_stream

    stream = spark.readStream.schema(DOCS_SCHEMA).json(src)
    q = (
        weighted_reservoir_stream(stream, k=k)
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
        (r["source"], r["rank"]): (r["doc_id"], r["n_tokens"], r["priority"])
        for r in rows
        if r["ver"] == latest[r["source"]]
    }


@pytest.mark.nightly  # restart/multi-batch wait dominates (r9 tier split)
def test_reservoir_stream_matches_batch_and_folds_on_restart(spark, tmp_path):
    from bread_spark.functions.text import weighted_sample_by_source_df

    k = 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)

    def want(rows):
        return {
            (r["source"], r["rank"]): (r["doc_id"], r["n_tokens"], r["priority"])
            for r in weighted_sample_by_source_df(
                _batch_docs(spark, rows), k=k
            ).collect()
        }

    assert _run(spark, src, ckpt, out, k) == want(BATCH1)

    _write(src, "b2.json", BATCH2)
    got2 = _run(spark, src, ckpt, out, k)  # checkpoint restart + fold
    assert got2 == want(BATCH1 + BATCH2)
    assert any(s == "s3" for s, _ in got2)  # the new source surfaced
    assert all(d != 9 for d, _, _ in got2.values())  # zero-token doc absent
