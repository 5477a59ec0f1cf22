"""Batch/stream agreement for the Naive Bayes scorer twin
(streaming/classify.py): the streamed predictions, log-scores, and
margins must equal the batch entry's rows exactly — the integer
micro-log arithmetic and the shared (score DESC, lang DESC) tie-break
leave no room for drift. Includes a checkpoint restart (the second
availableNow run resumes from the first's offsets)."""

from __future__ import annotations

import pytest

import datetime
import json
import os

import pyspark.sql.functions as F

from bread_spark.extensions.classify import (
    _tagged_docs,
    nb_lang_model,
    nb_lang_scores,
    nb_priors_df,
)
from bread_spark.streaming.classify import nb_score_stream_against_base
from tests.conftest import SF_DIR


def test_nb_stream_scores_agree_with_batch(spark, tmp_path):
    model = nb_lang_model(spark, SF_DIR)
    priors = nb_priors_df(_tagged_docs(spark, SF_DIR), model).localCheckpoint()

    batch = nb_lang_scores(spark, SF_DIR)
    sample = {
        r["doc_id"]: r
        for r in batch.limit(8).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id").isin(list(sample)))
        .select("doc_id", "text")
        .collect()
    }

    ts = datetime.datetime(2024, 8, 1, 12, 0).isoformat()
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for doc_id, text in texts.items():
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "payload": text}) + "\n")

    def _run():
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, payload string"
        ).json(src)
        q = (
            nb_score_stream_against_base(stream, model, priors)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    # append mode holds rows until the watermark passes — push it with a
    # later doc; the second run is also the checkpoint-restart pin
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "doc_id": 999_999,
                    "ts": datetime.datetime(2024, 8, 2, 12, 0).isoformat(),
                    "payload": "later",
                }
            )
            + "\n"
        )
    _run()

    got = {
        r["doc_id"]: (r["pred_lang"], r["logp"], r["margin"])
        for r in spark.read.parquet(sink).collect()
        if r["doc_id"] in sample
    }
    assert set(got) == set(sample)
    for doc_id, r in sample.items():
        assert got[doc_id] == (r["pred_lang"], r["logp"], r["margin"]), doc_id


@pytest.mark.nightly  # restart/multi-batch wait dominates (r9 tier split)
def test_nb_model_stream_counts_match_batch_and_fold_on_restart(spark, tmp_path):
    """The streaming count table after any prefix equals the batch count
    table over that prefix, and a snapshot through nb_counts_to_model
    equals the from-scratch model — online training IS the batch build."""
    from bread_spark.extensions.classify import (
        _token_rows,
        nb_counts_to_model,
    )
    from bread_spark.streaming.classify import nb_model_count_stream

    B1 = [
        (1, "en", "alpha beta gamma alpha"),
        (2, "fr", "beta delta"),
        (3, "en", "epsilon"),
    ]
    B2 = [(4, "fr", "alpha zeta zeta"), (5, "de", "eta theta")]
    schema = "doc_id long, lang string, text string"

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)

    def _write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for d, lang, text in rows:
                f.write(json.dumps({"doc_id": d, "lang": lang, "text": text}) + "\n")

    def _run(table):
        stream = spark.readStream.schema(schema).json(src)
        q = (
            nb_model_count_stream(stream)
            .writeStream.format("memory")
            .queryName(table)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["lang"], r["bucket"]): r["cnt"]
            for r in spark.sql(f"SELECT * FROM {table}").collect()
        }

    def batch_counts(rows):
        frame = spark.createDataFrame(
            [{"doc_id": d, "lang": s, "text": t} for d, s, t in rows], schema
        )
        return {
            (r["lang"], r["bucket"]): r["cnt"]
            for r in _token_rows(frame, "lang")
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    _write("b1.json", B1)
    assert _run("nb_counts_t1") == batch_counts(B1)

    _write("b2.json", B2)
    got2 = _run("nb_counts_t2")  # checkpoint restart + fold
    assert got2 == batch_counts(B1 + B2)

    # snapshot → dense model equals the from-scratch build on the prefix
    snap = spark.createDataFrame(
        [{"lang": k[0], "bucket": k[1], "cnt": v} for k, v in got2.items()],
        "lang string, bucket long, cnt long",
    )
    want_counts = batch_counts(B1 + B2)
    full = spark.createDataFrame(
        [{"lang": k[0], "bucket": k[1], "cnt": v} for k, v in want_counts.items()],
        "lang string, bucket long, cnt long",
    )
    got_model = {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"])
        for r in nb_counts_to_model(snap).collect()
    }
    want_model = {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"])
        for r in nb_counts_to_model(full).collect()
    }
    assert got_model == want_model
