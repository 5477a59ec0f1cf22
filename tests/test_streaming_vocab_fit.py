"""Streaming tokenizer-fit twins: running OOV (frozen vocab) and
length histogram must equal their batch forms over the same rows
(default tier) and keep folding on the same checkpoint (nightly —
the multi-batch wait is the cost, DECISIONS #17)."""

from __future__ import annotations

import json
import os

import pytest

import pyspark.sql.functions as F

from bread_spark.extensions.vocab_fit import doc_length_histogram_df
from bread_spark.streaming.vocab_fit import (
    length_histogram_stream,
    oov_stream_against_vocab,
)
from tests.test_vocab_fit import DOCS_SCHEMA, _uni

BATCH1 = [
    (1, "s1", "a a b c d"),
    (2, "s2", "a b"),
]
BATCH2 = [
    (3, "s1", "d d d"),
]


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for doc_id, source, text in rows:
            f.write(
                json.dumps(
                    {"doc_id": doc_id, "source": source, "text": text}
                )
                + "\n"
            )


def _run(spark, src, ckpt, table, fn):
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
    return spark.sql(f"SELECT * FROM {table}")


def _frozen_vocab(spark):
    """Top-2 of batch1's counts — frozen across batches."""
    batch1 = spark.createDataFrame(BATCH1, DOCS_SCHEMA)
    return (
        _uni(spark, batch1)
        .orderBy(F.desc("n"), F.desc("token"))
        .limit(2)
        .select("token", F.lit(1).alias("in_vocab"))
    )


def test_both_twins_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ck_o, ck_h = str(tmp_path / "cko"), str(tmp_path / "ckh")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    batch1 = spark.createDataFrame(BATCH1, DOCS_SCHEMA)
    vocab = _frozen_vocab(spark)

    got = _run(
        spark, src, ck_o, "oov_t1", lambda s: oov_stream_against_vocab(s, vocab)
    )
    want = oov_stream_against_vocab(batch1, vocab)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }

    got_h = _run(spark, src, ck_h, "hist_t1", length_histogram_stream)
    want_h = doc_length_histogram_df(batch1)
    assert {tuple(r) for r in got_h.collect()} == {
        tuple(r) for r in want_h.collect()
    }


@pytest.mark.nightly
def test_both_twins_fold_on_the_same_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ck_o, ck_h = str(tmp_path / "cko"), str(tmp_path / "ckh")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    vocab = _frozen_vocab(spark)
    _run(spark, src, ck_o, "oov_n1", lambda s: oov_stream_against_vocab(s, vocab))
    _run(spark, src, ck_h, "hist_n1", length_histogram_stream)

    _write(src, "b2.json", BATCH2)
    both = spark.createDataFrame(BATCH1 + BATCH2, DOCS_SCHEMA)
    got2 = _run(
        spark, src, ck_o, "oov_n2", lambda s: oov_stream_against_vocab(s, vocab)
    )
    assert {tuple(r) for r in got2.collect()} == {
        tuple(r) for r in oov_stream_against_vocab(both, vocab).collect()
    }
    got_h2 = _run(spark, src, ck_h, "hist_n2", length_histogram_stream)
    assert {tuple(r) for r in got_h2.collect()} == {
        tuple(r) for r in doc_length_histogram_df(both).collect()
    }
