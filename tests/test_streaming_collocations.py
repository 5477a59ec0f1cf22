"""Streaming collocation counts: the online count tables must equal
the batch tokenization's counts and feed the BATCH scorer (default
tier); the same checkpoints must keep folding new batches (nightly —
the multi-batch wait is the cost, DECISIONS #17)."""

from __future__ import annotations

import json
import os

import pytest

from bread_spark.extensions.collocations import pmi_collocations_df
from bread_spark.streaming.collocations import (
    collocation_bigram_stream,
    collocation_unigram_stream,
)
from tests.test_collocations import DOCS_SCHEMA, _counts

BATCH1 = [
    (1, "s", "a b a b c"),
    (2, "s", "a b x"),
]
BATCH2 = [
    (3, "s", "a b c c c"),
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


def test_counts_match_batch_and_feed_the_batch_scorer(spark, tmp_path):
    src = str(tmp_path / "src")
    ck_u, ck_b = str(tmp_path / "cku"), str(tmp_path / "ckb")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    uni_s = _run(spark, src, ck_u, "col_u1", collocation_unigram_stream)
    big_s = _run(spark, src, ck_b, "col_b1", collocation_bigram_stream)
    uni_b, big_b = _counts(spark, BATCH1)
    assert {tuple(r) for r in uni_s.collect()} == {
        tuple(r) for r in uni_b.collect()
    }
    assert {tuple(r) for r in big_s.collect()} == {
        tuple(r) for r in big_b.collect()
    }
    # snapshot → BATCH scorer = the batch report — one implementation
    got = pmi_collocations_df(uni_s, big_s).collect()
    want = pmi_collocations_df(uni_b, big_b).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


@pytest.mark.nightly
def test_counts_fold_on_the_same_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ck_u, ck_b = str(tmp_path / "cku"), str(tmp_path / "ckb")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    _run(spark, src, ck_u, "col_nu1", collocation_unigram_stream)
    _run(spark, src, ck_b, "col_nb1", collocation_bigram_stream)
    _write(src, "b2.json", BATCH2)
    uni_s2 = _run(spark, src, ck_u, "col_nu2", collocation_unigram_stream)
    big_s2 = _run(spark, src, ck_b, "col_nb2", collocation_bigram_stream)
    uni_b2, big_b2 = _counts(spark, BATCH1 + BATCH2)
    assert {tuple(r) for r in uni_s2.collect()} == {
        tuple(r) for r in uni_b2.collect()
    }
    got = pmi_collocations_df(uni_s2, big_s2).collect()
    want = pmi_collocations_df(uni_b2, big_b2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) >= 1  # (a,b) reaches MIN_PAIR across the fold
