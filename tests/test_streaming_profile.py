"""Streaming profile twin: the mergeable lanes (counts + XOR
fingerprint) maintained over a document stream must equal the batch
profile of the same rows (default tier), and must keep folding after
more data lands on the same checkpoint (nightly — the multi-batch
wait is the cost, DECISIONS #17)."""

from __future__ import annotations

import json
import os

import pytest

from bread_spark.extensions.profile import table_profile_df
from bread_spark.io import load_table
from bread_spark.streaming.profile import profile_stream
from tests.conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

BATCH1 = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": None, "source": "s1", "n_chars": 5},
]
BATCH2 = [
    {"doc_id": 3, "text": "delta epsilon", "lang": "de", "source": "s2", "n_chars": 13},
]


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def _run(spark, src, ckpt, table_name):
    stream = spark.readStream.schema(DOCS_SCHEMA).json(src)
    q = (
        profile_stream(stream, "documents")
        .writeStream.format("memory")
        .queryName(table_name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["table_name"], r["column_name"]): (
            r["n_rows"],
            r["n_nonnull"],
            r["xor_lane"],
        )
        for r in spark.sql(f"SELECT * FROM {table_name}").collect()
    }


def _batch_lanes(spark, rows):
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    # batch profile restricted to documents' columns and mergeable lanes
    prof = table_profile_df(
        load_table(spark, SF_DIR, "orders").limit(0),
        docs,
        load_table(spark, SF_DIR, "events").limit(0),
    )
    return {
        (r["table_name"], r["column_name"]): (
            r["n_rows"],
            r["n_nonnull"],
            r["xor_lane"],
        )
        for r in prof.collect()
        if r["table_name"] == "documents"
    }


def test_profile_stream_matches_batch(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    got1 = _run(spark, src, ckpt, "prof_t1")
    assert got1 == _batch_lanes(spark, BATCH1)
    # NULL lang accounted: n_nonnull < n_rows for exactly that column
    assert got1[("documents", "lang")][1] == got1[("documents", "lang")][0] - 1


@pytest.mark.nightly
def test_profile_stream_folds_more_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, "b1.json", BATCH1)
    _run(spark, src, ckpt, "prof_n1")
    # more rows land; the SAME checkpoint folds them in
    _write(src, "b2.json", BATCH2)
    got2 = _run(spark, src, ckpt, "prof_n2")
    assert got2 == _batch_lanes(spark, BATCH1 + BATCH2)
