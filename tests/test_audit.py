"""Corpus checksums: order-invariance, tamper sensitivity, and the
documented XOR pair-cancellation caveat."""

from __future__ import annotations

import pyspark.sql.functions as F

from bread_spark.extensions.audit import corpus_checksum_df
from bread_spark.io import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return {
        r["source"]: (
            r["n_docs"],
            r["xor_lane"],
            r["char_sum"],
            r["min_doc_id"],
            r["max_doc_id"],
        )
        for r in df.collect()
    }


def test_checksum_is_partitioning_invariant(spark):
    """XOR/count/sum are commutative folds — any repartitioning or row
    order must produce the identical audit table."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text", "doc_id"
    )
    base = _rows(corpus_checksum_df(docs))
    shuffled = _rows(
        corpus_checksum_df(
            docs.repartition(7, "doc_id").sortWithinPartitions(
                F.desc("doc_id")
            )
        )
    )
    assert base == shuffled
    assert None in base  # the rollup total row


def test_checksum_detects_single_char_tamper(spark):
    """Flipping one character in one doc must change that source's
    xor_lane (and the total row's), while n_docs stays put."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text", "doc_id"
    )
    tampered = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    a, b = _rows(corpus_checksum_df(docs)), _rows(corpus_checksum_df(tampered))
    victim_source = docs.filter("doc_id = 7").collect()[0]["source"]
    assert a[victim_source][1] != b[victim_source][1]
    assert a[None][1] != b[None][1]
    assert a[victim_source][0] == b[victim_source][0]
    # untouched sources are byte-identical
    for s in a:
        if s not in (victim_source, None):
            assert a[s] == b[s]


def test_checksum_pair_cancellation_caught_by_counts(spark):
    """The documented caveat: appending TWO copies of an existing doc
    leaves xor_lane unchanged (A xor A = 0) — but n_docs and char_sum
    both move, so the audit ROW still detects the difference."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text", "doc_id"
    )
    dup = docs.filter("doc_id = 3")
    padded = docs.unionByName(dup).unionByName(dup)
    a, b = _rows(corpus_checksum_df(docs)), _rows(corpus_checksum_df(padded))
    s = dup.collect()[0]["source"]
    assert a[s][1] == b[s][1]  # xor blind to the pair
    assert a[s][0] + 2 == b[s][0]  # count is not
    assert a[s][2] < b[s][2]  # char mass is not
