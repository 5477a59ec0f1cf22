"""Tokenizer-fit diagnostics: hand-computed OOV rates (including the
deterministic vocab-cut tie-break) and doubling-bucket boundaries."""

from __future__ import annotations

import pyspark.sql.functions as F

from bread_spark.extensions.vocab_fit import (
    doc_length_histogram_df,
    oov_rate_by_source,
    oov_rate_df,
)

DOCS_SCHEMA = "doc_id long, source string, text string"


def _uni(spark, docs):
    return (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_oov_hand_computed_with_tied_cut(spark):
    """vocab_size=2 over counts {a:3, b:2, c:2, d:1}: the count tie at
    the cut resolves to the lexicographically LARGER token (c in, b
    out), so OOV(s1) counts b and d."""
    docs = spark.createDataFrame(
        [
            (1, "s1", "a a b c d"),
            (2, "s1", "a b c"),
            (3, "s2", "c"),
        ],
        DOCS_SCHEMA,
    )
    got = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in oov_rate_df(docs, _uni(spark, docs), vocab_size=2).collect()
    }
    # vocab = {a (3), c (2, beats b lexicographically)}
    assert got["s1"] == (8, 3, 375_000)  # b, b, d OOV; 3e6 div 8
    assert got["s2"] == (1, 0, 0)


def test_oov_real_corpus_bounds(spark, sf_dir):
    rows = oov_rate_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_micro"] == r["n_oov"] * 1_000_000 // r["n_tokens"]


def test_length_histogram_doubling_boundaries(spark):
    """Bucket = floor(log2)+1: 1→1, 2,3→2, 8→4; the empty doc (0
    tokens) lands in bucket 1 with zero mass."""
    docs = spark.createDataFrame(
        [
            (1, "s", "w"),
            (2, "s", "w w"),
            (3, "s", "w w w"),
            (4, "s", "w w w w w w w w"),
            (5, "s", ""),
        ],
        DOCS_SCHEMA,
    )
    got = {
        r["bucket"]: (r["bucket_lo"], r["n_docs"], r["token_mass"])
        for r in doc_length_histogram_df(docs).collect()
    }
    assert got[1] == (1, 2, 1)  # the 1-token doc + the empty doc
    assert got[2] == (2, 2, 5)  # 2- and 3-token docs
    assert got[4] == (8, 1, 8)
    assert set(got) == {1, 2, 4}
