"""Source-similarity cartography: hand-computed cosines on constructed
centroids, scale invariance, pair coverage, and real-data bounds."""

from __future__ import annotations

from bread_spark.extensions.source_sim import (
    similarity_matrix_df,
    source_similarity_matrix,
    source_sums_df,
)

EMB_SCHEMA = "source string, embedding array<float>"


def _matrix(spark, rows):
    docs = spark.createDataFrame(rows, EMB_SCHEMA)
    return {
        (r["source_a"], r["source_b"]): r["cosine"]
        for r in similarity_matrix_df(source_sums_df(docs)).collect()
    }


def test_hand_computed_cosines(spark):
    """Parallel centroids → 1.0, orthogonal → 0.0, opposite → −1.0 —
    and cosine reads the MEAN direction, invariant to per-source
    vector counts."""
    rows = [
        ("s1", [1.0, 0.0]),
        ("s1", [1.0, 0.0]),  # duplicate mass must not change anything
        ("s2", [2.0, 0.0]),  # parallel to s1, different magnitude
        ("s3", [0.0, 1.0]),  # orthogonal to s1
        ("s4", [-1.0, 0.0]),  # opposite to s1
    ]
    got = _matrix(spark, rows)
    assert got[("s1", "s2")] == 1.0
    assert got[("s1", "s3")] == 0.0
    assert got[("s1", "s4")] == -1.0
    assert got[("s2", "s3")] == 0.0
    # every unordered pair exactly once
    assert len(got) == 6


def test_mixed_source_centroid(spark):
    """s2's centroid is the mean of its two vectors: cos(e1, (e1+e2)/2)
    = 1/sqrt(2) for orthonormal e1, e2."""
    rows = [
        ("s1", [1.0, 0.0]),
        ("s2", [1.0, 0.0]),
        ("s2", [0.0, 1.0]),
    ]
    got = _matrix(spark, rows)
    assert got[("s1", "s2")] == 0.7071


def test_real_corpus_matrix(spark, sf_dir):
    rows = source_similarity_matrix(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert -1.0 <= r["cosine"] <= 1.0
        seen.add((r["source_a"], r["source_b"]))
    assert len(seen) == len(rows)  # each pair once
