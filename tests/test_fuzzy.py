"""Fuzzy (edit-distance) dedup: blocking recall, verify exactness, and
the greedy corpus rule."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bread_spark.extensions.fuzzy import (
    FUZZY_MAX_DIST,
    fuzzy_dedup_corpus,
    fuzzy_dup_pairs,
    fuzzy_pairs_df,
)
from tests.conftest import SF_DIR


_BRUTE_CACHE: dict[str, dict[tuple[int, int], int]] = {}


def _brute_pairs(spark, sf_dir: str) -> dict[tuple[int, int], int]:
    """Ground truth by UNBLOCKED all-pairs Levenshtein — the scan the
    blocking exists to avoid — run in Spark (deliberate nested-loop
    join; 32-way JVM DP beats DuckDB's single-pipeline sweep ~20x
    here). Levenshtein itself is cross-engine-pinned by the family's
    DuckDB oracles, so the INDEPENDENT thing this truth must vary is
    the blocking, and it does: there is none. Memoized — two tests."""
    if sf_dir in _BRUTE_CACHE:
        return _BRUTE_CACHE[sf_dir]
    import pyspark.sql.functions as F

    from bread_spark.extensions.fuzzy import _norm_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    norm = _norm_docs(docs).localCheckpoint()
    a = norm.select(
        F.col("doc_id").alias("da"), F.col("s").alias("sa"),
        F.col("len").alias("la"),
    ).repartition(32, "da")
    b = norm.select(
        F.col("doc_id").alias("db"), F.col("s").alias("sb"),
        F.col("len").alias("lb"),
    )
    rows = (
        a.join(
            b,
            (F.col("da") < F.col("db"))
            & (F.abs(F.col("la") - F.col("lb")) <= FUZZY_MAX_DIST),
        )
        .withColumn("d", F.levenshtein("sa", "sb", FUZZY_MAX_DIST))
        .filter(F.col("d") >= 0)
        .select("da", "db", "d")
        .collect()
    )
    _BRUTE_CACHE[sf_dir] = {(r["da"], r["db"]): r["d"] for r in rows}
    return _BRUTE_CACHE[sf_dir]


def test_fuzzy_pairs_equal_brute_force(spark):
    """On the fixture corpus the prefix-filtered result EQUALS the
    unblocked brute force — precision 1.0 by construction (every
    candidate is re-verified with exact Levenshtein) and recall 1.0
    measured: near-dup pairs share their rarest df>=2 grams, which is
    exactly what the blocking indexes."""
    truth = _brute_pairs(spark, SF_DIR)
    assert truth, "fixture corpus should contain fuzzy-dup pairs"
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_dup_pairs(spark, SF_DIR).collect()
    }
    assert got == truth


def test_fuzzy_planted_mutations(spark):
    """Hand-constructed corpus: a base doc, a 3-substitution copy, a
    heavily-rewritten copy (beyond the threshold), and an unrelated doc.
    The pair set and the exact distances are both pinned."""
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet village rooftops at dusk tonight"
    )
    mutated = base.replace("quick", "quack").replace("rain", "ruin")
    far = " ".join(sorted(base.split()))  # same words, order destroyed
    other = (
        "completely different content about distributed query engines "
        "and columnar storage formats for analytical processing loads"
    )
    docs = spark.createDataFrame(
        [(0, base), (1, mutated), (2, far), (3, other)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_pairs_df(docs).collect()
    }
    # quick->quack is 1 substitution, rain->ruin is 1 -> total dist 2
    assert got == {(0, 1): 2}


def test_fuzzy_corpus_greedy_rule(spark):
    """Survivors are exactly the docs with no smaller-id partner in the
    PAIRS operator's output (itself brute-force-pinned above and
    oracle-checked), and n_fuzzy_partners counts each keeper's
    larger-id partners."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_dup_pairs(spark, SF_DIR).collect()
    }
    assert pairs
    dropped = {b for (_, b) in pairs}
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = fuzzy_dedup_corpus(spark, SF_DIR).collect()
    assert len(rows) == total - len(dropped)
    by_id = {r["doc_id"]: r["n_fuzzy_partners"] for r in rows}
    assert dropped.isdisjoint(by_id)
    for doc_id, n in by_id.items():
        assert n == sum(1 for (a, _) in pairs if a == doc_id)


def test_fuzzy_verify_threshold_boundary(spark):
    """The thresholded Levenshtein keeps dist == FUZZY_MAX_DIST and
    drops FUZZY_MAX_DIST + 1 — the boundary is inclusive, matching the
    oracle's `<=`."""
    base = "x" * 30 + " shared anchor text that blocks the pair " + "y" * 30
    at = "a" * FUZZY_MAX_DIST + base[FUZZY_MAX_DIST:]
    over = "a" * (FUZZY_MAX_DIST + 1) + base[FUZZY_MAX_DIST + 1 :]
    docs = spark.createDataFrame(
        [(0, base), (1, at), (2, over)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_pairs_df(docs).collect()
    }
    assert got.get((0, 1)) == FUZZY_MAX_DIST
    assert (0, 2) not in got


def test_byte_faithful_identity_on_ascii(spark):
    from bread_spark.extensions.fuzzy import byte_faithful

    df = spark.createDataFrame([("plain ascii text",)], "t string")
    row = df.select(
        (F.col("t") == byte_faithful("t")).alias("same"),
        F.levenshtein("t", byte_faithful("t")).alias("d"),
    ).collect()[0]
    assert row["same"] and row["d"] == 0


def test_multibyte_pair_verifies_at_byte_distance(spark):
    # 'é' replaces 'e' at 3 sites -> 3 char edits but 6 BYTE edits; the
    # family's contract (and DuckDB's levenshtein) counts bytes. The
    # texts must be long + similar enough to share >= 3 selected grams.
    base = "the quick brown fox jumps over the lazy dog again and again"
    mutated = base.replace("the quick", "thé quick").replace(
        "over the", "ovér thé"
    )
    docs = spark.createDataFrame(
        [(0, base), (1, mutated)], "doc_id long, text string"
    )
    rows = fuzzy_pairs_df(docs, min_shared=1).collect()
    assert len(rows) == 1
    assert rows[0]["dist"] == 6  # byte edits, not the 3 char edits


def test_byte_length_prefilter_keeps_equal_byte_len_pairs(spark):
    from bread_spark.extensions.fuzzy import byte_faithful

    # 24 ASCII chars (24B) vs 12 two-byte chars (24B): char-length diff
    # 12 > 10 would WRONGLY prune under a char prefilter; byte diff is 0
    a = "aaaaaaaaaaaaaaaaaaaaaaaa"
    b = "é" * 12
    df = spark.createDataFrame([(a, b)], "a string, b string")
    row = df.select(
        (F.octet_length("a") - F.octet_length("b")).alias("bdiff"),
        F.levenshtein(byte_faithful("a"), byte_faithful("b")).alias("bd"),
        (F.length("a") - F.length("b")).alias("cdiff"),
    ).collect()[0]
    assert row["bdiff"] == 0 and row["cdiff"] == 12
    assert row["bd"] <= 24  # well-defined byte distance either way
