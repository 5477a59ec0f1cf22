"""Semantic tests for span-level (ExactSubstr-style) dedup — dedup.py's
`duplicate_spans` / `span_dedup_report`. The DuckDB differential in
test_oracle.py certifies value equality on the real tables; these pin the
contracts on a constructed corpus where the ground truth is known exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.extensions import dedup
from bread_spark.plans.materialize import clear_materialized_frames


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tok(i: int) -> str:
    return f"t{i}"


def _text(idxs) -> str:
    return " ".join(_tok(i) for i in idxs)


W = dedup.SPAN_W


@pytest.fixture()
def corpus(spark):
    """Known ground truth:
    - docs 1 and 2 share an exact (W+5)-token run (→ 6 shared windows),
      embedded at different offsets inside otherwise-disjoint text
    - doc 3 is completely unique
    - doc 4 has W-1 tokens (zero windows)
    - doc 5 duplicates doc 1 verbatim
    """
    shared = list(range(1000, 1000 + W + 5))
    d1 = _text(list(range(0, 10)) + shared + list(range(50, 60)))
    d2 = _text(list(range(100, 120)) + shared)
    d3 = _text(range(200, 200 + 2 * W))
    d4 = _text(range(300, 300 + W - 1))
    return _mk(
        spark,
        [(1, d1), (2, d2), (3, d3), (4, d4), (5, d1)],
    )


def test_window_count_is_tokens_minus_w_plus_one(spark, corpus):
    wins = dedup._span_windows(corpus)
    counts = {
        r["doc_id"]: r["n"]
        for r in wins.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # doc 1: 10 + (W+5) + 10 tokens → (W+25) - W + 1 = 26 windows
    assert counts[1] == 26
    assert counts[3] == W + 1  # 2W tokens
    assert 4 not in counts  # shorter than W → no windows


def test_shared_run_produces_expected_duplicate_spans(spark, corpus):
    """A shared (W+5)-token run yields exactly 6 duplicated windows between
    docs 1/2; doc 5 (verbatim dup of 1) duplicates every one of doc 1's 26
    windows. Total distinct duplicated spans = 26 (doc-5 set ⊇ shared set)."""
    clear_materialized_frames()
    wins = dedup._span_windows(corpus)
    dup = (
        wins.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    rows = dup.collect()
    assert len(rows) == 26
    # the 6 windows fully inside the shared run are in all of docs 1, 2, 5
    assert sum(1 for r in rows if r["n_docs"] == 3) == 6
    assert sum(1 for r in rows if r["n_docs"] == 2) == 20


def test_report_coverage_and_keep_verdicts(spark, corpus):
    rep = {
        r["doc_id"]: r
        for r in dedup.span_dedup_report_df(corpus).collect()
    }
    # doc 1 / 5: every window duplicated (verbatim copy) → dup_frac 1, drop
    for d in (1, 5):
        assert rep[d]["n_windows"] == 26
        assert rep[d]["n_dup_windows"] == 26
        assert rep[d]["dup_frac"] == 1.0
        assert rep[d]["keep"] is False
    # doc 2: 20 + (W+5) = W+25 tokens → 26 windows; only the 6 fully
    # inside the shared run are duplicated → keep (2·6 ≤ 26)
    assert rep[2]["n_windows"] == 26
    assert rep[2]["n_dup_windows"] == 6
    assert rep[2]["keep"] is True
    # doc 3: unique → 0 duplicated
    assert rep[3]["n_dup_windows"] == 0 and rep[3]["keep"] is True
    # doc 4: too short → zero windows, kept by contract
    assert rep[4]["n_windows"] == 0
    assert rep[4]["dup_frac"] == 0.0
    assert rep[4]["keep"] is True


def test_keep_boundary_is_integer_exact(spark):
    """Exactly-half coverage keeps the doc (2·dup ≤ total) — the verdict is
    decided on integers, so there is no float boundary to disagree on."""
    # two docs sharing a W-token run, each with exactly 2 windows: one
    # shared (the run), one unique → dup_frac exactly 0.5
    shared = list(range(1000, 1000 + W))
    a = _text([1] + shared)  # W+1 tokens → windows at pos 1 (unique), 2 (shared)
    b = _text([2] + shared)
    docs = _mk(spark, [(1, a), (2, b)])
    rep = {r["doc_id"]: r for r in dedup.span_dedup_report_df(docs).collect()}
    for d in (1, 2):
        assert rep[d]["n_windows"] == 2
        assert rep[d]["n_dup_windows"] == 1
        assert rep[d]["dup_frac"] == 0.5
        assert rep[d]["keep"] is True


def test_cross_dedup_spans_flags_recycled_content(spark):
    """Base corpus holds one doc; the refresh batch holds a verbatim copy
    (drop), a doc that is mostly base content with a fresh prefix (drop),
    a light quoter (keep), and fresh content (keep)."""
    base_run = list(range(1000, 1000 + 3 * W))
    base = _mk(spark, [(1, _text(base_run))])
    copy = _text(base_run)  # 3W tokens, every window known
    # 2W base tokens + 5 fresh: W+6 of 2W+6-W+1=W+6 windows... mostly known
    stitched = _text(list(range(2000, 2005)) + base_run[: 2 * W])
    quoter = _text(list(range(3000, 3000 + 3 * W)) + base_run[:W])
    fresh = _text(range(4000, 4000 + 2 * W))
    new = _mk(spark, [(10, copy), (11, stitched), (12, quoter), (13, fresh)])
    rep = {r["doc_id"]: r for r in dedup.cross_dedup_spans_df(base, new).collect()}
    assert rep[10]["base_frac"] == 1.0 and rep[10]["keep"] is False
    # stitched: 2W+5 tokens → W+6 windows; the W+1 windows fully inside
    # the copied 2W-token run are known → frac (W+1)/(W+6) > 1/2 → drop
    assert rep[11]["n_windows"] == W + 6
    assert rep[11]["n_base_windows"] == W + 1
    assert rep[11]["keep"] is False
    # quoter: 4W tokens → 3W+1 windows, only 1 window (the quoted W-run)
    # fully inside base content → keep
    assert rep[12]["n_base_windows"] == 1
    assert rep[12]["keep"] is True
    assert rep[13]["n_base_windows"] == 0 and rep[13]["keep"] is True


def test_cross_dedup_spans_agrees_with_exact_gate(spark, sf_dir):
    """Any ≥W-token doc dropped by the EXACT gate (byte-identical to a
    base doc) must also be dropped by the span gate — verbatim copies have
    base_frac 1.0 by construction."""
    from bread_spark.io import load_table

    clear_materialized_frames()
    docs = load_table(spark, sf_dir, "documents")
    base_max = dedup.CROSS_DEDUP_BASE_MAX
    exact_survivor_ids = {
        r["doc_id"] for r in dedup.cross_dedup(spark, sf_dir).collect()
    }
    exact_dropped = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") >= base_max).select("doc_id").collect()
    } - exact_survivor_ids
    span_rep = {
        r["doc_id"]: r for r in dedup.cross_dedup_spans(spark, sf_dir).collect()
    }
    for d in exact_dropped:
        if span_rep[d]["n_windows"] > 0:
            assert span_rep[d]["base_frac"] == 1.0
            assert span_rep[d]["keep"] is False


def test_no_cartesian_product_in_plans(spark, sf_dir):
    clear_materialized_frames()
    for q in (dedup.duplicate_spans, dedup.span_dedup_report, dedup.cross_dedup_spans):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    clear_materialized_frames()


def test_span_dedup_corpus_is_exactly_the_keepers(spark, sf_dir):
    clear_materialized_frames()
    keep_ids = {
        r["doc_id"]
        for r in dedup.span_dedup_report(spark, sf_dir).filter(F.col("keep")).collect()
    }
    corpus_ids = {r["doc_id"] for r in dedup.span_dedup_corpus(spark, sf_dir).collect()}
    assert corpus_ids == keep_ids
    clear_materialized_frames()


def test_cluster_size_histogram_hand_case(spark):
    """Sizes 1,1,2,3,4,8 → buckets 1:{1,1}, 2:{2,3}, 3:{4}, 4:{8};
    bucket_lo is the exact power of two; doc mass conserves."""
    from bread_spark.extensions.dedup import cluster_size_histogram_df

    rows = []
    did = 0
    for cid, size in [(100, 1), (200, 1), (300, 2), (400, 3), (500, 4), (600, 8)]:
        for _ in range(size):
            rows.append((did, cid))
            did += 1
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    got = {r["bucket"]: r for r in cluster_size_histogram_df(clusters).collect()}
    assert {b: (got[b]["n_clusters"], got[b]["n_docs"]) for b in got} == {
        1: (2, 2), 2: (2, 5), 3: (1, 4), 4: (1, 8),
    }
    assert {b: got[b]["bucket_lo"] for b in got} == {1: 1, 2: 2, 3: 4, 4: 8}


def test_cluster_size_histogram_corpus_conserves(spark, sf_dir):
    """Σ n_docs over buckets ≡ corpus size; singleton bucket count is
    the number of clusters of size exactly 1."""
    from bread_spark.extensions.dedup import dedup_cluster_sizes
    from bread_spark.io import load_table

    rows = dedup_cluster_sizes(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_clusters"] <= r["n_docs"]
        assert r["bucket_lo"] == 1 << (r["bucket"] - 1)
