"""Invariant tests for the r4 curation operators (extensions/curation.py).

The DuckDB differential in test_oracle.py certifies value equality; these
pin the SEMANTIC contracts that a hash can't express.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bread_spark.extensions import curation
from bread_spark.io import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_chunks_kept_exactly_once(spark):
    """Every surviving chunk text appears exactly once across the whole
    deduped corpus (global first-occurrence-wins)."""
    out = curation.paragraph_dedup(spark, SF_DIR)
    chunks = out.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / "
                f"{curation.CHUNK_TOKENS}.0) as int) - 1), "
                f"i -> array_join(slice(split(text, ' '), "
                f"i * {curation.CHUNK_TOKENS} + 1, {curation.CHUNK_TOKENS}), ' '))"
            )
        ).alias("chunk")
    )
    dupes = chunks.groupBy("chunk").count().filter("count > 1").count()
    assert dupes == 0


def test_paragraph_dedup_exact_dup_doc_loses_all_chunks(spark):
    """A document whose text is an exact duplicate of an earlier one keeps
    zero chunks (so it has no output row); the earlier doc keeps all.
    A partial overlap keeps only the novel chunks."""
    base = " ".join(f"tok{i}" for i in range(64))  # exactly 2 chunks of 32
    novel = " ".join(f"new{i}" for i in range(32))
    frame = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " " + novel)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.paragraph_dedup_df(frame).collect()}
    assert out[0]["n_kept"] == out[0]["n_chunks"] == 2
    assert 1 not in out  # exact dup: zero surviving chunks → no row
    assert out[2]["n_chunks"] == 3 and out[2]["n_kept"] == 1
    assert out[2]["text"] == novel


def test_paragraph_dedup_counts_and_reassembly(spark):
    out = curation.paragraph_dedup(spark, SF_DIR).collect()
    assert out, "deduped corpus should be non-empty"
    for r in out:
        assert 1 <= r["n_kept"] <= r["n_chunks"]
        assert r["text"]  # non-empty reassembled text


# ---------------------------------------------------------------------------
# domain_quota_sample
# ---------------------------------------------------------------------------


def test_domain_quota_respected_and_deterministic(spark, docs):
    out = curation.domain_quota_sample(spark, SF_DIR)
    per_source = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per_source.items():
        assert n == min(curation.DOMAIN_QUOTA, totals[src])
    # deterministic: same selection on a re-run
    again = {(r["doc_id"], r["source"]) for r in curation.domain_quota_sample(spark, SF_DIR).collect()}
    first = {(r["doc_id"], r["source"]) for r in out.collect()}
    assert first == again


# ---------------------------------------------------------------------------
# corpus_mix
# ---------------------------------------------------------------------------


def test_corpus_mix_epoch_counts_bracket_weight(spark, docs):
    """Every doc of a source with weight w appears floor(w) or ceil(w)
    times, with contiguous epoch numbering from 0."""
    out = curation.corpus_mix(spark, SF_DIR)
    counts = out.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("copies"), F.max("epoch").alias("max_e"), F.min("epoch").alias("min_e")
    )
    for r in counts.collect():
        w = curation.MIX_WEIGHTS.get(r["source"], curation.DEFAULT_MIX_WEIGHT)
        assert math.floor(w) <= r["copies"] <= math.ceil(w)
        assert r["min_e"] == 0 and r["max_e"] == r["copies"] - 1


def test_corpus_mix_fractional_rate_tracks_weight(spark, docs):
    """Across many docs, the realized copy rate of a fractional-weight
    source approaches its weight (md5 gate ~ uniform)."""
    out = curation.corpus_mix(spark, SF_DIR)
    n_docs = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_rows = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, w in curation.MIX_WEIGHTS.items():
        if src not in n_docs or n_docs[src] < 20:
            continue
        rate = n_rows.get(src, 0) / n_docs[src]
        assert abs(rate - w) <= 0.35, f"{src}: rate {rate:.2f} vs weight {w}"


# ---------------------------------------------------------------------------
# unigram_logprob_scores
# ---------------------------------------------------------------------------


def test_unigram_logprob_bounds_and_coverage(spark, docs):
    out = curation.unigram_logprob_scores(spark, SF_DIR)
    rows = out.collect()
    # every doc with ≥1 token is scored
    n_docs = docs.filter(F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0).count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["mean_logp"] < 0  # log prob of non-certain events
        assert r["n_tokens"] >= 1


def test_unigram_logprob_common_beats_rare(spark):
    """A document of corpus-common tokens must score higher than one of
    rare tokens — the ordering the quality filter relies on."""
    from bread_spark.extensions.curation import unigram_logprob_scores

    out = unigram_logprob_scores(spark, SF_DIR)
    toks = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    lm = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # per-doc mean token frequency should correlate with mean_logp sign-wise:
    # take the best and worst scored docs and compare their mean token counts
    scored = {r["doc_id"]: r["mean_logp"] for r in out.collect()}
    best = max(scored, key=scored.get)
    worst = min(scored, key=scored.get)
    freq = (
        toks.join(lm, "token")
        .groupBy("doc_id")
        .agg(F.avg(F.log10("n")).alias("mean_log_n"))
    )
    f = {r["doc_id"]: r["mean_log_n"] for r in freq.collect()}
    assert f[best] > f[worst]
