"""Scale smoke, part 3: r9+ family replication invariants. Split from
test_scale_smoke.py in r13 (VERDICT r12 #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.io import load_table
from tests.conftest import SF_DIR
from tests.scale_fixtures import REPS, big_docs_r6, big_events  # noqa: F401

# ---------------------------------------------------------------------------
# r9 second wave: replication invariants for the new families
# ---------------------------------------------------------------------------


def _colloc_counts(docs):
    """(uni, big) count tables from a (doc_id, text, ...) frame — the
    shared tokenization + BIGRAM_PAIRS_EXPR contract."""
    from bread_spark.extensions.curation import BIGRAM_PAIRS_EXPR

    toks_arr = F.filter(F.split("text", " "), lambda t: t != "")
    w = docs.select(toks_arr.alias("toks")).filter(F.size("toks") >= 1)
    uni = (
        w.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    big = (
        w.select(F.explode(F.expr(BIGRAM_PAIRS_EXPR)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    return uni, big


@pytest.mark.nightly  # replication smoke; default tier keeps the hand-computed score pins
def test_pmi_scores_exactly_replication_invariant(spark, big_docs_r6):
    """Every count scales by REPS and the two-step floor score is a
    floor of REPS-cancelling rationals — so for every pair ranked in
    BOTH top-100s the score is EXACTLY equal and the count exactly
    REPS×. The pair SETS legitimately differ: MIN_PAIR is an absolute
    count gate (deliberately not scaled — a bigger corpus admits rarer
    pairs), so replication lets base-count-1/2 pairs into the
    candidate pool."""
    from bread_spark.extensions.collocations import pmi_collocations_df

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi_lift_micro"])
        for r in pmi_collocations_df(*_colloc_counts(docs)).collect()
    }
    big = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi_lift_micro"])
        for r in pmi_collocations_df(*_colloc_counts(big_docs_r6)).collect()
    }
    shared = set(base) & set(big)
    assert len(shared) >= 50  # the stable head of the ranking
    for k in shared:
        n, score = base[k]
        assert big[k] == (n * REPS, score)
    # every newly-admitted pair was under the MIN_PAIR gate at base scale
    from bread_spark.extensions.collocations import MIN_PAIR

    for k in set(big) - set(base):
        assert big[k][0] < MIN_PAIR * REPS


@pytest.mark.nightly  # replication smoke; default tier keeps the tied-cut pins
def test_oov_rate_exactly_replication_invariant(spark, big_docs_r6):
    """The vocab cut survives ×REPS (every count scales together) and
    (R·a·1e6) div (R·b) == (a·1e6) div b exactly."""
    from bread_spark.extensions.vocab_fit import oov_rate_df

    docs = load_table(spark, SF_DIR, "documents").select("source", "text")
    base = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in oov_rate_df(docs, _colloc_counts(docs)[0]).collect()
    }
    big = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in oov_rate_df(
            big_docs_r6, _colloc_counts(big_docs_r6)[0]
        ).collect()
    }
    assert set(base) == set(big)
    for s, (nt, no, micro) in base.items():
        assert big[s] == (nt * REPS, no * REPS, micro)


@pytest.mark.nightly  # replication smoke; default tier keeps the boundary pins
def test_length_histogram_scales_exactly_linearly(spark, big_docs_r6):
    from bread_spark.extensions.vocab_fit import doc_length_histogram_df

    docs = load_table(spark, SF_DIR, "documents").select("source", "text")
    base = {
        (r["source"], r["bucket"]): (r["n_docs"], r["token_mass"])
        for r in doc_length_histogram_df(docs).collect()
    }
    big = {
        (r["source"], r["bucket"]): (r["n_docs"], r["token_mass"])
        for r in doc_length_histogram_df(big_docs_r6).collect()
    }
    assert set(base) == set(big)
    for k, (n, m) in base.items():
        assert big[k] == (n * REPS, m * REPS)


@pytest.mark.nightly  # replication smoke; default tier keeps tamper/invariance pins
def test_profile_replication_row_counts_and_xor_cancellation(spark, big_docs_r6):
    """×REPS documents: n_rows scales exactly; text n_distinct is
    invariant (same texts); with EVEN REPS the text xor lane cancels
    to 0 — the audit family's documented pair-cancellation, asserted
    here on purpose."""
    from bread_spark.extensions.profile import table_profile_df

    assert REPS % 2 == 0
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    empty_orders = load_table(spark, SF_DIR, "orders").limit(0)
    empty_events = load_table(spark, SF_DIR, "events").limit(0)
    base = {
        r["column_name"]: r
        for r in table_profile_df(empty_orders, docs, empty_events).collect()
        if r["table_name"] == "documents"
    }
    big = {
        r["column_name"]: r
        for r in table_profile_df(
            empty_orders, big_docs_r6.withColumn("n_chars", F.length("text")), empty_events
        ).collect()
        if r["table_name"] == "documents"
    }
    for col in base:
        assert big[col]["n_rows"] == base[col]["n_rows"] * REPS
    assert big["text"]["n_distinct"] == base["text"]["n_distinct"]
    assert big["doc_id"]["n_distinct"] == base["doc_id"]["n_distinct"] * REPS
    assert big["text"]["xor_lane"] == 0  # even-REPS cancellation


@pytest.mark.nightly  # replication smoke; default tier keeps hand-computed attribution pins
def test_novelty_replicas_inherit_everything(spark):
    """Disjoint-id replicas of a posting index share every shingle with
    the base copy, so every replica doc scores novelty 0 and every
    base doc's row is unchanged."""
    from bread_spark.extensions.graph import novelty_scores_df

    postings = spark.createDataFrame(
        [(1, "s1"), (1, "s2"), (2, "s1"), (2, "s3")],
        "doc_id long, shingle string",
    )
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = postings.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000).alias("doc_id"), "shingle"
    )
    base = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in novelty_scores_df(postings).collect()
    }
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in novelty_scores_df(big).collect()
    }
    assert len(got) == len(base) * REPS
    for doc_id, (n, novel) in base.items():
        assert got[doc_id] == (n, novel)  # base rows unchanged
    for doc_id, (n, novel) in got.items():
        if doc_id >= 1_000:
            assert novel == 0  # replicas inherit everything


@pytest.mark.nightly  # replication smoke; default tier keeps hand-computed cosine pins
def test_source_cosines_exactly_replication_invariant(spark):
    """Sum vectors scale ×REPS and cosine is scale-invariant — the
    matrix must be bit-identical."""
    from bread_spark.extensions.source_sim import (
        similarity_matrix_df,
        source_sums_df,
    )

    emb = spark.createDataFrame(
        [("s1", [1.0, 0.2]), ("s2", [0.3, 0.9]), ("s3", [-0.5, 0.4])],
        "source string, embedding array<float>",
    )
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select("source", "embedding")
    base = sorted(
        map(tuple, similarity_matrix_df(source_sums_df(emb)).collect())
    )
    got = sorted(
        map(tuple, similarity_matrix_df(source_sums_df(big)).collect())
    )
    assert got == base


@pytest.mark.nightly  # replication smoke; default tier keeps the hand-computed OLS/Pearson/Benford pins + oracles
def test_stats_family_replication_invariants(spark, big_events):
    """One pass over the ×REPS events corpus pins all three events-side
    stats entries at once. Same ts/type/value per replica, disjoint
    users, so: Benford counts scale exactly ×REPS (shares unchanged);
    the trend's exact slope numerator scales ×REPS against an unchanged
    denominator (daily sums ×REPS, day grid unchanged) with r²
    invariant; pairwise correlation's exact covariance numerator scales
    ×REPS² with r invariant; rolling distinct users scale exactly
    ×REPS."""
    from bread_spark.extensions.stats import (
        benford_counts_df,
        benford_report_df,
        correlation_from_daily,
        rolling_distinct_df,
        trend_from_daily,
    )
    from bread_spark.extensions.timeseries import _daily_micro

    base_ev = load_table(spark, SF_DIR, "events")

    # Benford: counts ×REPS, exact ppm shares identical
    base_b = {
        (r["event_type"], r["digit"]): r
        for r in benford_report_df(benford_counts_df(base_ev)).collect()
    }
    big_b = {
        (r["event_type"], r["digit"]): r
        for r in benford_report_df(benford_counts_df(big_events)).collect()
    }
    assert set(big_b) == set(base_b)
    for k, r in base_b.items():
        assert big_b[k]["cnt"] == r["cnt"] * REPS
        assert big_b[k]["obs_ppm"] == r["obs_ppm"]
        assert big_b[k]["excess_ppm"] == r["excess_ppm"]

    # Trend: slope_num ×REPS, slope_den unchanged, r² bit-identical
    base_daily = _daily_micro(base_ev)
    big_daily = _daily_micro(big_events)
    base_t = {r["event_type"]: r for r in trend_from_daily(base_daily).collect()}
    big_t = {r["event_type"]: r for r in trend_from_daily(big_daily).collect()}
    assert set(big_t) == set(base_t)
    for k, r in base_t.items():
        assert big_t[k]["n_days"] == r["n_days"]
        assert int(big_t[k]["slope_num"]) == int(r["slope_num"]) * REPS
        assert big_t[k]["slope_den"] == r["slope_den"]
        assert big_t[k]["r2"] == r["r2"]

    # Correlation: cov_num ×REPS², r bit-identical
    base_c = {
        (r["type_a"], r["type_b"]): r
        for r in correlation_from_daily(base_daily).collect()
    }
    big_c = {
        (r["type_a"], r["type_b"]): r
        for r in correlation_from_daily(big_daily).collect()
    }
    assert set(big_c) == set(base_c)
    for k, r in base_c.items():
        assert int(big_c[k]["cov_num"]) == int(r["cov_num"]) * REPS * REPS
        assert big_c[k]["r"] == r["r"]

    # Rolling distinct: disjoint replica users → exactly ×REPS per day
    base_roll = {r["day"]: r for r in rolling_distinct_df(base_ev).collect()}
    big_roll = {r["day"]: r for r in rolling_distinct_df(big_events).collect()}
    assert set(big_roll) == set(base_roll)
    for day, r in base_roll.items():
        assert big_roll[day]["users_1d"] == r["users_1d"] * REPS
        assert big_roll[day]["users_7d"] == r["users_7d"] * REPS


@pytest.mark.nightly  # replication smoke; default tier keeps the uniform/dominant Gini pins + oracle
def test_concentration_invariant_under_replication(spark):
    """Per-source char mass ×REPS: the exact Gini numerator scales
    ×REPS while gini/hhi/top-share stay bit-identical."""
    from bread_spark.extensions.stats import concentration_df

    base_docs = load_table(spark, SF_DIR, "documents").select("source", "n_chars")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big_docs = base_docs.crossJoin(reps).select("source", "n_chars")
    base = concentration_df(base_docs).collect()[0]
    big = concentration_df(big_docs).collect()[0]
    assert big["n_sources"] == base["n_sources"]
    assert big["total_chars"] == base["total_chars"] * REPS
    assert int(big["gini_num"]) == int(base["gini_num"]) * REPS
    assert big["gini"] == base["gini"]
    assert big["hhi"] == base["hhi"]
    assert big["top_share_ppm"] == base["top_share_ppm"]


@pytest.mark.nightly  # replication smoke; default tier keeps the hand-computed latency/cadence pins + oracles
def test_behavior_family_replication_invariants(spark, big_events):
    """Disjoint replica users: conversion counts scale ×REPS while the
    exact ratio fields are bit-identical (numerator and denominator
    scale together, so the truncating quotient is unchanged); gap
    counts scale ×REPS with identical exact means. Interpolated
    percentiles are NOT replication-invariant in general (order-stat
    interpolation shifts at the tails) and are pinned by the oracle
    instead."""
    from bread_spark.extensions.behavior import (
        conversion_firsts_df,
        conversion_report_df,
        gap_stats_df,
    )

    base_ev = load_table(spark, SF_DIR, "events")
    base_r = conversion_report_df(conversion_firsts_df(base_ev)).collect()[0]
    big_r = conversion_report_df(conversion_firsts_df(big_events)).collect()[0]
    assert big_r["n_signup_users"] == base_r["n_signup_users"] * REPS
    assert big_r["n_purchase_users"] == base_r["n_purchase_users"] * REPS
    assert big_r["n_converted"] == base_r["n_converted"] * REPS
    assert big_r["conversion_ppm"] == base_r["conversion_ppm"]
    assert big_r["mean_delay_s"] == base_r["mean_delay_s"]

    base_g = {r["event_type"]: r for r in gap_stats_df(base_ev).collect()}
    big_g = {r["event_type"]: r for r in gap_stats_df(big_events).collect()}
    assert set(big_g) == set(base_g)
    for k, r in base_g.items():
        assert big_g[k]["n_gaps"] == r["n_gaps"] * REPS
        assert big_g[k]["mean_gap_s"] == r["mean_gap_s"]


@pytest.mark.nightly  # replication smoke; default tier keeps the rank-lattice pins + oracle
def test_quality_rank_replication_keeps_score_distribution(spark, big_docs_r6):
    """Replicated docs (same texts, disjoint ids) keep each source's
    exact score multiset: per-(source, stop_ppm) counts scale ×REPS,
    and the rank range still spans [0, 1e6]."""
    from bread_spark.functions.text import quality_rank_df

    base_docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    base = {}
    for r in quality_rank_df(base_docs).collect():
        base[(r["source"], r["stop_ppm"])] = (
            base.get((r["source"], r["stop_ppm"]), 0) + 1
        )
    big = {}
    big_rows = quality_rank_df(
        big_docs_r6.select("doc_id", "source", "text")
    ).collect()
    for r in big_rows:
        big[(r["source"], r["stop_ppm"])] = (
            big.get((r["source"], r["stop_ppm"]), 0) + 1
        )
    assert set(big) == set(base)
    for k, n in base.items():
        assert big[k] == n * REPS
    assert all(0 <= r["rank_ppm"] <= 1_000_000 for r in big_rows)


def test_acf_invariant_under_replication(spark, big_events):
    """Replicating every event scales each day's micro-sum by exactly
    REPS, and lag-Pearson is scale-invariant: acf and n_pairs are
    identical to the base corpus, while the exact integer covariance
    numerator scales by exactly REPS^2 (pure-integer identity — any
    deviation means the moments depend on something besides the daily
    rollup)."""
    from bread_spark.extensions.timeseries import _daily_micro, acf_from_daily

    base = {
        (r.event_type, r.lag): r
        for r in acf_from_daily(
            _daily_micro(load_table(spark, SF_DIR, "events"))
        ).collect()
    }
    big = {
        (r.event_type, r.lag): r
        for r in acf_from_daily(_daily_micro(big_events)).collect()
    }
    assert set(big) == set(base)
    for k, b in base.items():
        g = big[k]
        assert g.n_pairs == b.n_pairs, k
        assert g.acf == b.acf, k
        assert int(g.cov_num) == int(b.cov_num) * REPS * REPS, k


def test_doc_dup_saturation_scales(spark, big_docs_r6):
    """Replicating every doc REPS× makes EVERY shingle's df ≥ REPS ≥ 2,
    so each replica doc saturates fully (n_dup == n_shingles, dup_frac
    1.0) and the profile's row count scales exactly linearly — while
    staying keyed-join-shaped (no pair stage to blow up)."""
    from bread_spark.extensions.dedup import _word_shingles

    base = load_table(spark, SF_DIR, "documents")
    n_base = _word_shingles(base).select("doc_id").distinct().count()

    sh = _word_shingles(big_docs_r6)
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prof = (
        sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    assert prof.count() == n_base * REPS
    assert prof.filter(F.col("n_dup") != F.col("n_shingles")).count() == 0


def test_kmeans_exact_assignments_replication_invariant(spark):
    """The exact-lattice quantizer (r13) at ×REPS corpus: replicating
    every vector with disjoint vec_ids must leave the trainer's output
    EXACTLY invariant — init still selects the original first-k ids,
    per-cluster means are unchanged (trunc((R·s)/(R·n)) ≡ trunc(s/n)
    on the integer lattice), so every replica lands in its original's
    cluster and the original ids' assignments are bit-identical. This
    is the 100 TB claim in miniature: corpus growth moves work, not
    geometry."""
    from pyspark.sql import functions as F

    from bread_spark.extensions.similarity import _kmeans_exact_df
    from bread_spark.io import load_table
    from tests.conftest import SF_DIR
    from tests.scale_fixtures import REPS

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = {r["vec_id"]: r["cluster"] for r in _kmeans_exact_df(emb).collect()}

    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "embedding",
    )
    big_assign = {
        r["vec_id"]: r["cluster"] for r in _kmeans_exact_df(big.localCheckpoint()).collect()
    }
    assert len(big_assign) == REPS * len(base)
    for vid, cl in big_assign.items():
        assert cl == base[vid % 10_000_000], vid
