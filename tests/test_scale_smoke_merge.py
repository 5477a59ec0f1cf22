"""Scale smoke, part 2: sketch-merge algebra — the 100 TB
incremental-maintenance story at replication (VERDICT r7 #6:
shard-split-merge equality, not just counter linearity). Split from
test_scale_smoke.py in r13 (VERDICT r12 #3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.io import load_table
from tests.conftest import SF_DIR
from tests.scale_fixtures import REPS, big_docs_r6, big_events  # noqa: F401

# ---------------------------------------------------------------------------
# Sketch merges — the 100 TB incremental-maintenance story at replication
# (VERDICT r7 #6: shard-split-merge equality, not just counter linearity)
# ---------------------------------------------------------------------------

N_SHARDS = 4


def test_hll_shard_merge_equals_from_scratch(spark, big_docs_r6):
    """Build HLL registers on 4 DISJOINT shards of the replicated corpus,
    fold them with merge_hll_registers, and compare to the from-scratch
    build on the full corpus: bit-identical registers, in both a
    sequential fold and a balanced tree — union-is-max-of-registers must
    hold regardless of merge order, because at 100 TB shards arrive in
    whatever order the crawls finish."""
    from bread_spark.extensions.sketch import hll_registers_df, merge_hll_registers

    shards = [
        hll_registers_df(
            big_docs_r6.filter(F.pmod(F.col("doc_id"), N_SHARDS) == i).select(
                "source", "text"
            )
        )
        for i in range(N_SHARDS)
    ]
    scratch = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers_df(big_docs_r6.select("source", "text")).collect()
    }

    seq = shards[0]
    for s in shards[1:]:
        seq = merge_hll_registers(seq, s)
    seq_regs = {
        (r["source"], r["bucket"]): r["max_rho"] for r in seq.collect()
    }
    assert seq_regs == scratch

    tree = merge_hll_registers(
        merge_hll_registers(shards[0], shards[2]),
        merge_hll_registers(shards[3], shards[1]),
    )
    tree_regs = {
        (r["source"], r["bucket"]): r["max_rho"] for r in tree.collect()
    }
    assert tree_regs == scratch


def test_cms_shard_merge_equals_from_scratch(spark, big_docs_r6):
    """Count-min is sum-mergeable: per-shard sketches folded with
    merge_cms_sketches must equal the from-scratch sketch of the full
    corpus counter for counter (sketch(A ∪ B) = sketch(A) + sketch(B)
    exactly, since every counter is a pure sum), in any merge order."""
    from bread_spark.extensions.sketch import cms_sketch_df, merge_cms_sketches

    shards = [
        cms_sketch_df(
            big_docs_r6.filter(F.pmod(F.col("doc_id"), N_SHARDS) == i).select("text")
        )
        for i in range(N_SHARDS)
    ]
    scratch = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch_df(big_docs_r6.select("text")).collect()
    }

    seq = shards[0]
    for s in shards[1:]:
        seq = merge_cms_sketches(seq, s)
    assert {(r["d"], r["bucket"]): r["cnt"] for r in seq.collect()} == scratch

    tree = merge_cms_sketches(
        merge_cms_sketches(shards[0], shards[3]),
        merge_cms_sketches(shards[1], shards[2]),
    )
    assert {(r["d"], r["bucket"]): r["cnt"] for r in tree.collect()} == scratch


def test_hdr_shard_merge_equals_from_scratch(spark, big_events):
    """The log-histogram is sum-mergeable like CMS: per-shard sketches
    folded with merge_hdr_sketches equal the from-scratch sketch of the
    full replicated event set, bucket for bucket, in any merge order."""
    from bread_spark.extensions.sketch import hdr_sketch_df, merge_hdr_sketches

    shards = [
        hdr_sketch_df(
            big_events.filter(F.pmod(F.col("event_id"), N_SHARDS) == i).select("value")
        )
        for i in range(N_SHARDS)
    ]
    scratch = {
        r["bucket"]: (r["cnt"], r["lb"], r["ub"])
        for r in hdr_sketch_df(big_events.select("value")).collect()
    }
    seq = shards[0]
    for s in shards[1:]:
        seq = merge_hdr_sketches(seq, s)
    assert {
        r["bucket"]: (r["cnt"], r["lb"], r["ub"]) for r in seq.collect()
    } == scratch
    tree = merge_hdr_sketches(
        merge_hdr_sketches(shards[2], shards[0]),
        merge_hdr_sketches(shards[1], shards[3]),
    )
    assert {
        r["bucket"]: (r["cnt"], r["lb"], r["ub"]) for r in tree.collect()
    } == scratch


def test_kmv_shard_merge_equals_from_scratch(spark, big_docs_r6):
    """KMV is union-mergeable: the bottom-k of a union is contained in
    the union of the shards' bottom-k sets, so per-shard sketches folded
    with merge_kmv_sketches equal the from-scratch sketch of the full
    replicated corpus, value for value and rank for rank, in any merge
    order. Replication is also a free invariance check: replicas add no
    new shingles, so the from-scratch sketch equals the sf-corpus one."""
    from bread_spark.extensions.sketch import kmv_sketch_df, merge_kmv_sketches

    shards = [
        kmv_sketch_df(
            big_docs_r6.filter(F.pmod(F.col("doc_id"), N_SHARDS) == i).select(
                "source", "text"
            )
        )
        for i in range(N_SHARDS)
    ]
    scratch = {
        (r["source"], r["rk"]): r["h"]
        for r in kmv_sketch_df(big_docs_r6.select("source", "text")).collect()
    }

    seq = shards[0]
    for s in shards[1:]:
        seq = merge_kmv_sketches(seq, s)
    assert {(r["source"], r["rk"]): r["h"] for r in seq.collect()} == scratch

    tree = merge_kmv_sketches(
        merge_kmv_sketches(shards[1], shards[3]),
        merge_kmv_sketches(shards[0], shards[2]),
    )
    assert {(r["source"], r["rk"]): r["h"] for r in tree.collect()} == scratch


def test_nb_model_bounded_and_shard_merge_equals_retrain(spark, big_docs_r6):
    """The hashing-trick guarantee at scale: the NB model stays EXACTLY
    classes × NB_BUCKETS rows under ×REPS corpus replication (the
    vocabulary-keyed LM tables grow; this table cannot), per-bucket
    counts scale by exactly REPS, and per-shard models folded with
    merge_nb_models equal the from-scratch model of the full replicated
    corpus — counts are additive, so the merge is exact in any order."""
    from bread_spark.extensions.classify import (
        NB_BUCKETS,
        merge_nb_models,
        nb_model_df,
    )
    from bread_spark.functions.text import _split_assignment

    small = nb_model_df(
        _split_assignment(load_table(spark, SF_DIR, "documents").select("lang", "text"))
    )
    big_tagged = _split_assignment(big_docs_r6.select("doc_id", "lang", "text"))
    big = nb_model_df(big_tagged).localCheckpoint()

    n_langs = small.select("lang").distinct().count()
    assert small.count() == n_langs * NB_BUCKETS
    assert big.count() == n_langs * NB_BUCKETS  # constant-size at ×REPS
    scaled = (
        small.select("lang", "bucket", (F.col("cnt") * REPS).alias("cnt"))
        .join(big.select("lang", "bucket", "cnt"), ["lang", "bucket", "cnt"])
        .count()
    )
    assert scaled == n_langs * NB_BUCKETS  # counts scale exactly linearly

    shards = [
        nb_model_df(big_tagged.filter(F.pmod(F.col("doc_id"), N_SHARDS) == i))
        for i in range(N_SHARDS)
    ]
    scratch = {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"]) for r in big.collect()
    }
    seq = shards[0]
    for s in shards[1:]:
        seq = merge_nb_models(seq, s)
    assert {
        (r["lang"], r["bucket"]): (r["cnt"], r["log_lik"]) for r in seq.collect()
    } == scratch


def test_silhouette_invariant_under_replication(spark):
    """Replicating every vector REPS× leaves each point's silhouette
    EXACTLY unchanged — centroids are means, and the integer deviation
    q·(R·n) − R·S = R·(q·n − S) cancels in the normalized distance, so
    the invariance is exact arithmetic, not approximate. The report's
    means stay identical while n_vecs scales by exactly REPS."""
    from bread_spark.extensions.similarity import silhouette_scores_df

    emb = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    small = {
        r["vec_id"]: (r["silhouette"], r["nearest_label"], r["intra_dist"])
        for r in silhouette_scores_df(emb).collect()
    }
    big_rows = silhouette_scores_df(big).collect()
    assert len(big_rows) == REPS * len(small)
    for r in big_rows:
        orig = small[r["vec_id"] % 10_000_000]
        assert (r["silhouette"], r["nearest_label"], r["intra_dist"]) == orig


def test_mg_summary_scales_exactly_linearly(spark, big_docs_r6):
    """Replicating the corpus REPS× with a shard-preserving id offset
    (10M % MG_SHARDS == 0) multiplies every per-shard count, threshold
    and surviving weight by exactly REPS — and the (count DESC, token
    ASC) order is scale-invariant — so the summary is the SAME token
    set with est_count and max_underestimate exactly ×REPS. The pin is
    exact row equality, not a bound: at 100 TB the summary stays ≤ k
    rows while its ledger grows linearly with the mass it absorbed."""
    from bread_spark.extensions.sketch import MG_SHARDS, mg_summary_df

    assert 10_000_000 % MG_SHARDS == 0
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    small = {
        r["token"]: (r["est_count"], r["max_underestimate"])
        for r in mg_summary_df(docs).collect()
    }
    big = {
        r["token"]: (r["est_count"], r["max_underestimate"])
        for r in mg_summary_df(big_docs_r6.select("doc_id", "text")).collect()
    }
    assert big == {t: (c * REPS, b * REPS) for t, (c, b) in small.items()}


@pytest.mark.nightly  # replication smoke; default tier keeps the fuzzy recall-1.0 pins (r9 tier split)
def test_fuzzy_blocking_never_loses_exact_dups_at_scale(spark, big_docs_r6):
    """x10 replication makes every doc an exact (dist-0) duplicate of
    its 9 replicas. Replicas share ALL grams, so their selected prefix
    sets are identical and each replica clique must be fully recovered:
    exactly n_docs * C(REPS, 2) dist-0 pairs, none lost to the blocking
    caps (a replica-private gram is selected by only REPS docs — far
    under FUZZY_SEL_CAP). Non-zero distances stay bounded by the
    verify threshold; candidate volume stays linear by construction."""
    from bread_spark.extensions.fuzzy import FUZZY_MAX_DIST, fuzzy_pairs_df

    # the guarantee is PER-CLIQUE (each doc's replicas select identical
    # gram sets), so 200 cliques prove exactly what 500 did at a third
    # of the Levenshtein-verify cost — this test was the suite's
    # slowest at the full universe (31 s)
    n_docs = 200
    big = big_docs_r6.filter(
        F.pmod(F.col("doc_id"), 10_000_000) < n_docs
    ).select("doc_id", "text")
    pairs = fuzzy_pairs_df(big).collect()
    zero = [
        r
        for r in pairs
        if r["dist"] == 0
        and r["doc_a"] % 10_000_000 == r["doc_b"] % 10_000_000
    ]
    assert len(zero) == n_docs * REPS * (REPS - 1) // 2
    assert all(0 <= r["dist"] <= FUZZY_MAX_DIST for r in pairs)


def test_authority_rank_invariant_on_disjoint_replica_graphs(spark):
    """PageRank on REPS disjoint copies of the same graph must assign
    each replica the EXACT ranks of the single copy (integer arithmetic:
    no cross-replica mass can leak), and the plan is the same fixed
    depth — the rank core scales by partitioning nodes/edges, not by
    changing the recurrence."""
    from bread_spark.extensions.graph import authority_rank_df

    edges = [(1, 0, 3), (2, 0, 1), (3, 2, 5), (4, 3, 2)]
    nodes = spark.range(6).select(F.col("id").alias("doc_id"))
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    small = {
        r["doc_id"]: r["rank_micro"]
        for r in authority_rank_df(nodes, edf).collect()
    }
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big_nodes = nodes.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id")
    )
    big_edges = edf.crossJoin(reps).select(
        (F.col("src") + F.col("rep") * 1_000_000).alias("src"),
        (F.col("dst") + F.col("rep") * 1_000_000).alias("dst"),
        "w",
    )
    big = authority_rank_df(big_nodes, big_edges).collect()
    assert len(big) == 6 * REPS
    for r in big:
        assert r["rank_micro"] == small[r["doc_id"] % 1_000_000]


def test_cusum_alarms_invariant_under_event_replication(spark, big_events):
    """Replicating every event REPS× within the same days multiplies
    every daily sum by exactly REPS; the derived stats scale by REPS up
    to floor-division residue (mu = (R·Σx) div n differs from R·(Σx
    div n) by at most R−1 — floors do not commute with scaling), so
    the statistics are pinned within the accumulated residue bound and
    the ALARM verdicts — whose h margin dwarfs that residue — must be
    identical."""
    from bread_spark.extensions.timeseries import _daily_micro, cusum_df

    small = {
        (r["event_type"], r["day"]): (r["x"], r["s_pos"], r["s_neg"], r["alarm"])
        for r in cusum_df(
            _daily_micro(load_table(spark, SF_DIR, "events"))
        ).collect()
    }
    # big_events replicates users/ids but keeps ts and type — same days
    big = {
        (r["event_type"], r["day"]): (r["x"], r["s_pos"], r["s_neg"], r["alarm"])
        for r in cusum_df(_daily_micro(big_events)).collect()
    }
    assert set(big) == set(small)
    slack = 4 * REPS * 31  # per-day floor residue x days, generous
    for key, (x, sp, sn, al) in small.items():
        bx, bsp, bsn, bal = big[key]
        assert bx == x * REPS  # daily sums scale exactly
        assert abs(bsp - sp * REPS) <= slack
        assert abs(bsn - sn * REPS) <= slack
        assert bal == al


def test_transition_probs_invariant_under_user_replication(spark, big_events):
    """Disjoint-user replication multiplies every transition count by
    exactly REPS while the integer probabilities stay bit-identical:
    (R·n·1e6) div (R·tot) = (n·1e6) div tot — the R cancels in the
    exact rational before the floor."""
    from bread_spark.extensions import paths as P

    ev = load_table(spark, SF_DIR, "events")
    small = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_micro"])
        for r in _matrix(spark, P, ev).collect()
    }
    big = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_micro"])
        for r in _matrix(spark, P, big_events).collect()
    }
    assert set(big) == set(small)
    for key, (n, p) in small.items():
        assert big[key] == (n * REPS, p)


def _matrix(spark, P, ev):
    t = P.transitions_df(ev)
    totals = t.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return t.join(F.broadcast(totals), "from_type").select(
        "from_type", "to_type", "n",
        F.expr(f"(n * {P.PROB_SCALE}) div tot").alias("prob_micro"),
    )


def test_covariance_scales_exactly_quadratically(spark):
    """Replicating every vector REPS×: n and the linear sums scale by
    R, so cov_num = n·sxy − sx·sy scales by exactly R² — an integer
    identity, pinned bit-for-bit."""
    from bread_spark.extensions.spectral import covariance_sums_df

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "embedding",
    )
    small = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["cov_num"])
        for r in covariance_sums_df(emb).collect()
    }
    for r in covariance_sums_df(big).collect():
        n, sxy, cov = small[(r["i"], r["j"])]
        assert r["n"] == n * REPS
        assert r["sxy"] == sxy * REPS
        assert r["cov_num"] == cov * REPS * REPS
