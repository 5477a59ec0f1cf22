"""Scale smoke: heavy operators on 10-20x replicated data — catches
anything accidentally quadratic (correctness of counts, not timing;
wall-clock assertions would be flaky)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark.io import load_table
from tests.conftest import SF_DIR

REPS = 10


@pytest.fixture(scope="module")
def big_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
    )
    return big.localCheckpoint()


def test_sessionize_scales(spark, big_events):
    from bread_spark.streaming.sessions import session_stats

    base = load_table(spark, SF_DIR, "events")
    small = session_stats(base).count()
    big = session_stats(big_events).count()
    # replicas have disjoint user spaces → sessions scale exactly linearly
    assert big == small * REPS


def test_asof_scales(spark, big_events):
    from bread_spark.operators.asof import asof_join

    purchases = (
        big_events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    out = asof_join(big_events.select("event_id", "user_id", "ts"), purchases, on="ts", by="user_id")
    # as-of join never multiplies rows
    assert out.count() == big_events.count()


def test_connected_components_scales(spark):
    """Components over disjoint replica graphs: labels stay within each
    replica's id space and counts scale exactly linearly."""
    from bread_spark.extensions.dedup import connected_components

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    # chain pairs inside each replica: (i, i+1) for even i → 50-node pairs
    base_pairs = spark.range(50).select(
        (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
    )
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id")
    )
    big_pairs = base_pairs.crossJoin(reps).select(
        (F.col("doc_a") + F.col("rep") * 1_000_000).alias("doc_a"),
        (F.col("doc_b") + F.col("rep") * 1_000_000).alias("doc_b"),
    )
    out = connected_components(big_docs, big_pairs)
    assert out.count() == 100 * REPS
    # 50 two-doc clusters per replica → canonical count = 50 per replica
    canon = out.filter("is_canonical").count()
    assert canon == 50 * REPS
    # no label crosses a replica boundary
    crossed = out.filter(
        (F.col("doc_id") / 1_000_000).cast("long")
        != (F.col("cluster_id") / 1_000_000).cast("long")
    )
    assert crossed.count() == 0


def test_lsh_bucket_pairs_scales(spark):
    """Replicated embeddings: identical vectors share buckets, so the
    capped kernel must keep pair counts bounded by the cap — and pair
    output for the original corpus stays a subset of what replication
    produces (no pairs lost by adding data)."""
    from bread_spark.extensions.similarity import lsh_bucket_pairs_df

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    reps = spark.range(3).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding"
    ).localCheckpoint()
    pairs = lsh_bucket_pairs_df(big, threshold=0.99, max_bucket=5_000)
    # replicas of the same vector are exact dups (cosine 1.0): each of the
    # 3 copies pairs with the other 2 → ≥ 3 × n_vectors pairs exist; the
    # run completing without quadratic blow-up is the smoke signal, the
    # count bound is the invariant
    n = emb.count()
    assert pairs.filter(F.col("cosine") >= 0.99).count() >= 3 * n // 2


def test_minhash_scales(spark):
    from bread_spark.extensions.dedup import _word_shingles, minhash_signatures

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    ).localCheckpoint()
    sigs = minhash_signatures(_word_shingles(big_docs))
    # one signature per doc regardless of duplication factor
    assert sigs.count() == big_docs.count()
    # replicated docs carry identical signatures
    n_distinct = sigs.select("signature").distinct().count()
    base_distinct = (
        minhash_signatures(_word_shingles(docs)).select("signature").distinct().count()
    )
    assert n_distinct == base_distinct


def test_paragraph_dedup_scales(spark):
    """Disjoint-text replicas → exactly linear output; identical-text
    replicas → output INVARIANT (every later replica's chunks are dups of
    rep 0's). Catches anything quadratic in the digest join and any
    cross-replica ordinal leakage."""
    from bread_spark.extensions.curation import paragraph_dedup_df

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    small = paragraph_dedup_df(docs).count()
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    rep_docs = docs.crossJoin(reps)
    big_same = rep_docs.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
    )
    assert paragraph_dedup_df(big_same).count() == small
    big_disjoint = rep_docs.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), "
            "t -> concat(t, '_', cast(rep AS string))), ' ')"
        ).alias("text"),
    )
    assert paragraph_dedup_df(big_disjoint).count() == small * REPS


def test_bigram_lm_scales(spark):
    """Disjoint token spaces per replica → exactly linear scored-doc
    count; catches the LM join degenerating into anything super-linear."""
    from bread_spark.extensions.curation import bigram_logprob_scores_df

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    small = bigram_logprob_scores_df(docs).count()
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), "
            "t -> concat(t, '_', cast(rep AS string))), ' ')"
        ).alias("text"),
    )
    assert bigram_logprob_scores_df(big).count() == small * REPS


@pytest.fixture(scope="module")
def big_docs_r6(spark):
    """documents replicated with disjoint doc_id spaces (same texts →
    term statistics scale by exactly REPS)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source", "lang"
    )
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
        "source",
        "lang",
    )
    return big.localCheckpoint()


def test_bm25_scales(spark, big_docs_r6):
    """Replicating every doc REPS× multiplies tf and df by REPS and
    scales N and total length together, so avgdl and the tf-normalization
    are unchanged while idf shifts identically for every term — the
    top-n remains fully populated and every score stays positive and
    finite. Catches a quadratic blow-up in the postings join (the count
    and score sanity would explode or hang)."""
    from bread_spark.extensions.search import BM25_QUERY, BM25_TOP_N, bm25_search_df

    rows = bm25_search_df(big_docs_r6, list(BM25_QUERY), top_n=BM25_TOP_N).collect()
    assert len(rows) == BM25_TOP_N
    assert all(r["score"] > 0 for r in rows)


def test_tfidf_scales_exactly(spark, big_docs_r6):
    """Same replication: tf(t,d) is unchanged per replica doc and
    N/df both scale by REPS, so idf — and therefore every tfidf score
    and each doc's keyword ranking — is IDENTICAL to the base corpus."""
    from bread_spark.extensions.search import tfidf_keywords_df
    from bread_spark.io import load_table as lt

    base = lt(spark, SF_DIR, "documents").select("doc_id", "text")
    base_rows = {
        (r["doc_id"], r["token"]): r["tfidf"]
        for r in tfidf_keywords_df(base).collect()
    }
    rep0 = {
        (r["doc_id"], r["token"]): r["tfidf"]
        for r in tfidf_keywords_df(big_docs_r6.select("doc_id", "text"))
        .filter(F.col("doc_id") < 10_000_000)
        .collect()
    }
    assert rep0 == base_rows


def test_source_kl_invariant_under_replication(spark, big_docs_r6):
    """Replicating every doc scales n_st, n_s, n_t, N together — every
    ratio, and so every KL value, is identical to the base corpus."""
    from bread_spark.extensions.curation import source_kl_divergence_df
    from bread_spark.io import load_table as lt

    base = {
        r["source"]: r["kl_divergence"]
        for r in source_kl_divergence_df(
            lt(spark, SF_DIR, "documents").select("source", "text")
        ).collect()
    }
    big = {
        r["source"]: r["kl_divergence"]
        for r in source_kl_divergence_df(
            big_docs_r6.select("source", "text")
        ).collect()
    }
    assert big == base


def test_span_windows_scale_exactly_linearly(spark, big_docs_r6):
    """The window frame is a map-side transform: REPS× docs (disjoint ids,
    same texts) must yield exactly REPS× window rows — any deviation means
    the explode fan-out depends on something besides the document."""
    from bread_spark.extensions.dedup import _span_windows
    from bread_spark.io import load_table as lt

    base_n = _span_windows(lt(spark, SF_DIR, "documents")).count()
    big_n = _span_windows(big_docs_r6).count()
    assert big_n == base_n * REPS


def test_duplicate_spans_under_replication(spark, big_docs_r6):
    """With every doc replicated REPS≥2 times, EVERY span is duplicated
    (each replica twin shares all windows): the duplicated-span set equals
    the full distinct-span set of the base corpus, and per-span doc
    frequency scales by exactly REPS."""
    from bread_spark.extensions.dedup import _span_windows

    base_wins = _span_windows(
        load_table(spark, SF_DIR, "documents")
    )
    base_distinct = base_wins.select("span").distinct().count()
    base_docfreq = {
        r["span"]: r["nd"]
        for r in base_wins.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .collect()
    }
    big = (
        _span_windows(big_docs_r6)
        .groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .collect()
    )
    assert len(big) == base_distinct
    for r in big:
        assert r["n_docs"] == base_docfreq[r["span"]] * REPS


def test_span_report_drops_all_replicated_docs(spark, big_docs_r6):
    """On the replicated corpus every windowed doc has dup_frac exactly
    1.0 (its replica twin shares every window) → keep is False for all of
    them; zero-window (short) docs stay kept."""
    from bread_spark.extensions.dedup import span_dedup_report_df

    rows = span_dedup_report_df(big_docs_r6).collect()
    assert len(rows) == big_docs_r6.count()
    for r in rows:
        if r["n_windows"] > 0:
            assert r["dup_frac"] == 1.0 and r["keep"] is False
        else:
            assert r["keep"] is True


def test_funnel_scales(spark, big_events):
    """Replicas have disjoint user spaces → per-user funnel stages (and
    hence every day-grain stage count) scale exactly linearly; any
    accidental cross-user interaction or self-join blowup breaks the
    exact multiple."""
    from bread_spark.models import funnel_stages

    base = load_table(spark, SF_DIR, "events").select("user_id", "event_type", "ts")
    small = funnel_stages(base).filter("t_view IS NOT NULL").count()
    big = (
        funnel_stages(big_events.select("user_id", "event_type", "ts"))
        .filter("t_view IS NOT NULL")
        .count()
    )
    assert big == small * REPS


def test_retention_cohorts_scale_exactly(spark, big_events):
    """Disjoint replicated users → every (cohort_day, day_offset) cell's
    active count is exactly REPS× the base corpus's."""
    from pyspark.sql import Window

    ud = big_events.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    big_cells = {
        (r["cohort_day"], r["day_offset"]): r["n_active"]
        for r in ud.withColumn("cohort_day", F.min("day").over(w))
        .select("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .collect()
    }
    from bread_spark.models import retention_cohorts

    small_cells = {
        (r["cohort_day"], r["day_offset"]): r["n_active"]
        for r in retention_cohorts(spark, SF_DIR).collect()
    }
    assert set(big_cells) == set(small_cells)
    assert all(big_cells[k] == v * REPS for k, v in small_cells.items())


@pytest.mark.nightly  # replication smoke; default tier keeps the reference-pinned BPE tests (r9 tier split)
def test_bpe_merges_invariant_under_corpus_replication(spark, tmp_path):
    """Doubling the corpus doubles every pair count but must not change
    the learned merge SEQUENCE — the trainer's decisions depend on
    relative frequencies only (the property that makes the word-table
    reduction scale-safe)."""
    from bread_spark.extensions.training import bpe_merges

    texts = ["low lower lowest", "new newer newest", "wide wider widest"]
    for reps, sub in ((1, "a"), (2, "b")):
        rows = []
        for rep in range(reps):
            for i, t in enumerate(texts):
                rows.append((rep * 100 + i, t, "en", "web", len(t)))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(str(tmp_path / sub / "documents.parquet"))

    one = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(spark, str(tmp_path / "a"), n_merges=6).collect()
    ]
    two = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(spark, str(tmp_path / "b"), n_merges=6).collect()
    ]
    assert [(m[0], m[1], m[2]) for m in one] == [(m[0], m[1], m[2]) for m in two]
    assert all(t[3] == 2 * o[3] for o, t in zip(one, two))


@pytest.mark.nightly  # replication smoke; default tier keeps the ngram5 oracle + seam-equality pins (r9 tier split)
def test_ngram5_invariant_under_replication(spark, big_docs_r6):
    """Replicating every doc REPS× scales every n-gram count AND the
    total token mass by REPS, so each count ratio — and therefore every
    interpolated probability and per-doc mean — is IDENTICAL to the
    base corpus. Also the quadratic-blowup canary for the two new
    count-table joins (quad/quint)."""
    from bread_spark.extensions.curation import ngram5_logprob_scores_df
    from bread_spark.io import load_table as lt

    base = {
        r["doc_id"]: (r["n_tokens"], r["mean_logp"])
        for r in ngram5_logprob_scores_df(
            lt(spark, SF_DIR, "documents").select("doc_id", "text")
        ).collect()
    }
    rep0 = {
        r["doc_id"] : (r["n_tokens"], r["mean_logp"])
        for r in ngram5_logprob_scores_df(big_docs_r6.select("doc_id", "text"))
        .filter(F.col("doc_id") < 10_000_000)
        .collect()
    }
    assert rep0 == base


def test_cdc_chunking_scales_linearly(spark, big_docs_r6):
    """CDC boundaries are per-document functions — REPS× docs with
    disjoint ids must yield exactly REPS× chunk rows, and a replica
    doc's chunk sequence must equal the base doc's (boundaries do not
    depend on anything outside the document)."""
    from bread_spark.extensions.curation import _cdc_chunk_frame
    from bread_spark.io import load_table as lt

    base = {
        r["doc_id"]: r["chunks"]
        for r in _cdc_chunk_frame(
            lt(spark, SF_DIR, "documents").select("doc_id", "text")
        ).collect()
    }
    big = _cdc_chunk_frame(big_docs_r6.select("doc_id", "text"))
    assert big.count() == len(base) * REPS
    rep1 = {
        r["doc_id"] - 10_000_000: r["chunks"]
        for r in big.filter(
            (F.col("doc_id") >= 10_000_000) & (F.col("doc_id") < 20_000_000)
        ).collect()
    }
    assert rep1 == base


def test_cms_counters_scale_exactly_linearly(spark, big_docs_r6):
    """Replicating every document REPS× multiplies EVERY count-min
    counter by exactly REPS (same tokens → same buckets; counts are
    pure sums) — the sketch stays the same constant-size table while its
    mass scales, which is the whole point."""
    from bread_spark.extensions.sketch import cms_sketch_df

    base = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch_df(
            load_table(spark, SF_DIR, "documents").select("text")
        ).collect()
    }
    big = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch_df(big_docs_r6.select("text")).collect()
    }
    assert big == {k: v * REPS for k, v in base.items()}


def test_hll_registers_invariant_under_replication(spark, big_docs_r6):
    """Replication adds NO new distinct tokens, so the register table —
    and therefore the distinct-count estimate — must be bit-identical on
    the 10× corpus (duplicates are absorbed by MAX; the estimate depends
    on registers alone)."""
    from bread_spark.extensions.sketch import hll_registers_df

    base = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers_df(
            load_table(spark, SF_DIR, "documents").select("source", "text")
        ).collect()
    }
    big = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers_df(big_docs_r6.select("source", "text")).collect()
    }
    assert big == base


def test_boilerplate_table_docfreq_scales_linearly(spark, big_docs_r6):
    """On the replicated corpus every chunk's document frequency is
    exactly REPS× its base frequency — the frequency aggregate stays a
    per-chunk count, never a pairwise structure."""
    from bread_spark.extensions.curation import (
        CHUNK_TOKENS,
        _boilerplate_table,
        _fixed_chunk_stream,
    )

    base = {
        r["chunk"]: (r["n_docs"], r["n_occurrences"])
        for r in _boilerplate_table(
            _fixed_chunk_stream(
                load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
                CHUNK_TOKENS,
            ),
            min_docs=1,
        ).collect()
    }
    big = {
        r["chunk"]: (r["n_docs"], r["n_occurrences"])
        for r in _boilerplate_table(
            _fixed_chunk_stream(
                big_docs_r6.select("doc_id", "text"), CHUNK_TOKENS
            ),
            min_docs=1,
        ).collect()
    }
    assert big == {k: (nd * REPS, no * REPS) for k, (nd, no) in base.items()}


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
