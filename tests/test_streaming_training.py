"""End-to-end incremental composition of `training_corpus`.

The r8 `curated_corpus_v2` member-gate composition proved the incremental
path one gate at a time; this is the same proof one level up, for the
flagship curation chain: exact-dedup canonical selection runs as a REAL
windowed streaming aggregate (min-struct — the batch min-doc_id canonical
rule, engine- and arrival-order-stable), then the decontamination / quota
/ quality / shuffle-key gates run as a stateless streaming map stage, each
stage a real availableNow query whose parquet sink feeds the next stage's
source. The surviving rows — and the PACKED output over them — must equal
batch `training_corpus` + `pack_sequences_df` on the same input snapshot.

Corpus-global pieces follow the documented incremental division of labor:
the adaptive quality threshold is FROZEN from the snapshot (the
frozen-base pattern every *_against_base twin uses), and packing re-runs
on the composed survivor snapshot (pack_sequences' own batch-only note).

Analytic facts are hard-coded so a both-sides drift cannot slip by:
doc 21 is an exact copy of 20 (canonical 20 survives, 21 dies in the
STREAMING aggregate); doc 22 recycles probe content (shingle overlap
≥ 0.5, decontamination kills it); doc 24 is digit soup (alpha ratio
below the frozen 25th-percentile threshold, quality kills it); doc 25
has two words (no shingles — out of decontamination scope by the
documented semantics, survives); doc 26 is the quota control (md5
bucket 'fc' ≥ the en cutoff '40', the stratified sampler kills it).
Every other engineered doc's md5 bucket is pinned BELOW its language
cutoff so each verdict isolates exactly one gate.
"""

from __future__ import annotations

import datetime
import json
import os

import pyspark.sql.functions as F
import pytest

from bread_spark.extensions.training import (
    CONTAM_THRESHOLD,
    DEFAULT_CUTOFF,
    LANG_CUTOFFS,
    PROBE_MAX_DOC_ID,
    _shuffle_key,
    pack_sequences_df,
    training_corpus,
)
from bread_spark.functions.text import QF_ALPHA_PCT

T = datetime.datetime(2024, 6, 1, 12, 0)


def _fixture_rows():
    """(doc_id, text, lang, source) — probe docs < 20, corpus >= 20.

    The engineered docs' " v<k>" / numeric suffixes pin their md5 QUOTA
    buckets ('40' keeps en, 'c0' keeps de) so each hard-coded verdict
    isolates exactly ONE gate; doc 26 is the quota-dropped control
    (bucket 'fc' >= '40')."""
    probe = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean_a = (
        "the quick brown fox jumps over the lazy dog every single day v1"
    )  # bucket 07
    clean_b = (
        "ein schneller brauner fuchs springt gern ueber den faulen hund v0"
    )  # bucket a1 < c0 (de)
    contaminated = probe + " trailing words v4"  # bucket 18
    digit_soup = "111 222 333 444 555 666 777 888 999 000 123 1"  # bucket 35
    tiny = "twoword wordaak"  # 2 words, zero shingles; bucket 2c
    quota_ctrl = (
        "plain ordinary sentence that should be quota dropped v0"
    )  # bucket fc
    filler = [
        f"document number {i} carries plainly ordinary english prose "
        f"with familiar words repeated sparingly across line {i}"
        for i in range(5)
    ]
    rows = [
        (0, probe, "en", "bench"),
        (20, clean_a, "en", "web"),
        (21, clean_a, "en", "mirror"),  # exact dup -> canonical is 20
        (22, contaminated, "en", "web"),  # probe overlap -> killed
        (23, clean_b, "de", "web"),
        (24, digit_soup, "en", "logs"),  # low alpha ratio -> killed
        (25, tiny, "en", "web"),  # < 3 words: no shingles, in scope
        (26, quota_ctrl, "en", "web"),  # md5 bucket >= cutoff -> killed
        # three more digit soups so the FOUR smallest alpha ratios are
        # all engineered low-quality docs: with 17 docs percentile(0.25)
        # sits exactly on the 5th-smallest value — the lowest PROSE
        # alpha, which passes via >= — so every digit doc is strictly
        # below the threshold and every prose verdict is
        # threshold-placement-proof
        (27, "999 888 777 666 555 444 333 222 111 000 5", "en", "logs"),
        (28, "999 888 777 666 555 444 333 222 111 000 6", "en", "logs"),
        (29, "999 888 777 666 555 444 333 222 111 000 14", "en", "logs"),
    ]
    rows += [(30 + i, t, "en", "web") for i, t in enumerate(filler)]
    return rows


def _stateless_gates(df, probe_shingles: list[int], alpha_th: float):
    """The decontamination / quota / quality / shuffle-key conjunction as
    one stateless projection+filter — mirrors the training_corpus member
    expressions term for term, so it applies unchanged to a static frame
    (the default-tier agreement pin) and a streaming one (the chain)."""
    w = F.split("text", " ")
    toks = F.filter(w, lambda t: t != "")
    # _word_shingles mirror: xxhash64 3-grams over the RAW split
    sh = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 3), "
                "i -> xxhash64(split(text, ' ')[i], split(text, ' ')[i+1], "
                "split(text, ' ')[i+2]))"
            )
        ),
    ).otherwise(F.expr("array()"))
    probe_arr = F.array(*[F.lit(int(x)) for x in probe_shingles])
    n_sh = F.size(sh)
    n_ov = F.size(F.array_intersect(sh, probe_arr))
    contaminated = (n_sh >= 1) & (
        F.round(n_ov / n_sh, 4) >= F.lit(CONTAM_THRESHOLD)
    )
    bucket = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    cutoff = F.lit(DEFAULT_CUTOFF)
    for lang, cut in LANG_CUTOFFS.items():
        cutoff = F.when(F.col("lang") == lang, F.lit(cut)).otherwise(cutoff)
    alpha_ratio = F.round(
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")) / F.length("text"), 4
    )
    return (
        df.filter(F.col("doc_id") >= PROBE_MAX_DOC_ID)
        .filter(~contaminated)
        .filter(bucket < cutoff)
        .filter(alpha_ratio >= F.lit(alpha_th))
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(toks).cast("long").alias("n_tokens"),
            _shuffle_key().alias("shuffle_key"),
        )
    )


def _frozen_inputs(spark, docs):
    """(probe shingle longs, frozen alpha threshold) off the snapshot —
    the corpus-global values the incremental chain consumes as statics."""
    probe_sh = [
        r["shingle"]
        for r in docs.filter(F.col("doc_id") < PROBE_MAX_DOC_ID)
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> xxhash64(w[i], w[i+1], w[i+2]))"
                )
            ).alias("shingle")
        )
        .distinct()
        .collect()
    ]
    alpha_ratio = F.round(
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")) / F.length("text"), 4
    )
    alpha_th = (
        docs.select(alpha_ratio.alias("a"))
        .agg(F.expr(f"percentile(a, {QF_ALPHA_PCT})").alias("th"))
        .collect()[0]["th"]
    )
    return probe_sh, alpha_th


def _write_snapshot(spark, tmp_path):
    rows = _fixture_rows()
    docs = spark.createDataFrame(
        [(d, t, lg, s, len(t)) for d, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf_fixture")
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs, sf_dir


@pytest.mark.nightly
def test_training_corpus_incremental_composition(spark, tmp_path):
    docs, sf_dir = _write_snapshot(spark, tmp_path)
    probe_sh, alpha_th = _frozen_inputs(spark, docs)

    # ---- stage 1: exact-dedup canonical selection as a REAL windowed
    # streaming aggregate (min-struct = batch min-doc_id canonical)
    src = str(tmp_path / "s1_src")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for i, (d, t, lg, s) in enumerate(_fixture_rows()):
            f.write(
                json.dumps(
                    {
                        "doc_id": d,
                        "ts": (T + datetime.timedelta(minutes=i)).isoformat(),
                        "text": t,
                        "lang": lg,
                        "source": s,
                    }
                )
                + "\n"
            )

    def stage1(st):
        return (
            st.withColumn("digest", F.md5(F.col("text").cast("binary")))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("win"), "digest")
            .agg(F.min(F.struct("doc_id", "lang", "source", "text")).alias("c"))
            .select(
                F.col("c.doc_id").alias("doc_id"),
                F.col("c.lang").alias("lang"),
                F.col("c.source").alias("source"),
                F.col("c.text").alias("text"),
            )
        )

    schema = "doc_id long, ts timestamp, text string, lang string, source string"
    sink1 = str(tmp_path / "s1_sink")
    ckpt1 = str(tmp_path / "s1_ckpt")

    def run1():
        q = (
            stage1(spark.readStream.schema(schema).json(src))
            .writeStream.format("parquet")
            .option("path", sink1)
            .option("checkpointLocation", ckpt1)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run1()
    # late sentinel far past the horizon finalizes the real window
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "doc_id": 900,
                    "ts": (T + datetime.timedelta(days=3)).isoformat(),
                    "text": "sentinel",
                    "lang": "en",
                    "source": "x",
                }
            )
            + "\n"
        )
    run1()

    # ---- stage 2: the stateless gate conjunction as a second REAL
    # streaming query reading stage 1's sink
    sink2 = str(tmp_path / "s2_sink")
    ckpt2 = str(tmp_path / "s2_ckpt")
    s1_schema = "doc_id long, lang string, source string, text string"
    q2 = (
        _stateless_gates(
            spark.readStream.schema(s1_schema)
            .parquet(sink1)
            .filter("doc_id < 900"),
            probe_sh,
            alpha_th,
        )
        .writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", ckpt2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    streamed = spark.read.parquet(sink2)
    batch = training_corpus(spark, sf_dir)

    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows and s_rows  # identical, non-empty

    # hard-coded analytic verdicts (see module docstring)
    ids = {r[0] for r in s_rows}
    assert 20 in ids and 21 not in ids  # canonical survives, copy dies
    assert 22 not in ids  # contamination gate
    assert 23 in ids  # de doc under the wider de quota
    assert 24 not in ids  # frozen quality threshold
    assert 25 in ids  # shingle-free doc is out of decontam scope
    assert 26 not in ids  # quota control (bucket fc >= 40)
    assert not {27, 28, 29} & ids  # the digit-soup quality cohort

    # ---- packed output over the composed survivors == batch packing
    s_packed = {
        tuple(r)
        for r in pack_sequences_df(streamed.select("doc_id", "n_tokens")).collect()
    }
    b_packed = {
        tuple(r)
        for r in pack_sequences_df(batch.select("doc_id", "n_tokens")).collect()
    }
    assert s_packed == b_packed and s_packed


def test_training_corpus_gate_chain_agreement_batch(spark, tmp_path):
    """Default-tier agreement pin for the nightly composition: the same
    canonical rule + gate conjunction evaluated as PLAIN DataFrames must
    equal batch training_corpus on the fixture snapshot."""
    docs, sf_dir = _write_snapshot(spark, tmp_path)
    probe_sh, alpha_th = _frozen_inputs(spark, docs)
    canon = (
        docs.withColumn("digest", F.md5(F.col("text").cast("binary")))
        .groupBy("digest")
        .agg(F.min(F.struct("doc_id", "lang", "source", "text")).alias("c"))
        .select(
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.lang").alias("lang"),
            F.col("c.source").alias("source"),
            F.col("c.text").alias("text"),
        )
    )
    composed = {
        tuple(r) for r in _stateless_gates(canon, probe_sh, alpha_th).collect()
    }
    batch = {tuple(r) for r in training_corpus(spark, sf_dir).collect()}
    assert composed == batch and composed
