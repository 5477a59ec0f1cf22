"""Hashed Naive Bayes classifier family (extensions/classify.py).

The oracle differential (test_oracle.py) pins the three catalog entries
against DuckDB on the synthetic corpus — where `lang` is independent of
`text`, so accuracy equals the majority share by construction. The tests
here pin what the oracle cannot: that the classifier actually LEARNS
when the data carries signal, that the model is bounded and mergeable,
and that the tie-break is the deterministic (score DESC, lang DESC)
order shared with the oracle and the streaming twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bread_spark.extensions.classify import (
    NB_BUCKETS,
    merge_nb_models,
    nb_lang_model,
    nb_lang_report,
    nb_lang_scores,
    nb_model_df,
    nb_priors_df,
    nb_scores_df,
)
from bread_spark.functions.text import _split_assignment
from tests.conftest import SF_DIR


def _corpus(spark, rows):
    return _split_assignment(
        spark.createDataFrame(rows, "doc_id long, lang string, text string")
    )


def _signal_corpus(spark, n_per_class=120):
    """Two classes with DISJOINT vocabularies and varying doc lengths —
    any learner better than a coin should separate them perfectly. Docs
    are all distinct strings, so the content-keyed split scatters them
    across train/val/test."""
    rows = []
    for i in range(n_per_class):
        # length varies per doc → every text is DISTINCT, so the
        # content-keyed split scatters both classes across train/eval
        rows.append((i, "aa", " ".join(["alpha", "beta", "gamma"] * (3 + i))))
        rows.append((n_per_class + i, "bb", " ".join(["delta", "epsilon"] * (4 + i))))
    return _corpus(spark, rows)


def test_model_is_dense_and_bounded(spark):
    model = nb_lang_model(spark, SF_DIR)
    n_langs = model.select("lang").distinct().count()
    assert model.count() == n_langs * NB_BUCKETS
    # per-class count mass equals the train-split token count
    tagged = _split_assignment(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("lang", "text")
    ).filter(F.col("split") == "train")
    want = {
        r["lang"]: r["n"]
        for r in tagged.select(
            "lang", F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("k")
        )
        .groupBy("lang")
        .agg(F.sum("k").alias("n"))
        .collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in model.groupBy("lang").agg(F.sum("cnt").alias("n")).collect()
    }
    assert got == want


def test_learns_constructed_signal_perfectly(spark):
    tagged = _signal_corpus(spark)
    model = nb_model_df(tagged).localCheckpoint()
    scores = nb_scores_df(tagged, model, nb_priors_df(tagged, model))
    rows = scores.collect()
    assert len(rows) > 10  # the split put a real sample in val+test
    assert all(r["is_correct"] == 1 for r in rows)
    # disjoint vocabularies → decisive margins, not coin flips
    assert min(r["margin"] for r in rows) > 1.0


def test_scores_against_real_corpus_hit_majority_floor(spark):
    """On the signal-free synthetic corpus the Bayes-optimal rule is the
    majority class — the classifier must reach that floor exactly, and
    the report's accuracy cells must agree with the scores frame."""
    scores = nb_lang_scores(spark, SF_DIR).localCheckpoint()
    majority = (
        scores.groupBy("true_lang").count().orderBy(F.desc("count")).first()["count"]
    )
    correct = scores.agg(F.sum("is_correct")).first()[0]
    assert correct >= majority  # ≥: sampling noise can only help
    report = {r["lang"]: r for r in nb_lang_report(spark, SF_DIR).collect()}
    by_true = {
        r["true_lang"]: (r["n"], r["c"])
        for r in scores.groupBy("true_lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_correct").alias("c"))
        .collect()
    }
    for lang, (n, c) in by_true.items():
        assert (report[lang]["n_docs"], report[lang]["n_correct"]) == (n, c)


def test_tie_break_is_score_desc_lang_desc(spark):
    """Two classes trained on IDENTICAL token streams with equal priors
    produce analytically tied scores; the winner must be the larger
    class name — the max(struct(score, lang)) order the streaming twin
    gets for free."""
    text = "alpha beta gamma delta"
    rows = []
    for i in range(40):
        doc = f"{text} v{i}"
        rows.append((2 * i, "aa", doc))
        rows.append((2 * i + 1, "bb", doc))
    tagged = _corpus(spark, rows)
    model = nb_model_df(tagged).localCheckpoint()
    scores = nb_scores_df(tagged, model, nb_priors_df(tagged, model)).collect()
    assert scores  # the split left held-out docs
    for r in scores:
        assert r["pred_lang"] == "bb"
        assert r["margin"] == 0.0


def test_merge_nb_models_equals_retrain(spark):
    """Counts are additive: training per shard and merging must equal
    training once on the union — the incremental-maintenance contract."""
    tagged = _signal_corpus(spark).localCheckpoint()
    full = nb_model_df(tagged)
    a = nb_model_df(tagged.filter(F.col("doc_id") % 2 == 0))
    b = nb_model_df(tagged.filter(F.col("doc_id") % 2 == 1))
    merged = merge_nb_models(a, b)
    assert merged.count() == full.count()
    diff = merged.join(full, ["lang", "bucket", "cnt", "log_lik"], "full")
    assert diff.count() == full.count()  # every row matches exactly


def test_merged_model_scores_like_retrained(spark):
    """The merged model must DRIVE SCORING identically, not just match
    row-for-row — the end-to-end merge guarantee."""
    tagged = _signal_corpus(spark, n_per_class=60).localCheckpoint()
    full = nb_model_df(tagged).localCheckpoint()
    merged = merge_nb_models(
        nb_model_df(tagged.filter(F.col("doc_id") % 2 == 0)),
        nb_model_df(tagged.filter(F.col("doc_id") % 2 == 1)),
    ).localCheckpoint()
    pri = nb_priors_df(tagged, full)
    want = sorted(map(tuple, nb_scores_df(tagged, full, pri).collect()))
    got = sorted(map(tuple, nb_scores_df(tagged, merged, pri).collect()))
    assert got == want


def test_empty_token_docs_score_on_prior_alone(spark):
    """A held-out doc with no tokens must still get a prediction — the
    largest-prior class (lang DESC on prior ties), not a dropped row."""
    rows = [(i, "aa" if i % 3 else "bb", f"tok{i} tok{i + 1} common") for i in range(90)]
    # empty-ish docs: whitespace-only payloads hash to no tokens
    rows += [(1000 + i, "aa", " " * (i + 1)) for i in range(40)]
    tagged = _corpus(spark, rows)
    model = nb_model_df(tagged).localCheckpoint()
    scores = nb_scores_df(tagged, model, nb_priors_df(tagged, model))
    empties = scores.filter(F.col("doc_id") >= 1000).collect()
    if not empties:
        pytest.skip("split assigned every empty doc to train")
    majority_prior = (
        tagged.filter(F.col("split") == "train")
        .groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.desc("lang"))
        .first()["lang"]
    )
    for r in empties:
        assert r["pred_lang"] == majority_prior
