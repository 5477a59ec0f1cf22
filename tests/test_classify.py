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

# ---------------------------------------------------------------------------
# Margin-metric family (r9): ROC-AUC / PR curve / calibration bins.
# The oracle differential pins the catalog entries; these pin the
# statistics themselves against brute force and constructed edge cases.
# ---------------------------------------------------------------------------


def _metric_rows(spark, triples):
    """(doc_id, is_correct, margin_u) constructed metric input."""
    return spark.createDataFrame(
        triples, "doc_id long, is_correct int, margin_u long"
    )


def _brute_auc(triples):
    """O(n^2) reference: concordant + half-ties over all (pos, neg)
    pairs — the definition the rank statistic must reproduce."""
    pos = [m for _, c, m in triples if c == 1]
    neg = [m for _, c, m in triples if c == 0]
    if not pos or not neg:
        return None
    num = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    return round(num / (2.0 * len(pos) * len(neg)), 6)


def test_auc_matches_brute_force_on_real_scores(spark):
    from bread_spark.extensions.classify import nb_margin_auc

    scores = nb_lang_scores(spark, SF_DIR)
    triples = [
        (r["doc_id"], r["is_correct"], int(round(r["margin"] * 1e6)))
        for r in scores.collect()
    ]
    got = nb_margin_auc(spark, SF_DIR).first()
    assert got["n_pos"] == sum(c for _, c, _ in triples)
    assert got["n_pos"] + got["n_neg"] == len(triples)
    assert got["auc"] == _brute_auc(triples)


def test_auc_constructed_cases(spark):
    from bread_spark.extensions.classify import margin_auc_df

    # perfect separation → 1.0; inverted → 0.0; all tied → 0.5
    sep = [(i, 1, 1_000_000 + i) for i in range(20)] + [
        (100 + i, 0, i) for i in range(20)
    ]
    inv = [(d, 1 - c, m) for d, c, m in sep]
    tied = [(i, i % 2, 7_000_000) for i in range(30)]
    for triples, want in [(sep, 1.0), (inv, 0.0), (tied, 0.5)]:
        row = margin_auc_df(_metric_rows(spark, triples)).first()
        assert row["auc"] == want, (want, row)
        assert row["auc"] == _brute_auc(triples)
    # degenerate single-class input → null auc, not a divide error
    row = margin_auc_df(
        _metric_rows(spark, [(i, 1, i) for i in range(5)])
    ).first()
    assert row["auc"] is None and row["n_neg"] == 0


def test_auc_tie_mix_matches_brute_force(spark):
    """Heavy tie structure across the stripe boundary — midrank math and
    the two-level cumulative must agree with the O(n^2) definition."""
    from bread_spark.extensions.classify import margin_auc_df

    triples = []
    k = 0
    for m in [0, 999_999, 1_000_000, 1_000_001, 2_500_000]:
        for c in (0, 0, 1, 0, 1, 1):
            triples.append((k, c, m))
            k += 1
    row = margin_auc_df(_metric_rows(spark, triples)).first()
    assert row["auc"] == _brute_auc(triples)


def test_pr_curve_invariants(spark):
    from bread_spark.extensions.classify import PR_THRESHOLDS, nb_pr_curve

    scores = nb_lang_scores(spark, SF_DIR)
    n = scores.count()
    nc = scores.agg(F.sum("is_correct")).first()[0]
    rows = {r["threshold"]: r for r in nb_pr_curve(spark, SF_DIR).collect()}
    assert set(rows) == {t for t, _ in PR_THRESHOLDS}
    # threshold 0 keeps everything: precision = accuracy, recall = 1
    assert rows[0.0]["n_kept"] == n
    assert rows[0.0]["recall"] == 1.0
    assert rows[0.0]["precision"] == round(nc / n, 4)
    # kept counts and recall are non-increasing in the threshold
    ordered = [rows[t] for t, _ in PR_THRESHOLDS]
    for a, b in zip(ordered, ordered[1:]):
        assert a["n_kept"] >= b["n_kept"]
        assert a["n_correct_kept"] >= b["n_correct_kept"]


def test_calibration_bins_partition_evenly_and_order(spark):
    from bread_spark.extensions.classify import CAL_BINS, nb_calibration_bins

    scores = nb_lang_scores(spark, SF_DIR)
    n = scores.count()
    nc = scores.agg(F.sum("is_correct")).first()[0]
    bins = sorted(
        nb_calibration_bins(spark, SF_DIR).collect(), key=lambda r: r["bin"]
    )
    assert [r["bin"] for r in bins] == list(range(min(CAL_BINS, n)))
    assert sum(r["n_docs"] for r in bins) == n
    assert sum(r["n_correct"] for r in bins) == nc
    sizes = [r["n_docs"] for r in bins]
    assert max(sizes) - min(sizes) <= 1
    # bins are margin-ordered and non-overlapping (ties may touch)
    for a, b in zip(bins, bins[1:]):
        assert a["hi_margin"] <= b["lo_margin"]
        assert a["lo_margin"] <= a["avg_margin"] <= a["hi_margin"]


def test_calibration_all_tied_margins_split_by_doc_id(spark):
    """Every margin equal → bins are decided purely by the doc_id
    tie-break; the split must still be exhaustive and ±1-even."""
    from bread_spark.extensions.classify import calibration_bins_df

    rows = _metric_rows(spark, [(i, i % 3 == 0 and 1 or 0, 42) for i in range(25)])
    bins = sorted(calibration_bins_df(rows).collect(), key=lambda r: r["bin"])
    assert sum(r["n_docs"] for r in bins) == 25
    assert max(r["n_docs"] for r in bins) - min(r["n_docs"] for r in bins) <= 1
    assert all(r["avg_margin"] == 4.2e-05 for r in bins)


def test_confusion_matrix_and_kappa_consistent_with_scores(spark):
    """The confusion matrix must re-aggregate the scores exactly (cell
    sums = report counts, diagonal = total correct) and kappa must equal
    the hand-computed chance-corrected statistic on the collected
    confusion counts."""
    from collections import Counter

    from bread_spark.extensions.classify import (
        nb_cohens_kappa,
        nb_confusion_matrix,
    )

    scores = nb_lang_scores(spark, SF_DIR).collect()
    want = Counter((r["true_lang"], r["pred_lang"]) for r in scores)
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in nb_confusion_matrix(spark, SF_DIR).collect()
    }
    assert got == dict(want)

    n = len(scores)
    agree = sum(1 for r in scores if r["true_lang"] == r["pred_lang"])
    row = Counter(r["true_lang"] for r in scores)
    col = Counter(r["pred_lang"] for r in scores)
    pe_num = sum(row[k] * col.get(k, 0) for k in row)
    k = nb_cohens_kappa(spark, SF_DIR).first()
    assert (k["n_docs"], k["n_agree"], k["pe_num"]) == (n, agree, pe_num)
    assert k["kappa"] == round((agree * n - pe_num) / (n * n - pe_num), 6)
    # kappa is chance-corrected: strictly below raw accuracy when the
    # guesser's marginals earn any chance agreement
    assert k["kappa"] < agree / n
