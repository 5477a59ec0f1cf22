"""Quality-gate tuning metrics (extensions/quality_gates.py).

The oracle differential (test_oracle.py) pins the three catalog entries
against DuckDB — including the full label recomputation (dedup
survivorship + contamination) in pure SQL. The tests here pin what the
oracle cannot: the label semantics of `gate_rows_df` under every
survivorship pattern, the parameterized threshold ladder against
hand-computed precision/recall, and that the composed AUC reacts to a
planted keeper/dropped separation the way Mann-Whitney says it must.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bread_spark.extensions.classify import margin_auc_df, pr_curve_df
from bread_spark.extensions.quality_gates import (
    QUALITY_GATE_THRESHOLDS,
    gate_rows_df,
)


def _frames(spark, scored_rows, survivor_ids, contam_ids):
    scored = spark.createDataFrame(scored_rows, "doc_id long, margin_u long")
    survivors = spark.createDataFrame(
        [(i, 1) for i in survivor_ids], "doc_id long, _kept int"
    )
    contam = spark.createDataFrame(
        [(i, 1) for i in contam_ids], "doc_id long, _contam int"
    )
    return scored, survivors, contam


def test_gate_rows_label_semantics(spark):
    # keeper = survivor AND not contaminated; every other combination is 0
    scored, survivors, contam = _frames(
        spark,
        [(1, 100), (2, 200), (3, 300), (4, 400)],
        survivor_ids=[1, 3],
        contam_ids=[3, 4],
    )
    rows = {
        r["doc_id"]: r["is_correct"]
        for r in gate_rows_df(scored, survivors, contam).collect()
    }
    # 1: survivor, clean -> 1 | 2: dropped dup -> 0
    # 3: survivor but contaminated -> 0 | 4: dropped AND contaminated -> 0
    assert rows == {1: 1, 2: 0, 3: 0, 4: 0}


def test_auc_on_planted_separation(spark):
    # all keepers score strictly above all dropped docs -> AUC 1.0;
    # flipping the labels -> 0.0 (the Mann-Whitney symmetry)
    scored, survivors, contam = _frames(
        spark,
        [(i, 1000 + i) for i in range(1, 6)] + [(i, i) for i in range(6, 11)],
        survivor_ids=[1, 2, 3, 4, 5],
        contam_ids=[],
    )
    auc = margin_auc_df(gate_rows_df(scored, survivors, contam)).collect()[0]
    assert auc["auc"] == 1.0 and auc["n_pos"] == 5 and auc["n_neg"] == 5
    flipped = gate_rows_df(scored, survivors, contam).select(
        "doc_id", (1 - F.col("is_correct")).alias("is_correct"), "margin_u"
    )
    assert margin_auc_df(flipped).collect()[0]["auc"] == 0.0


def test_pr_curve_custom_ladder_hand_computed(spark):
    # 4 docs: margins 10, 20, 30, 40; keepers = {30, 40}
    scored, survivors, contam = _frames(
        spark,
        [(1, 10), (2, 20), (3, 30), (4, 40)],
        survivor_ids=[3, 4],
        contam_ids=[],
    )
    rows = gate_rows_df(scored, survivors, contam)
    ladder = ((0.0, 0), (0.25, 25), (0.35, 35), (0.5, 50))
    by_t = {
        r["threshold"]: r
        for r in pr_curve_df(rows, thresholds=ladder).collect()
    }
    assert by_t[0.0]["n_kept"] == 4 and by_t[0.0]["precision"] == 0.5
    assert by_t[0.25]["n_kept"] == 2 and by_t[0.25]["precision"] == 1.0
    assert by_t[0.25]["recall"] == 1.0
    assert by_t[0.35]["n_kept"] == 1 and by_t[0.35]["recall"] == 0.5
    assert by_t[0.5]["n_kept"] == 0 and by_t[0.5]["precision"] is None
    assert by_t[0.5]["recall"] == 0.0


def test_default_ladder_is_the_stop_ppm_lattice():
    # micro units must be exactly display*1e6 — the gate the user reads
    # IS the gate the engine applies (no float drift into the lattice)
    for disp, t_u in QUALITY_GATE_THRESHOLDS:
        assert t_u == round(disp * 1_000_000)
