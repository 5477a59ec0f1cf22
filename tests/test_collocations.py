"""PMI collocations: hand-computed exact-integer scores (including the
two-step floor contract), tie-break ordering, per-source ranking, and
seam consistency on real data."""

from __future__ import annotations

from bread_spark.extensions.collocations import (
    MIN_PAIR,
    TOP_K,
    pmi_collocations,
    pmi_collocations_df,
    top_collocations_by_source_df,
)
from bread_spark.extensions.curation import BIGRAM_PAIRS_EXPR

DOCS_SCHEMA = "doc_id long, source string, text string"


def _counts(spark, rows):
    """Inline (uni, big) count tables from (doc_id, source, text) rows —
    the same tokenization the LM seams apply."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    toks_arr = F.filter(F.split("text", " "), lambda t: t != "")
    w = docs.select(toks_arr.alias("toks")).filter(F.size("toks") >= 1)
    uni = (
        w.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    big = (
        w.select(
            F.explode(
                F.expr(
                    BIGRAM_PAIRS_EXPR
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    return uni, big


def test_exact_score_hand_computed(spark):
    """c(a,b)=3, c(a)=c(b)=3, N=11 → ((3e6 div 3)·11) div 3 = 3666666 —
    the two-step floor, not round(1e6·N·c12/(c1·c2)) = 3666667."""
    rows = [
        (1, "s", "a b a b c"),
        (2, "s", "a b x"),
        (3, "s", "c c c"),
    ]
    got = pmi_collocations_df(*_counts(spark, rows)).collect()
    assert len(got) == 1  # only (a,b) reaches MIN_PAIR
    r = got[0]
    assert (r["w1"], r["w2"], r["n_pair"], r["n_w1"], r["n_w2"]) == (
        "a", "b", 3, 3, 3,
    )
    assert r["pmi_lift_micro"] == 3666666


def test_tied_scores_break_lexicographically(spark):
    """Identical counts → identical scores; (score, w1, w2) DESC must
    place (r,s) before (p,q)."""
    rows = [(i, "s", "p q") for i in range(3)] + [
        (i + 10, "s", "r s") for i in range(3)
    ]
    got = pmi_collocations_df(*_counts(spark, rows)).collect()
    assert [(r["w1"], r["w2"]) for r in got] == [("r", "s"), ("p", "q")]
    assert got[0]["pmi_lift_micro"] == got[1]["pmi_lift_micro"] == 4_000_000


def test_per_source_rank_is_local(spark):
    """Each source ranks its own pairs; the dominant pair of each source
    lands at rk 1 and ranks never exceed the cap."""
    rows = [
        (1, "s1", "m n m n"),
        (2, "s1", "m n"),
        (3, "s2", "u v u v"),
        (4, "s2", "u v"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA).select("source", "text")
    got = {
        (r["source"], r["rk"]): (r["w1"], r["w2"])
        for r in top_collocations_by_source_df(docs).collect()
    }
    assert got[("s1", 1)] == ("m", "n")
    assert got[("s2", 1)] == ("u", "v")
    assert all(rk <= 5 for _, rk in got)


def test_real_corpus_scores_ordered_and_thresholded(spark, sf_dir):
    rows = pmi_collocations(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP_K
    assert all(r["n_pair"] >= MIN_PAIR for r in rows)
    keys = [(r["pmi_lift_micro"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys, reverse=True)
