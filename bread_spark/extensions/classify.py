"""Learned quality/language classification — the trained counterpart of
the rule-based gates.

The reference pipeline has no learned classifier (its curation surface
is rule-based SQL models, `/root/reference/dbt/models`); this module is
part of the additive LLM-training-data layer: the CCNet / fastText-shaped
step where a LINEAR MODEL trained on labeled text scores every incoming
document (CCNet trains a fastText language classifier; RefinedWeb and
FineWeb gate on learned quality classifiers). The engine-side shape is
identical for language-ID and quality classification — train per-class
feature counts, broadcast the model, score each doc with a dot product —
so the `lang` column of the synthetic documents table stands in as the
class label.

Multinomial Naive Bayes over HASHED token features (the hashing trick,
Weinberger et al. 2009 — fastText's input layer does the same bucketing):

- every token maps to ``md5(token) % NB_BUCKETS``, so the model is a
  DENSE (class × bucket) table of at most ``n_classes · NB_BUCKETS``
  rows BY CONSTRUCTION — at 100 TB the vocabulary grows unboundedly but
  the model does not, which is what keeps the scoring join a broadcast
  at any corpus size (the n-gram LM tables in `curation.py` are keyed on
  raw vocabulary and need their ``broadcast_lm=False`` degrade switch;
  this family never does).
- add-α smoothing with integer α keeps every likelihood a ratio of
  integers, so the model TABLE itself is oracle-checked: both engines
  compute ``round(log10((cnt+α)/(tot+α·B)), 6)`` on identical integers.
- training data is the CONTENT-KEYED train split — `_split_assignment`
  from `functions.text`, the same single-source-of-truth expression
  `dataset_splits` projects — so byte-identical duplicates can never
  leak a held-out document's text into the model (the auditor discipline
  `split_leakage_report` proves corpus-wide).
- counts are additive, so the model is MERGEABLE: `merge_nb_models` sums
  two shards' count tables and recomputes the likelihoods — exactly the
  model a from-scratch build on the union produces (shard-split-merge
  pinned in test_scale_smoke.py), the same incremental-maintenance
  contract as the CMS/HLL/HDR/KMV sketches: each crawl trains on its own
  data, the fleet-wide model is a sum of count tables.

Tie-break convention: the predicted class is the lexicographic MAX of
``(score, class)`` — score DESC then class DESC. Chosen over the more
common class-ASC so the streaming twin (`streaming/classify.py`), which
cannot rank with window functions, gets the identical argmax from a
plain ``max(struct(score, lang))`` aggregate; batch, oracle SQL, and
stream all share it, so ties (possible only when two classes' scores are
analytically equal) can never disagree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import SPLIT_TRAIN_CUTOFF, SPLIT_VAL_CUTOFF, _split_assignment
from ..io import load_table
from ..plans.materialize import materialized_frame

NB_BUCKETS = 512  # hashed feature space: model ≤ classes × 512 rows, always
NB_ALPHA = 1  # integer add-α keeps every likelihood a ratio of integers


def _micro(col):
    """Lift a 6-decimal log value to exact integer micro-logs — scoring
    sums these bigints instead of doubles, so argmax ranking and margins
    carry zero float-summation-order sensitivity across engines."""
    return F.round(col * 1e6, 0).cast("bigint")


def _bucket_expr(col):
    """``md5(token) % NB_BUCKETS`` on a 60-bit positive integer lane —
    the same 15-hex-char md5 prefix idiom as the CMS/KMV lanes (ANSI-safe
    under 2^62, identical arithmetic in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % NB_BUCKETS


def _tagged_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return _split_assignment(docs)


def _token_rows(df: DataFrame, *keep: str, text_col: str = "text") -> DataFrame:
    """(*keep, bucket) — one row per token occurrence, hashed map-side.
    THE tokenizer+featurizer for this family: the batch build, the
    scorer, and both streaming twins all call it, so the model and
    everything scored against it can never tokenize differently."""
    toks = df.select(*keep, F.explode(F.split(text_col, " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return toks.select(*keep, _bucket_expr(F.col("token")).alias("bucket"))


def nb_lang_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model: (lang, bucket, cnt, log_lik) — DENSE over all
    ``NB_BUCKETS`` buckets for every class seen in the train split, so
    the table is exactly ``n_classes × NB_BUCKETS`` rows at ANY corpus
    size and the scoring join needs no missing-feature fallback (the
    smoothed likelihood of an unseen bucket is a real row, not an OOV
    branch).

    Plan: one (lang, bucket)-keyed count aggregate over the train-split
    token stream (map-side partials collapse to ≤ classes·B groups per
    task), a per-class total, then the dense grid built by exploding a
    literal ``sequence(0, B-1)`` per class — no join fan-out, no
    cartesian operator. Compute-once seam shared by the scores, report,
    and streaming entries."""
    return materialized_frame(
        spark, "nb_lang_model", sf_dir, lambda: nb_model_df(_tagged_docs(spark, sf_dir))
    )


def nb_model_df(tagged: DataFrame) -> DataFrame:
    """`nb_lang_model` core over any frame carrying (lang, text, split)."""
    train_toks = _token_rows(tagged.filter(F.col("split") == "train"), "lang")
    counts = train_toks.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return nb_counts_to_model(counts)


def nb_counts_to_model(counts: DataFrame) -> DataFrame:
    """(lang, bucket, cnt) sparse count table → the dense smoothed model.
    Shared by the batch build, the shard merge, and the streaming count
    maintainer's snapshots — one likelihood formula, three producers."""
    totals = counts.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    grid = totals.select(
        "lang",
        "tot",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(NB_BUCKETS - 1).cast("bigint"))
        ).alias("bucket"),
    )
    return (
        grid.join(counts, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.round(
                F.log10(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(NB_ALPHA))
                    / (F.col("tot") + F.lit(NB_ALPHA * NB_BUCKETS))
                ),
                6,
            ).alias("log_lik"),
        )
    )


def merge_nb_models(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold one shard's model into another: counts are additive, so the
    merge sums ``cnt`` per (lang, bucket) and recomputes the likelihoods
    from the merged totals — bit-for-bit the model a from-scratch build
    on the concatenated corpora produces (pinned at ×10 replication in
    sequential and tree orders, test_scale_smoke.py). The dense grid is
    closed under union (a class missing from one side contributes its
    full 512-row block from the other), so no re-gridding is needed."""
    merged = (
        base.select("lang", "bucket", "cnt")
        .unionByName(delta.select("lang", "bucket", "cnt"))
        .groupBy("lang", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return nb_counts_to_model(merged)


def nb_priors_df(tagged: DataFrame, model: DataFrame) -> DataFrame:
    """(lang, log_prior) over the train split, restricted to classes the
    model actually has likelihood rows for (a token-less class cannot be
    scored). O(classes) rows — broadcast everywhere it is consumed."""
    train = tagged.filter(F.col("split") == "train")
    per = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    total = train.agg(F.count(F.lit(1)).alias("n_train"))
    return (
        per.join(model.select("lang").distinct(), "lang")
        .join(F.broadcast(total))
        .select(
            "lang", F.round(F.log10(F.col("n") / F.col("n_train")), 6).alias("log_prior")
        )
    )


def nb_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every HELD-OUT document (val + test splits) under the
    trained model: (doc_id, split, true_lang, pred_lang, is_correct,
    logp, margin). ``logp`` is the winning class's total log-score
    (prior + Σ cnt·log_lik), ``margin`` the gap to the runner-up — the
    confidence threshold a production gate would cut on (CCNet keeps
    docs whose language score clears 0.5; the margin is the NB analog).

    The model and priors enter as BROADCASTS — bounded at classes×512
    rows by the hashing trick, at ANY corpus size (the point of the
    family). Per-doc bucket counts shuffle (doc_id, bucket) pairs —
    integers, never raw text; the per-(doc, class) sum shuffles on
    doc_id. Two integer-keyed shuffles total, both AQE-coalesced.

    Cross-engine determinism: scoring happens in INTEGER MICRO-LOGS —
    the model's 6-decimal likelihoods are lifted to ``round(log_lik·1e6)``
    bigints, summed exactly, and only divided back for display — so the
    per-class totals, the argmax ranking, and the margins are integer
    arithmetic with no float-summation-order sensitivity at all (a plain
    double sum put ~1% of margins exactly on a round-4 tie boundary,
    where summation order flipped the last digit between engines).

    One honest caveat, measured not assumed: the synthetic corpus draws
    `lang` independently of `text` (per-lang token distributions are
    uniform to within sampling noise), so held-out accuracy equals the
    majority-class share — the analytically correct answer. The
    classifier's discrimination is pinned in tests on a constructed
    corpus with real per-class signal (tests/test_classify.py)."""
    return materialized_frame(
        spark,
        "nb_lang_scores",
        sf_dir,
        lambda: _nb_scores_build(spark, sf_dir),
    )


def _nb_scores_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = _tagged_docs(spark, sf_dir)
    model = nb_lang_model(spark, sf_dir)
    return nb_scores_df(tagged, model, nb_priors_df(tagged, model))


def nb_scores_df(tagged: DataFrame, model: DataFrame, priors: DataFrame) -> DataFrame:
    """`nb_lang_scores` core over any tagged (doc_id, lang, text, split)
    frame and a (possibly merged) model — the seam tests drive with
    constructed-signal corpora."""
    eval_docs = tagged.filter(F.col("split") != "train").select(
        "doc_id", "split", F.col("lang").alias("true_lang"), "text"
    )
    doc_toks = _token_rows(eval_docs, "doc_id").groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    lik_u = _micro(F.col("log_lik"))
    tsum = (
        doc_toks.join(
            F.broadcast(model.select("lang", "bucket", lik_u.alias("lik_u"))),
            "bucket",
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("lik_u")).alias("su"))
    )
    prior_u = _micro(F.col("log_prior"))
    scored = (
        eval_docs.drop("text")
        .join(F.broadcast(priors.select("lang", prior_u.alias("prior_u"))))
        .join(tsum, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "split",
            "true_lang",
            "lang",
            (F.col("prior_u") + F.coalesce(F.col("su"), F.lit(0))).alias("score_u"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_u"), F.desc("lang"))
    ranked = scored.withColumns(
        {"rk": F.row_number().over(w), "s2_u": F.lead("score_u").over(w)}
    )
    return ranked.filter(F.col("rk") == 1).select(
        "doc_id",
        "split",
        "true_lang",
        F.col("lang").alias("pred_lang"),
        (F.col("lang") == F.col("true_lang")).cast("int").alias("is_correct"),
        F.round(F.col("score_u") / 1e6, 6).alias("logp"),
        F.round((F.col("score_u") - F.col("s2_u")) / 1e6, 6).alias("margin"),
    )


def nb_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class evaluation rollup on the held-out scores: (lang, n_docs,
    n_correct, accuracy, n_predicted, pred_precision) — accuracy is the
    per-true-class recall, pred_precision the per-predicted-class
    precision. The pred side joins LEFT from the true-class list, so a
    class the model never predicts surfaces with n_predicted = 0 and a
    null precision instead of vanishing (the left-join-zero discipline).
    O(classes) rows from the shared scores seam — the frame a training
    dashboard would watch next to `source_dashboard`."""
    scores = nb_lang_scores(spark, sf_dir)
    by_true = scores.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_correct").alias("n_correct"),
    )
    by_pred = scores.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_predicted"),
        F.sum("is_correct").alias("n_pred_correct"),
    )
    return (
        by_true.join(F.broadcast(by_pred), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_docs"), 4).alias("accuracy"),
            F.coalesce(F.col("n_predicted"), F.lit(0)).alias("n_predicted"),
            F.round(F.col("n_pred_correct") / F.col("n_predicted"), 4).alias(
                "pred_precision"
            ),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — every CTE mirrors the Spark arithmetic on identical
# integers; log10 is applied to the same rationals and rounded to the
# same 6 decimals, so even the float columns compare exactly.
# ---------------------------------------------------------------------------

_NB_MODEL_CTE = f"""
    WITH tagged AS (
        SELECT doc_id, lang, text,
               CASE WHEN substring(md5(text), 1, 4) < '{SPLIT_TRAIN_CUTOFF}' THEN 'train'
                    WHEN substring(md5(text), 1, 4) < '{SPLIT_VAL_CUTOFF}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    train_tok AS (
        SELECT lang,
               CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)
                   % {NB_BUCKETS} AS bucket
        FROM (
            SELECT lang,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM tagged WHERE split = 'train'
        )
    ),
    bcnt AS (
        SELECT lang, bucket, COUNT(1) AS cnt FROM train_tok GROUP BY 1, 2
    ),
    ltot AS (SELECT lang, COUNT(1) AS tot FROM train_tok GROUP BY 1),
    grid AS (
        SELECT t.lang, t.tot, g.bucket
        FROM ltot t CROSS JOIN (
            SELECT unnest(range(0, {NB_BUCKETS})) AS bucket
        ) g
    ),
    model AS (
        SELECT g.lang, g.bucket,
               COALESCE(b.cnt, 0) AS cnt,
               ROUND(log10((COALESCE(b.cnt, 0) + {NB_ALPHA}) * 1.0
                     / (g.tot + {NB_ALPHA * NB_BUCKETS})), 6) AS log_lik
        FROM grid g
        LEFT JOIN bcnt b ON b.lang = g.lang AND b.bucket = g.bucket
    )
"""

_NB_SCORES_CTE = (
    _NB_MODEL_CTE
    + f""",
    priors AS (
        SELECT t.lang,
               ROUND(log10(COUNT(1) * 1.0 / (
                   SELECT COUNT(1) FROM tagged WHERE split = 'train'
               )), 6) AS log_prior
        FROM tagged t JOIN ltot l ON l.lang = t.lang
        WHERE t.split = 'train'
        GROUP BY t.lang
    ),
    eval_docs AS (
        SELECT doc_id, split, lang AS true_lang, text
        FROM tagged WHERE split <> 'train'
    ),
    doc_tok AS (
        SELECT doc_id,
               CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)
                   % {NB_BUCKETS} AS bucket,
               COUNT(1) AS cnt
        FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM eval_docs
        )
        GROUP BY 1, 2
    ),
    tsum AS (
        SELECT d.doc_id, m.lang,
               SUM(d.cnt * CAST(ROUND(m.log_lik * 1000000, 0) AS BIGINT))
                   AS su
        FROM doc_tok d JOIN model m ON m.bucket = d.bucket
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT e.doc_id, e.split, e.true_lang, p.lang,
               CAST(ROUND(p.log_prior * 1000000, 0) AS BIGINT)
                   + COALESCE(t.su, 0) AS score_u
        FROM eval_docs e
        CROSS JOIN priors p
        LEFT JOIN tsum t ON t.doc_id = e.doc_id AND t.lang = p.lang
    ),
    ranked AS (
        SELECT doc_id, split, true_lang, lang, score_u,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score_u DESC, lang DESC) AS rk,
               LEAD(score_u) OVER (
                   PARTITION BY doc_id ORDER BY score_u DESC, lang DESC) AS s2_u
        FROM scored
    ),
    preds AS (
        SELECT doc_id, split, true_lang, lang AS pred_lang,
               CAST(CASE WHEN lang = true_lang THEN 1 ELSE 0 END AS INT)
                   AS is_correct,
               ROUND(score_u / 1000000.0, 6) AS logp,
               ROUND((score_u - s2_u) / 1000000.0, 6) AS margin
        FROM ranked WHERE rk = 1
    )
"""
)

ORACLE_SQL: dict[str, str] = {
    "nb_lang_model": _NB_MODEL_CTE
    + """
    SELECT lang, bucket, cnt, log_lik FROM model
""",
    "nb_lang_scores": _NB_SCORES_CTE
    + """
    SELECT doc_id, split, true_lang, pred_lang, is_correct, logp, margin
    FROM preds
""",
    "nb_lang_report": _NB_SCORES_CTE
    + """,
    by_true AS (
        SELECT true_lang AS lang, COUNT(1) AS n_docs,
               CAST(SUM(is_correct) AS BIGINT) AS n_correct
        FROM preds GROUP BY 1
    ),
    by_pred AS (
        SELECT pred_lang AS lang, COUNT(1) AS n_predicted,
               CAST(SUM(is_correct) AS BIGINT) AS n_pred_correct
        FROM preds GROUP BY 1
    )
    SELECT t.lang, t.n_docs, t.n_correct,
           ROUND(t.n_correct * 1.0 / t.n_docs, 4) AS accuracy,
           COALESCE(p.n_predicted, 0) AS n_predicted,
           ROUND(p.n_pred_correct * 1.0 / p.n_predicted, 4) AS pred_precision
    FROM by_true t LEFT JOIN by_pred p ON p.lang = t.lang
""",
}
