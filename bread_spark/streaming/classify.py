"""Streaming twin of the hashed Naive Bayes classifier — score each
incoming document against the FROZEN model as it lands (CCNet's online
shape: the fastText language gate runs on the crawl stream, not on a
nightly rebuild).

The model and priors enter as static frames; Spark re-resolves the
static side of a stream-static join per micro-batch, and both are
bounded at ``classes × NB_BUCKETS`` rows BY CONSTRUCTION (the hashing
trick), so the join side stays broadcastable forever — this family
never needs the keyed-shuffle degrade the n-gram LM scorers carry.

Shape: two CHAINED windowed aggregations (supported as multiple
stateful operators since Spark 3.5) —

1. per (event-time window, doc, class): exact integer micro-log sum of
   the token likelihood contributions (state: one bigint per group);
2. per (window, doc): argmax over the ≤ n_classes per-class totals via
   ``reverse(array_sort(collect_list(struct(score_u, lang))))`` — state
   bounded at n_classes structs per doc, and the lexicographic
   (score DESC, lang DESC) order is EXACTLY the batch/oracle tie-break
   (`extensions/classify.py` chose lang-DESC for this reason), so batch
   and stream can never disagree, even on analytic ties.

Deliberate divergence from the batch scorer, forced by streaming: a
document with ZERO tokens emits no row (it never reaches the first
aggregation) — the batch entry scores such docs on the prior alone.
Same convention as the boilerplate gate twin's all-boilerplate docs.

Agreement with `nb_lang_scores` on tokenful docs is pinned in
tests/test_streaming_classify.py, including a checkpoint restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extensions.classify import _micro, _token_rows


def nb_score_stream_against_base(
    stream: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    window: str = "10 minutes",
    lateness: str = "1 hour",
) -> DataFrame:
    """One row per (event-time window, doc) in append mode once the
    watermark passes: (window, doc_id, pred_lang, logp, margin) — the
    same integer-exact scores the batch entry computes."""
    wm = stream.withWatermark(ts_col, lateness)
    hashed = _token_rows(wm, id_col, ts_col, text_col=payload_col)
    contrib = hashed.join(
        F.broadcast(
            model.select("bucket", "lang", _micro(F.col("log_lik")).alias("lik_u"))
        ),
        "bucket",
    )
    per_class = (
        contrib.groupBy(F.window(ts_col, window).alias("window"), id_col, "lang")
        .agg(F.sum("lik_u").alias("su"))
        .join(
            F.broadcast(priors.select("lang", _micro(F.col("log_prior")).alias("prior_u"))),
            "lang",
        )
        .select(
            "window",
            id_col,
            "lang",
            (F.col("prior_u") + F.col("su")).alias("score_u"),
        )
    )
    ranked = (
        per_class.groupBy(
            F.window(F.window_time("window"), window).alias("window"), id_col
        )
        .agg(
            F.reverse(
                F.array_sort(F.collect_list(F.struct("score_u", "lang")))
            ).alias("arr")
        )
    )
    return ranked.select(
        "window",
        id_col,
        F.col("arr")[0]["lang"].alias("pred_lang"),
        F.round(F.col("arr")[0]["score_u"] / 1e6, 6).alias("logp"),
        F.when(
            F.size("arr") > 1,
            F.round(
                (F.col("arr")[0]["score_u"] - F.col("arr")[1]["score_u"]) / 1e6, 6
            ),
        ).alias("margin"),
    )


def nb_model_count_stream(
    docs: DataFrame,
    payload_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """ONLINE TRAINING: maintain the NB model's count table over a
    labeled document stream — the model-side twin of the scorer above
    (the CMS/HLL convention: the sketch maintains itself on the stream;
    here the "sketch" is the classifier's sufficient statistic, because
    multinomial NB's entire state IS a count table).

    One grouped streaming aggregation keyed (label, bucket) — state
    bounded at classes × NB_BUCKETS longs no matter how long the stream
    runs (the hashing trick again). Update output mode emits changed
    rows; feed a snapshot through `nb_counts_to_model` to get the dense
    scoring model (the SAME formula the batch build and the shard merge
    use — `extensions/classify.py::nb_counts_to_model`), so after any
    stream prefix the derived model equals training from scratch on that
    prefix: pinned in tests, including a checkpoint restart.

    The stream carries whatever the caller considers training data — the
    content-keyed split rule belongs to the batch corpus build; a crawl
    gate would apply it upstream of this aggregation."""
    labeled = docs.select(F.col(label_col).alias("lang"), F.col(payload_col))
    hashed = _token_rows(labeled, "lang", text_col=payload_col)
    return hashed.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
