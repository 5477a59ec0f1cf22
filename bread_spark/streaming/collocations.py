"""Streaming twin of the collocation miner — the count tables (the
miner's entire sufficient statistic) maintained online.

The ranked PMI report joins two aggregates of the same stream, which
structured streaming forbids in one query — and doesn't need: like the
NB classifier (`nb_model_count_stream`), the collocation family's
sufficient statistic is a count table, and count tables maintain
themselves as ONE grouped streaming aggregation (SUM merge, complete
mode). `collocation_bigram_stream` emits the running (w1, w2, n12)
bigram table and `collocation_unigram_stream` the (token, n) table; a
snapshot of the two fed through the BATCH scorer
(`pmi_collocations_df`) IS the batch report over everything seen —
one scoring implementation, not two pinned equal (the
`semantic_decontaminate` kernel-sharing discipline). Pinned including
a checkpoint fold in tests/test_streaming_collocations.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..extensions.curation import BIGRAM_PAIRS_EXPR


def collocation_unigram_stream(stream: DataFrame) -> DataFrame:
    """Running (token, n) over a (doc_id, text) document stream."""
    toks_arr = F.filter(F.split("text", " "), lambda t: t != "")
    return (
        stream.select(F.explode(toks_arr).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def collocation_bigram_stream(stream: DataFrame) -> DataFrame:
    """Running (w1, w2, n12) adjacent-pair counts over the same stream."""
    toks_arr = F.filter(F.split("text", " "), lambda t: t != "")
    return (
        stream.select(toks_arr.alias("toks"))
        .filter(F.size("toks") >= 1)
        .select(
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
