"""Streaming twins of the tokenizer-fit diagnostics.

Both reports are commutative folds, so each maintains itself as ONE
grouped streaming aggregation in complete mode: the OOV counter
scores arrivals against a FROZEN vocabulary (the frozen-baseline
pattern of `cusum_stream_against_base` — online fit-drift monitoring
re-freezes the vocab on a schedule, it does not rebuild it per event),
and the length histogram is a pure (source, bucket) count/sum fold.
Batch agreement + checkpoint fold pinned in
tests/test_streaming_vocab_fit.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oov_stream_against_vocab(stream: DataFrame, vocab: DataFrame) -> DataFrame:
    """Running (source, n_tokens, n_oov, oov_micro) over a document
    stream, against a frozen (token, in_vocab) table (bounded at
    VOCAB_SIZE rows by construction → broadcast)."""
    toks = stream.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("token"),
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000) div n_tokens").alias("oov_micro"),
        )
    )


def length_histogram_stream(stream: DataFrame) -> DataFrame:
    """Running (source, bucket, bucket_lo, n_docs, token_mass) doubling
    histogram over a document stream."""
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    bucket = F.length(F.bin(n_tokens.cast("long"))).cast("long")
    return (
        stream.select(
            "source", n_tokens.cast("long").alias("nt"), bucket.alias("bucket")
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("token_mass"),
        )
        .select(
            "source",
            "bucket",
            F.expr(
                "shiftleft(cast(1 as bigint), cast(bucket - 1 as int))"
            ).alias("bucket_lo"),
            "n_docs",
            "token_mass",
        )
    )
