"""Streaming curation monitors — the stream-shaped members of the
corpus-curation family (extensions/curation.py, functions/text.py cover
the batch forms).

A 100 TB corpus doesn't land at once: crawls arrive continuously, and
the numbers a curation dashboard watches (per-source volume, token
mass, quality-gate pass rate) must update as batches land, not after a
nightly rebuild. Both monitors are unbounded streaming aggregations
keyed on `source` — state is O(sources), the smallest state any
grouped streaming aggregate can hold, so no watermark is needed; run
them in `update`/`complete` output mode into a dashboard sink.

The quality monitor composes the SAME `gopher_quality_gate_df`
expressions the batch gate runs — shuffle-free projections apply to a
streaming frame unchanged, so the batch catalog entry and the monitor
can never disagree on a verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gopher_quality_gate_df


def corpus_stats_stream(docs: DataFrame) -> DataFrame:
    """Running per-source ingestion stats over a document stream:
    document count, token mass, mean tokens. The streaming twin of
    `corpus_stats_by_source` (minus the distinct-counts, which need
    approximate forms in streaming state)."""
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return (
        docs.select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        )
    )


def quality_monitor_stream(docs: DataFrame) -> DataFrame:
    """Running per-source Gopher-gate pass rate over a document stream —
    the early-warning signal that a crawl's quality shifted (a source
    whose pass rate drops mid-ingestion gets quarantined before it
    pollutes the mix)."""
    gated = gopher_quality_gate_df(docs, keep=("source",)).select(
        "source", "passes"
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_passing"),
        F.round(
            F.avg(F.when(F.col("passes"), 1.0).otherwise(0.0)), 4
        ).alias("pass_rate"),
    )
