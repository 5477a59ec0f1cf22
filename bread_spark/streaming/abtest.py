"""Streaming twin of the A/B report — the per-(type, variant) moment
table maintained online.

(n, Σv, Σv²) is the report's entire sufficient statistic and folds as
ONE grouped streaming aggregation in complete mode (the
`nb_model_count_stream` discipline); a snapshot fed through the BATCH
`ab_report_df` IS the batch report over everything seen — one
statistic implementation. Pinned including a checkpoint fold in
tests/test_streaming_abtest.py."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.abtest import ab_moments_df


def ab_moments_stream(stream: DataFrame) -> DataFrame:
    """Running exact moments over an events stream — the identical
    fold expression as the batch `ab_moments_df`."""
    return ab_moments_df(stream)
