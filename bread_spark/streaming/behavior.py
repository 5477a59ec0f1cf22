"""Streaming twin of the conversion-latency report.

The per-user (first signup, first purchase) table is the report's
entire sufficient statistic and folds as ONE grouped MIN aggregation
in complete mode (the `ab_moments_stream` discipline); a snapshot fed
through the batch `conversion_report_df` IS the batch report over
everything seen. Pinned, including a checkpoint fold, in
tests/test_streaming_behavior.py.

`inter_event_gap_stats` is batch-only (LAG over unbounded per-key
history — see extensions/behavior.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.behavior import conversion_firsts_df


def conversion_firsts_stream(stream: DataFrame) -> DataFrame:
    """Running per-user first-signup/first-purchase micros — the
    identical fold expression as the batch `conversion_firsts_df`."""
    return conversion_firsts_df(stream)
