"""Streaming statistical QC — the stream-shaped twin of
`models.value_zscore_outliers`.

The deployment shape at 100 TB: reference stats (per-type mean/stddev)
are TRAINED on history — a tiny batch aggregate, one row per event type
— and the live stream is scored against them map-side. The monitor is
stateless (projection + broadcast join + filter): no watermark, no
streaming aggregation state, so it runs in append mode at whatever rate
the source produces. Retraining is a batch job that replaces the stats
frame between restarts; scoring never pays more than a broadcast.

Agreement contract: scoring the SAME corpus the stats were trained on
must reproduce the batch operator's flagged set exactly — pinned in
`tests/test_streaming_anomaly.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_monitor_stream(stream: DataFrame, stats: DataFrame) -> DataFrame:
    """Flag streaming events whose value is > 3 sample standard
    deviations from their type's REFERENCE mean (`stats` = the static
    (event_type, mu, sigma) frame, e.g. `models.event_type_stats` over
    the history). Verdict on the rounded z — identical boundary rule to
    the batch operator. Types absent from the stats frame pass through
    unflagged (inner join: no reference, no verdict)."""
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        stream.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "ts", "event_type", "value", z.alias("z"))
    )
