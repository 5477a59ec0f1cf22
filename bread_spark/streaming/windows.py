"""Event-time windowed aggregation with watermark late-data handling.

The reference has no true stream processing (SURVEY.md §2.9) — its
"late data" story is batch reconciliation (S4). This module is the
Spark-native forward path: tumbling event-time windows over the events
stream with a watermark bounding how late data may arrive.

Semantics:
- window(ts, W) buckets by event time, not arrival time;
- withWatermark(ts, L) keeps a window's state open until the watermark
  (max event time − L) passes its end, then finalizes + evicts — memory
  is O(open windows), not O(history);
- rows later than the watermark are dropped (counted nowhere), which is
  the documented trade vs. the reference's re-extract-and-append repair.

The same function body works for batch DataFrames (watermark is a no-op
in batch), so the batch catalog query and the streaming deployment share
one definition — and the batch run is the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "1 hour"
DEFAULT_LATENESS = "2 hours"


def windowed_value_by_type(
    events: DataFrame,
    window: str = DEFAULT_WINDOW,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Tumbling-window sum/count per event type with a late-data bound.

    Works on both a static DataFrame and a stream; on a stream the output
    is append-mode finalized windows.
    """
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "total_value",
            "n_events",
        )
    )


def windowed_ohlc(
    events: DataFrame,
    window: str = DEFAULT_WINDOW,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Tumbling-window OHLC bars per event type — the streaming form of
    `models.hourly_ohlc_by_type` (min_by/max_by are declarative
    aggregates, so they run in streaming state like sum/count; the
    partial buffers merge across micro-batches and the window finalizes
    at the watermark). The SAME `models.event_order_key` tie-break as
    the batch operator — one definition, so batch and stream agree
    exactly per window, pinned in test_streaming_windows.py. Works on a
    static frame too (watermark is a no-op in batch)."""
    from ..models import event_order_key

    key = event_order_key()
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def windowed_value_query(spark, sf_dir: str) -> DataFrame:
    """Catalog entry: the batch run of the streaming definition."""
    from ..io import load_table

    return windowed_value_by_type(load_table(spark, sf_dir, "events"))


ORACLE_SQL: dict[str, str] = {
    "windowed_value_by_type": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
               event_type,
               ROUND(SUM(value), 4) AS total_value,
               COUNT(1) AS n_events
        FROM events
        GROUP BY 1, 2, 3
    """,
}
