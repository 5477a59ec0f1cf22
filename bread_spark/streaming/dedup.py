"""Streaming deduplication — the stream-shaped member of the dedup
family (extensions/dedup.py covers the batch strategies).

Two built-in state-bounded mechanisms:

- `dedup_stream_exact`: `dropDuplicatesWithinWatermark(keys)` — drops any
  row whose key was already seen within the watermark horizon. State is
  evicted once the watermark passes, so memory is O(keys per horizon),
  not O(stream history). The right tool for at-least-once sources
  (RPC re-fetch, landing-zone re-delivery) where duplicates arrive close
  together in event time.
- `dedup_stream_by_digest`: same, keyed on a content digest instead of an
  identity column — the streaming analog of `dedup_exact_hash` (dedupe by
  payload, shuffle 32-byte digests).

For exact global dedup across all history, the batch strategies apply at
compaction time; the streaming pass bounds duplicate *bursts* online.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON = "1 hour"


def dedup_stream_exact(
    events: DataFrame, keys: list[str], ts_col: str = "ts", horizon: str = DEFAULT_HORIZON
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon."""
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(keys)


def dedup_stream_by_digest(
    events: DataFrame,
    payload_col: str,
    ts_col: str = "ts",
    horizon: str = DEFAULT_HORIZON,
) -> DataFrame:
    """Content-keyed streaming dedup: digest the payload, dedupe on the
    digest — state holds 32-byte keys regardless of payload size."""
    with_digest = events.withColumn("__digest", F.sha2(F.col(payload_col).cast("binary"), 256))
    return (
        with_digest.withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
