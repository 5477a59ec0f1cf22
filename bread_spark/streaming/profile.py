"""Streaming twin of the column profiler — the mergeable profile lanes
maintained online over a table stream.

`table_profile`'s per-column statistics split cleanly by mergeability:
row count, non-null count, and the md5-lane XOR fingerprint are
commutative folds (SUM/SUM/XOR merge), so grouped streaming
aggregation in complete mode maintains them exactly — each micro-batch
folds in and the running table always equals the batch profile of
everything seen so far (pinned in tests/test_streaming_profile.py,
including a restart). Exact `n_distinct` is deliberately ABSENT from
the streaming twin: exact distinct over an unbounded stream needs
state proportional to the number of distinct values (Spark rejects
streaming countDistinct for the same reason); the streaming-scale
answer is the HLL register stream (`streaming/sketch.py`), which the
profile consumer joins on when an online cardinality estimate is
worth ±2%. The FK/uniqueness constraint checks stay batch-only for
the same reason: they are joins/distincts against the FULL key
history, which is exactly what the nightly batch suite is for."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.profile import _LANE, _long_form


def profile_stream(stream: DataFrame, table: str) -> DataFrame:
    """Running (table_name, column_name, n_rows, n_nonnull, xor_lane)
    over a stream of `table`-shaped rows (complete output mode)."""
    from pyspark.sql import functions as F

    # the batch profiler's OWN lane expression — the twin's equality
    # with the batch fingerprint must survive any future lane change
    lane = _LANE.format(c="canon")
    return (
        _long_form(stream, table)
        .groupBy("table_name", "column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("canon").alias("n_nonnull"),
            F.expr(f"bit_xor({lane})").alias("xor_lane"),
        )
    )
