"""Stream-stream joins with watermark-bounded state.

The last member of the streaming matrix (incremental ETL, windowed aggs,
dedup, sessionization, and now two-sided joins). A stream-stream join
buffers both sides; unbounded, that's O(history) state. Bounding it needs
BOTH a watermark on each side AND a time-range predicate relating the two
event times — then Spark evicts buffered rows once they can no longer
match anything.

`join_within` expresses the common shape: same-key rows whose event times
fall within `window_seconds` of each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW_SEC = 600
DEFAULT_LATENESS = "30 minutes"


def join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    window_seconds: int = DEFAULT_WINDOW_SEC,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Inner join of two streams on `key` where the right event happens
    within [left_ts, left_ts + window_seconds]. Both sides watermarked so
    join state is evicted `lateness` past the window.

    Works identically on batch DataFrames (watermarks are no-ops), which
    is how the batch oracle checks the semantics.
    """
    l = left.withWatermark(left_ts, lateness)
    r = right.withWatermark(right_ts, lateness)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return l.join(r, cond, "inner").drop(r[key])
