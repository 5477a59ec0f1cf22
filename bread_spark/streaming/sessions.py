"""Stateful streaming: gap-based sessionization over the events stream.

Two implementations of the same semantics (30-min inactivity gap):

- `sessionize_batch`: pure DataFrame ops (lag → gap flag → running count)
  for the batch/gold path — SQL-expressible, oracle-checkable.
- `sessionize_stream`: `applyInPandasWithState` for a true incremental
  stream with per-user state and event-time timeout — the custom stateful
  operator pattern (Pandas UDF is justified here: cross-batch state is not
  expressible with built-in operators short of session windows).

Spark does ship `F.session_window` for windowed aggs; the stateful variant
is kept because it generalizes (e.g. carrying arbitrary per-session
aggregates), and the batch variant exists because the gold DAG and the
correctness oracle are batch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize_batch(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds `gap_minutes`.

    Plan: one shuffle (partitionBy user) + two window passes over already
    co-located data. At 100 TB, user_id partitioning is naturally uniform
    (hot users are bounded by human activity rates).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_sec = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap_sec.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return with_flag.withColumn("session_id", F.sum("new_session").over(run))


def session_stats(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Per-session rollup: events, span, value — the serving-layer shape."""
    s = sessionize_batch(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def session_stats_query(spark, sf_dir: str) -> DataFrame:
    """Catalog entry: per-session rollup over the events table."""
    from ..io import load_table

    return session_stats(load_table(spark, sf_dir, "events"))


ORACLE_SQL: dict[str, str] = {
    "session_stats": f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessioned AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, COUNT(1) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               ROUND(SUM(value), 4) AS session_value
        FROM sessioned GROUP BY user_id, session_id
    """,
}


# ---------------------------------------------------------------------------
# Streaming variant: applyInPandasWithState
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = (
    "last_ts long, session_id long, n_events long, total_value double, start_ts long"
)
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, session_start timestamp, "
    "session_end timestamp, session_value double"
)


def _session_func(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator. Emits one row per closed session plus
    the (still-open) trailing session on timeout."""
    (user_id,) = key
    if state.exists:
        last_ts, session_id, n_events, total_value, start_ts = state.get
    else:
        last_ts, session_id, n_events, total_value, start_ts = None, 0, 0, 0.0, None

    out_rows = []
    gap = SESSION_GAP_MIN * 60
    # Materialize ALL Arrow chunks before sorting: applyInPandasWithState
    # does not guarantee event-time order across the chunks a key's rows
    # span within one micro-batch, and the gap computation needs a globally
    # sorted view per key per batch. Memory is bounded by one key's rows in
    # one micro-batch (not the whole partition).
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_s = ts.value // 1_000_000_000  # pandas ns → s
            if last_ts is not None and ts_s - last_ts > gap:
                out_rows.append((user_id, session_id, n_events, start_ts, last_ts, round(total_value, 4)))
                session_id += 1
                n_events, total_value, start_ts = 0, 0.0, ts_s
            if start_ts is None:
                start_ts = ts_s
            n_events += 1
            total_value += float(value)
            last_ts = ts_s

    if state.hasTimedOut:
        if n_events:
            out_rows.append((user_id, session_id, n_events, start_ts, last_ts, round(total_value, 4)))
        state.remove()
    else:
        state.update((last_ts, session_id, n_events, total_value, start_ts))
        state.setTimeoutDuration(60 * 60 * 1000)  # close sessions after 1h idle

    yield pd.DataFrame(
        out_rows,
        columns=["user_id", "session_id", "n_events", "session_start", "session_end", "session_value"],
    ).astype({"session_start": "datetime64[s]", "session_end": "datetime64[s]"}, errors="ignore")


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization with per-user state (SURVEY §2.9 — the
    reference has no true streaming; this is the Spark-native extension).

    State is (last_ts, open-session aggregates) per user — O(users) not
    O(events); closed sessions emit downstream and leave state.

    Termination note: ProcessingTimeTimeout means pending timeouts keep the
    query scheduling state-cleanup batches indefinitely — even under
    ``Trigger.AvailableNow`` it will NOT self-terminate. That is the right
    behavior for the intended always-on deployment; batch-style callers
    should poll the sink and ``stop()`` explicitly.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_func,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
