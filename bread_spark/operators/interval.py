"""Interval (range) join — match point events to time intervals without
an equi-key, without a cartesian product.

Spark turns a pure range predicate (`l.ts BETWEEN r.start AND r.end`)
into BroadcastNestedLoopJoin (fine when one side broadcasts) or a
cartesian (fatal at scale). The scalable composition here is time
bucketing:

    choose a bucket width B ≥ the max interval length
    → explode each interval into the buckets it covers (≤ 2 for B ≥ len)
    → bucket the points (1 row each)
    → equi-join on bucket, then apply the exact range filter

The equi-join gives hash-partitioned parallelism; the per-bucket
candidate set is bounded by data density, not table size. This is the
standard bucketed range-join strategy (engines with native range joins —
e.g. interval indexes — do the same thing internally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_key: str | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval containing them.

    `bucket_seconds` should be ≥ the longest interval (each interval then
    spans at most 2 buckets, bounding the explode factor). `extra_key`
    optionally adds an equi-key (e.g. user_id) to the bucket join for
    co-grouped ranges. Output: point columns + interval columns.

    Buckets are epoch-floor longs (F.window can't appear twice in one
    plan, and a long key hashes cheaper than a timestamp anyway).
    """

    def bucket_of(c: str) -> Column:
        return (F.col(c).cast("long") / bucket_seconds).cast("long")

    p = points.withColumn("__bucket", bucket_of(point_ts))
    # interval covers [start, end]: emit one row per covered bucket
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(start_col), bucket_of(end_col), F.lit(1))),
    )
    keys = ["__bucket"] + ([extra_key] if extra_key else [])
    joined = p.join(iv, keys).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bucket")


ERROR_WINDOW_MIN = 5


def events_near_errors(spark, sf_dir: str) -> DataFrame:
    """Catalog entry: per error event, how many same-user events fall in
    its ±5-minute window (the blast-radius query). Equi-key = user_id,
    range = the window — the bucketed join keeps candidates user-local.
    """
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id"),
        (F.col("ts") - F.expr(f"INTERVAL {ERROR_WINDOW_MIN} MINUTES")).alias("win_start"),
        (F.col("ts") + F.expr(f"INTERVAL {ERROR_WINDOW_MIN} MINUTES")).alias("win_end"),
    )
    points = ev.select(F.col("event_id"), F.col("user_id").alias("p_user"), F.col("ts"))
    joined = interval_join(
        points.withColumnRenamed("p_user", "user_id"),
        errors,
        point_ts="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=3600,
        extra_key="user_id",
    )
    return (
        joined.filter(F.col("event_id") != F.col("error_event_id"))
        .groupBy("error_event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby_events"))
    )


ORACLE_SQL: dict[str, str] = {
    "events_near_errors": f"""
        SELECT err.event_id AS error_event_id, COUNT(1) AS n_nearby_events
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') err
        JOIN events e
          ON e.user_id = err.user_id
         AND e.ts BETWEEN err.ts - INTERVAL {ERROR_WINDOW_MIN} MINUTES
                      AND err.ts + INTERVAL {ERROR_WINDOW_MIN} MINUTES
         AND e.event_id <> err.event_id
        GROUP BY err.event_id
    """,
}
