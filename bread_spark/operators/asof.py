"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The naive
translation — a range theta-join + groupBy max — is a cartesian blow-up
per key. This implementation is the scalable composition:

    union both sides on (key, ts)
    → one shuffle, partitionBy(key) orderBy(ts, side)
    → `last(value, ignorenulls=True)` running window carries the most
      recent right-side values forward
    → keep left rows, now annotated with the carried right columns

Cost: ONE shuffle of left+right (same as any keyed join), zero row
blow-up, works at any key cardinality. Right-side ties at equal ts sort
before left rows (side ordinal), matching ASOF's `ts_left >= ts_right`
inclusivity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: every `left` row + the latest `right` row with
    `right.on <= left.on`, matched per `by` key(s). Left rows with no
    prior right row keep NULLs (LEFT ASOF semantics).

    `value_cols`: right-side columns to carry (default: all but on/by).
    The right side's `on` is carried as `right_ts_alias`.

    Requirement: (by, on) must uniquely identify right rows — pre-
    aggregate the right side otherwise (ambiguous as-of matches are
    engine-dependent in any implementation).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {on, *by_cols}]

    # The carried right-side payload travels as ONE struct so a single
    # last(ignorenulls=True) picks the whole matched row atomically — a
    # per-column last() would resurrect older non-null values when the
    # matched row has NULLs in some value columns, mixing columns from
    # different right rows (diverging from matched-row ASOF semantics).
    payload_type = StructType(
        [StructField("__ts", right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(payload_type)
    )

    r_tagged = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(on).alias("__ts"), *[F.col(c) for c in value_cols]
        ).alias("__r"),
    )
    for c in left.columns:
        if c not in {on, *by_cols}:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__c", F.last("__r", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "*",
            F.col("__c.__ts").alias(right_ts_alias),
            *[F.col(f"__c.{c}").alias(c) for c in value_cols],
        )
        .drop("__side", "__r", "__c")
    )


def last_purchase_asof(spark, sf_dir: str) -> DataFrame:
    """Catalog entry: annotate every event with the user's most recent
    purchase at or before it (amount + its timestamp). Oracle: DuckDB's
    native ASOF LEFT JOIN over the identical pre-aggregated right side."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("purchase_value"))
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="ts",
        by="user_id",
        value_cols=["purchase_value"],
        right_ts_alias="purchase_ts",
    )
    return out.select("event_id", "user_id", "ts", "purchase_ts", "purchase_value")


ORACLE_SQL: dict[str, str] = {
    "last_purchase_asof": """
        WITH p AS (
            SELECT user_id, ts AS p_ts, ROUND(MAX(value), 4) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts,
               p.p_ts AS purchase_ts, p.purchase_value
        FROM events e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.p_ts
    """,
}
