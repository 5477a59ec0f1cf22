"""Behavioral analytics closers: RFM user segmentation and MAD-based
robust outlier QC.

`rfm_segments` — the classic recency/frequency/monetary quartile
segmentation every growth dashboard starts from, over the events
stream: per user, recency_days (days from the user's last event to
the CORPUS max day — a deterministic "now", broadcast from a 1-row
aggregate), frequency (event count) and monetary_micro (exact
micro-quantized value mass); each metric quartiled with NTILE(4)
over (metric, user_id) — exact integers with the user_id tie-break,
so bucket boundaries are engine-stable (no float rank anywhere).
r_bucket 1 = most recent, f/m bucket 1 = heaviest; rfm_code =
r·100 + f·10 + m. The NTILE windows run over the per-USER aggregate
(O(users), not O(events)) — the `daily_value_moving_avg` discipline:
windows over small aggregates, the raw stream never sorts globally.

`value_mad_outliers` — the robust sibling of `value_zscore_outliers`:
mean/stddev QC is itself corrupted by the outliers it hunts; the
median/MAD form (modified z = 0.6745·(x − med)/MAD, flag |z| > 3.5,
Iglewicz–Hoaglin) survives heavy tails. EXACT-LATTICE form (r9
hardening — the original rounded-double med/MAD drifted one ulp
between engines on ONE sf0.1 row, flipping the round-4 z at a
.00005 tie): values micro-quantize to integers; the per-type median
doubles to the exact bigint med2 = 2·median(v_u) (a p=0.5
interpolation of integers lands on the half lattice — ×2 is exact on
BOTH engines); deviations dev2 = 2·v_u − med2 are exact bigints;
mad4 = 2·median(|dev2|) is again an exact bigint. The modified z is
then the SAME double expression over IDENTICAL integer operands on
both engines — z = K·2·dev2/mad4 — so the round-4 boundary cannot
diverge. One trap inside that claim (review catch): DuckDB parses a
bare `0.6745` literal as DECIMAL(5,4) and would evaluate the numerator
EXACTLY before one final cast — a different (more precise) path than
Spark's chained doubles, ulp-apart for ~10% of operand pairs — so the
oracle CASTs the constant to DOUBLE first, making both engines run
double arithmetic end-to-end. Types whose mad4 is 0 (over half the values at the median)
emit NO rows rather than a divide error, documented.

Scale shape: both entries keep the big side shuffle-free against
broadcast stat rows (MAD) or aggregate once to O(users) (RFM); at
100 TB the RFM windows run over the user table — if even THAT
outgrows a window, the two-pass rank (`curriculum_order_distributed`)
is the drop-in.

Streaming: batch-only by design — quartile boundaries and medians are
corpus-order statistics with no bounded-state incremental form; the
online siblings are the HDR quantile stream (value distribution) and
the per-user session/activity streams the catalog already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

MAD_K = 0.6745
MAD_CUT = 3.5


def rfm_df(events: DataFrame) -> DataFrame:
    per_user = events.filter(F.col("user_id").isNotNull()).groupBy(
        "user_id"
    ).agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(
                F.round(F.col("value").cast("double") * 1_000_000).cast(
                    "long"
                )
            ),
            F.lit(0),
        ).alias("monetary_micro"),
    )
    now = per_user.agg(F.max("last_day").alias("now_day"))
    base = per_user.join(F.broadcast(now)).select(
        "user_id",
        F.datediff("now_day", "last_day").cast("long").alias("recency_days"),
        "frequency",
        "monetary_micro",
    )
    r_b = F.ntile(4).over(
        Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    )
    f_b = F.ntile(4).over(
        Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    )
    m_b = F.ntile(4).over(
        Window.orderBy(F.desc("monetary_micro"), F.asc("user_id"))
    )
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        r_b.alias("r_bucket"),
        f_b.alias("f_bucket"),
        m_b.alias("m_bucket"),
    ).withColumn(
        "rfm_code",
        (
            F.col("r_bucket") * 100 + F.col("f_bucket") * 10 + F.col("m_bucket")
        ).cast("int"),
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation (module docstring): (user_id,
    recency_days, frequency, monetary_micro, r_bucket, f_bucket,
    m_bucket, rfm_code)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return rfm_df(ev)


def mad_outliers_df(events: DataFrame) -> DataFrame:
    vu = F.round(F.col("value").cast("double") * 1_000_000).cast("long")
    ev = events.filter(F.col("value").isNotNull()).select(
        "event_id", "event_type", "value", vu.alias("vu")
    )
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(vu, 0.5) * 2")).cast("long").alias("med2")
    )
    deva = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        (F.lit(2) * F.col("vu") - F.col("med2")).alias("dev2"),
    )
    mad = (
        deva.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(abs(dev2), 0.5) * 2"))
            .cast("long")
            .alias("mad4")
        )
        .filter(F.col("mad4") > 0)
    )
    z = F.round(
        F.lit(MAD_K) * 2 * F.col("dev2") / F.col("mad4"), 4
    )
    return (
        deva.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > MAD_CUT)
        .select("event_id", "event_type", "value", z.alias("robust_z"))
    )


def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified-z robust outliers (module docstring): (event_id,
    event_type, value, robust_z)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return mad_outliers_df(ev)


ORACLE_SQL: dict[str, str] = {
    "rfm_segments": """
    WITH per_user AS MATERIALIZED (
        SELECT user_id,
               MAX(CAST(ts AS DATE)) AS last_day,
               CAST(COUNT(1) AS BIGINT) AS frequency,
               CAST(COALESCE(SUM(CAST(ROUND(CAST(value AS DOUBLE)
                                            * 1000000) AS BIGINT)), 0)
                    AS BIGINT) AS monetary_micro
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    nw AS MATERIALIZED (SELECT MAX(last_day) AS now_day FROM per_user)
    SELECT user_id,
           CAST(datediff('day', last_day, n.now_day) AS BIGINT)
               AS recency_days,
           frequency, monetary_micro,
           CAST(NTILE(4) OVER (
               ORDER BY datediff('day', last_day, n.now_day) ASC,
                        user_id ASC) AS INT) AS r_bucket,
           CAST(NTILE(4) OVER (
               ORDER BY frequency DESC, user_id ASC) AS INT) AS f_bucket,
           CAST(NTILE(4) OVER (
               ORDER BY monetary_micro DESC, user_id ASC) AS INT)
               AS m_bucket,
           CAST(NTILE(4) OVER (
               ORDER BY datediff('day', last_day, n.now_day) ASC,
                        user_id ASC) * 100
                + NTILE(4) OVER (
                    ORDER BY frequency DESC, user_id ASC) * 10
                + NTILE(4) OVER (
                    ORDER BY monetary_micro DESC, user_id ASC) AS INT)
               AS rfm_code
    FROM per_user CROSS JOIN nw n
""",
    "value_mad_outliers": f"""
    WITH ev AS MATERIALIZED (
        SELECT event_id, event_type, value,
               CAST(ROUND(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vu
        FROM events
        WHERE value IS NOT NULL
    ),
    med AS MATERIALIZED (
        SELECT event_type,
               CAST(ROUND(quantile_cont(vu, 0.5) * 2) AS BIGINT) AS med2
        FROM ev GROUP BY event_type
    ),
    deva AS MATERIALIZED (
        SELECT e.event_id, e.event_type, e.value,
               2 * e.vu - m.med2 AS dev2
        FROM ev e JOIN med m USING (event_type)
    ),
    mad AS MATERIALIZED (
        SELECT event_type,
               CAST(ROUND(quantile_cont(abs(dev2), 0.5) * 2) AS BIGINT)
                   AS mad4
        FROM deva GROUP BY event_type
        HAVING CAST(ROUND(quantile_cont(abs(dev2), 0.5) * 2) AS BIGINT) > 0
    )
    SELECT d.event_id, d.event_type, d.value,
           ROUND(CAST({MAD_K} AS DOUBLE) * 2 * d.dev2 / s.mad4, 4)
               AS robust_z
    FROM deva d JOIN mad s USING (event_type)
    WHERE abs(ROUND(CAST({MAD_K} AS DOUBLE) * 2 * d.dev2 / s.mad4, 4))
          > {MAD_CUT}
""",
}
