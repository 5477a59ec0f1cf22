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


def _rfm_metrics(per_user: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """NTILE bucketing over a prepared per-user metric frame (user_id,
    last_day, frequency, monetary_micro [+ `extra` passthrough columns])
    — the shared tail of `rfm_df` and the half-window forms (r13-opt:
    lets the halves share ONE events aggregate instead of re-scanning)."""
    now = per_user.agg(F.max("last_day").alias("now_day"))
    base = per_user.join(F.broadcast(now)).select(
        "user_id",
        F.datediff("now_day", "last_day").cast("long").alias("recency_days"),
        "frequency",
        "monetary_micro",
        *extra,
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
        *extra,
        r_b.alias("r_bucket"),
        f_b.alias("f_bucket"),
        m_b.alias("m_bucket"),
    ).withColumn(
        "rfm_code",
        (
            F.col("r_bucket") * 100 + F.col("f_bucket") * 10 + F.col("m_bucket")
        ).cast("int"),
    )


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
    return _rfm_metrics(per_user).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        "r_bucket",
        "f_bucket",
        "m_bucket",
        "rfm_code",
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


# Midpoint of the events probe window (2024-01-01..01-30) — the
# before/after split the migration and churn reports compare. A
# data-window constant like the CUSUM baseline days: stated, not
# discovered.
SPLIT_TS = "2024-01-16 00:00:00"


def _half_user_metrics(ev: DataFrame) -> DataFrame:
    """ONE events pass computing BOTH halves' per-user RFM inputs via
    conditional aggregation (r13-opt, guide §2.3 "aggregate before you
    shuffle"/§2.4: the two-half entries below used to filter and
    re-aggregate the events stream once per half — two full scans and
    two user-keyed exchanges; this computes identical per-half values
    in a single scan + single exchange). A user's half-H columns equal
    exactly what a groupBy over the half-H filtered stream would have
    produced: MAX/COUNT/SUM over `WHEN(half-H)` operands ignore the
    other half's rows (NULL operands), and `freq_h > 0` reproduces the
    half's membership set."""
    c1 = F.expr(f"ts < TIMESTAMP '{SPLIT_TS}'")
    c2 = F.expr(f"ts >= TIMESTAMP '{SPLIT_TS}'")
    vu = F.round(F.col("value").cast("double") * 1_000_000).cast("long")
    return ev.filter(F.col("user_id").isNotNull()).groupBy("user_id").agg(
        F.max(F.when(c1, F.to_date("ts"))).alias("last_day_1"),
        F.count(F.when(c1, F.lit(1))).alias("freq_1"),
        F.coalesce(F.sum(F.when(c1, vu)), F.lit(0)).alias("mon_1"),
        F.max(F.when(c2, F.to_date("ts"))).alias("last_day_2"),
        F.count(F.when(c2, F.lit(1))).alias("freq_2"),
        F.coalesce(F.sum(F.when(c2, vu)), F.lit(0)).alias("mon_2"),
    )


def _half_metrics_frame(pu: DataFrame, half: int, extra: tuple[str, ...] = ()) -> DataFrame:
    """Project one half's per-user metric frame out of the combined
    aggregate: exactly the users active in that half, with the same
    (last_day, frequency, monetary_micro) the per-half aggregation
    produced."""
    return pu.filter(F.col(f"freq_{half}") > 0).select(
        "user_id",
        F.col(f"last_day_{half}").alias("last_day"),
        F.col(f"freq_{half}").alias("frequency"),
        F.col(f"mon_{half}").alias("monetary_micro"),
        *extra,
    )


def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segment migration: each user's rfm_code computed
    INDEPENDENTLY on the window's two halves (each half gets its own
    quartile boundaries and recency anchor — the report compares
    relative standing, not absolute values), then the
    (code_before, code_after, n_users) transition matrix over users
    active in BOTH halves. The movement table a retention team reads
    next to the static `rfm_segments` snapshot.

    Scale shape (r13-opt): ONE events scan + ONE user-keyed exchange
    builds both halves' per-user metrics (`_half_user_metrics`,
    localCheckpointed — O(users), the same bound the NTILE windows
    already sort), each half's quartile windows run over its filtered
    projection, then one user-keyed join of the two code frames + one
    O(codes²)-output aggregate. Previously: two independent rfm_df
    passes = two scans + two exchanges. Batch-only with the RFM
    family's rationale (corpus-order statistics per half)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    pu = _half_user_metrics(ev).localCheckpoint()
    h1 = _rfm_metrics(_half_metrics_frame(pu, 1)).select(
        "user_id", F.col("rfm_code").alias("code_before")
    )
    h2 = _rfm_metrics(_half_metrics_frame(pu, 2)).select(
        F.col("user_id").alias("u2"), F.col("rfm_code").alias("code_after")
    )
    return (
        h1.join(h2, h1.user_id == F.col("u2"))
        .groupBy("code_before", "code_after")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def segment_churn_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment churn: of the users holding each first-half
    rfm_code, how many have NO second-half events at all, as an exact
    truncating-division ppm. The forward-looking use of the RFM
    snapshot: which segment bleeds.

    r13-opt: the combined `_half_user_metrics` aggregate already
    carries each user's second-half event count, so "no second-half
    events" is `freq_2 = 0` — the former keyed ANTI join against a
    distinct second-half user set (a second scan + distinct exchange +
    join) collapses into a conditional count inside the ONE
    rfm_code aggregate. Result-identical: both halves' frames derive
    from the same NULL-user-filtered events, so anti-join-vs-active2
    ≡ freq_2 = 0 user-for-user."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    pu = _half_user_metrics(ev)
    scored = _rfm_metrics(
        _half_metrics_frame(pu, 1, extra=("freq_2",)), extra=("freq_2",)
    )
    return scored.groupBy("rfm_code").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("freq_2") == 0, 1).otherwise(0)).alias(
            "n_churned"
        ),
    ).select(
        "rfm_code",
        "n_users",
        "n_churned",
        F.expr(
            "CAST((CAST(n_churned AS DECIMAL(38,0))"
            " * 1000000) div n_users AS BIGINT)"
        ).alias("churn_ppm"),
    )


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


def _rfm_half_sql(extra_pred: str) -> str:
    """The certified rfm_segments oracle restricted to a half-window —
    the SAME text with one additional WHERE conjunct, so the two can
    never drift."""
    return ORACLE_SQL["rfm_segments"].replace(
        "WHERE user_id IS NOT NULL",
        f"WHERE user_id IS NOT NULL AND {extra_pred}",
    )


_H1 = _rfm_half_sql("ts < TIMESTAMP '2024-01-16 00:00:00'")
_H2 = _rfm_half_sql("ts >= TIMESTAMP '2024-01-16 00:00:00'")

ORACLE_SQL["segment_migration_matrix"] = f"""
    WITH h1 AS MATERIALIZED ({_H1}),
    h2 AS MATERIALIZED ({_H2})
    SELECT h1.rfm_code AS code_before, h2.rfm_code AS code_after,
           COUNT(*) AS n_users
    FROM h1 JOIN h2 USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["segment_churn_rates"] = f"""
    WITH h1 AS MATERIALIZED ({_H1}),
    active2 AS MATERIALIZED (
        SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL
          AND ts >= TIMESTAMP '2024-01-16 00:00:00'
    )
    SELECT rfm_code,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN a.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           CAST((CAST(SUM(CASE WHEN a.user_id IS NULL THEN 1 ELSE 0 END)
                 AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT) AS churn_ppm
    FROM h1 LEFT JOIN active2 a USING (user_id)
    GROUP BY rfm_code
"""
