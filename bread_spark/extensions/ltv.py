"""Customer-lifetime analytics over the orders fact — the
cohort-revenue and purchase-cadence tables a growth/finance stack
reads, in the repo's exactness discipline. The orders-side siblings of
the events-side `retention_cohorts` / `inter_event_gap_stats`.

- `revenue_cohorts` — classic cohort-LTV triangle: customers grouped
  by FIRST-order month, revenue rolled up by (cohort_month,
  month_offset). The month offset is exact integer arithmetic
  (year·12+month deltas — never a float months_between), revenue sums
  are order-totalprice cents (probed cents-exact) accumulated as
  DECIMAL(38,0)/HUGEINT, presented once as ROUND(cents/100).
- `order_interarrival_stats` — per-nation purchase cadence: gap =
  LAG over (c_custkey ORDER BY o_orderdate, o_orderkey) — the
  deterministic tie-break discipline — in exact integer days; n/mean
  exact truncating division; p50/p90 ride the certified
  percentile ↔ quantile_cont parity (rounded 6, the behavior.py
  precedent).

Scale shape: `revenue_cohorts` is two custkey-keyed aggregates (first
order, then the join back) — the cohort table is O(customers) but the
join is keyed, and the output is O(months²) — bounded by calendar
time. `order_interarrival_stats` is ONE custkey-keyed window exchange
then a nation aggregate; nation names arrive by broadcast. No
crossJoin, no unbounded collect, no global sort.

Streaming: batch-only family by design — cohort assignment and LAG
need each customer's full order history (unbounded per-key state);
the incremental path is partition-grain recompute of affected cohort
months over the partitioned sink, the same note as the warehouse
suite.

Reference parity: the reference has no cohort/cadence analytics;
additive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

PRICE_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
# exact month index: year·12 + (month−1)
MONTH_IDX = "(year(o_orderdate) * 12 + month(o_orderdate) - 1)"


def _cohort_cells(orders: DataFrame) -> DataFrame:
    """Exact cohort cells (cohort_month, month_offset, n_customers,
    n_orders, cents_sum) over any (o_custkey, o_orderdate,
    o_totalprice) frame — the additive core both the batch triangle
    and the incremental splice read (cents stay exact integers here;
    rounding happens once, in the presentation projection).

    r13-opt plan (guide §2.3/§2.4): cohort_idx = MIN(m_idx) OVER
    (PARTITION BY o_custkey) — the former groupBy + join-back paid the
    custkey exchange twice and joined; the window computes the same
    value on ONE exchange. Rows then pre-aggregate per (custkey,
    cohort_idx, m_idx) — exchange-free, the custkey partitioning
    already clusters them — which makes the cell aggregate's
    n_customers a plain COUNT(1) (each customer contributes exactly
    one pre-aggregated row per cell) instead of a COUNT(DISTINCT)
    expand. Same exact integers cell-for-cell: n_orders/cents_sum are
    sums of per-customer partials (DECIMAL(38,0) addition is
    associative), n_customers counts the same distinct membership."""
    from pyspark.sql.window import Window

    o = orders.select(
        "o_custkey",
        F.expr(MONTH_IDX).alias("m_idx"),
        F.expr(PRICE_CENTS).alias("cents"),
    )
    o2 = o.withColumn(
        "cohort_idx", F.min("m_idx").over(Window.partitionBy("o_custkey"))
    )
    pre = o2.groupBy("o_custkey", "cohort_idx", "m_idx").agg(
        F.count(F.lit(1)).alias("n_orders_part"),
        F.expr("sum(CAST(cents AS DECIMAL(38,0)))").alias("cents_part"),
    )
    return pre.groupBy(
        F.expr(
            "make_date(cohort_idx div 12, cohort_idx % 12 + 1, 1)"
        ).alias("cohort_month"),
        (F.col("m_idx") - F.col("cohort_idx")).alias("month_offset"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("n_orders_part").alias("n_orders"),
        F.sum("cents_part").alias("cents_sum"),
    )


def _present_cells(cells: DataFrame) -> DataFrame:
    return cells.select(
        "cohort_month",
        "month_offset",
        "n_customers",
        "n_orders",
        F.round(F.expr("CAST(cents_sum AS DOUBLE) / 100.0"), 2).alias(
            "revenue"
        ),
    )


def revenue_cohorts_df(orders: DataFrame) -> DataFrame:
    """Cohort triangle over any (o_custkey, o_orderdate,
    o_totalprice) frame (module docstring)."""
    return _present_cells(_cohort_cells(orders))


def revenue_cohorts_incremental_df(
    base: DataFrame, new: DataFrame
) -> DataFrame:
    """The cohort triangle maintained INCREMENTALLY: the full batch
    answer over base∪new, computed by touching only (a) the base
    triangle's aggregate cells and (b) the orders of AFFECTED
    customers (those appearing in the new batch). Cell-wise splice:

        result = cells(base) − cells(base ∩ affected)
                              + cells((base ∪ new) ∩ affected)

    Every cell statistic is additive by customer (a customer's orders
    land in exactly the cells its own history defines — n_customers
    is a 0/1 membership per cell, n_orders/cents are sums), so the
    subtraction is exact; a new EARLIER order moving a customer's
    cohort month is handled because the customer's whole history is
    re-celled inside the affected recompute. Cells whose counts reach
    zero are dropped (they existed only through affected customers).
    At warehouse scale this is the partition-grain recompute the
    batch-only notes name: the unaffected triangle is never re-read,
    and the recompute joins are keyed on custkey.

    The CATALOG entry (`revenue_cohorts_incremental`) splits the
    orders fact at 2000-07-01 and carries the SAME oracle as
    `revenue_cohorts` — the oracle differential itself certifies
    incremental ≡ batch, per the driver's own gate."""
    affected = new.select(F.col("o_custkey").alias("a_key")).distinct()
    base_aff = base.join(
        affected, base.o_custkey == F.col("a_key"), "left_semi"
    )
    old = _cohort_cells(base)
    # r13-opt: c_old and c_new both read the affected customers' order
    # rows (base_aff for one, base_aff ∪ new for the other). Compute
    # that row set ONCE, custkey-partitioned, and localCheckpoint it —
    # bounded by the operator's own contract (only affected customers'
    # history is touched) — so the two cell builds share the scan and
    # the exchange instead of re-running the semi-join pipeline twice.
    cols = ["o_custkey", "o_orderdate", "o_totalprice"]
    aff_rows = (
        base_aff.select(*cols, F.lit(0).alias("is_new"))
        .unionByName(new.select(*cols, F.lit(1).alias("is_new")))
        .repartition("o_custkey")
        .localCheckpoint()
    )
    c_old = _cohort_cells(aff_rows.filter(F.col("is_new") == 0).select(*cols)).select(
        F.col("cohort_month").alias("om"),
        F.col("month_offset").alias("oo"),
        F.col("n_customers").alias("d_cust"),
        F.col("n_orders").alias("d_ord"),
        F.col("cents_sum").alias("d_cents"),
    )
    c_new = _cohort_cells(aff_rows.select(*cols)).select(
        F.col("cohort_month").alias("nm"),
        F.col("month_offset").alias("no"),
        F.col("n_customers").alias("a_cust"),
        F.col("n_orders").alias("a_ord"),
        F.col("cents_sum").alias("a_cents"),
    )
    merged = (
        old.join(
            c_old,
            (old.cohort_month == c_old.om) & (old.month_offset == c_old.oo),
            "full_outer",
        )
        .select(
            F.coalesce("cohort_month", "om").alias("cohort_month"),
            F.coalesce("month_offset", "oo").alias("month_offset"),
            (
                F.coalesce("n_customers", F.lit(0))
                - F.coalesce("d_cust", F.lit(0))
            ).alias("n_customers"),
            (
                F.coalesce("n_orders", F.lit(0)) - F.coalesce("d_ord", F.lit(0))
            ).alias("n_orders"),
            F.expr(
                "coalesce(cents_sum, CAST(0 AS DECIMAL(38,0)))"
                " - coalesce(d_cents, CAST(0 AS DECIMAL(38,0)))"
            ).alias("cents_sum"),
        )
    )
    spliced = (
        merged.join(
            c_new,
            (merged.cohort_month == c_new.nm)
            & (merged.month_offset == c_new.no),
            "full_outer",
        )
        .select(
            F.coalesce("cohort_month", "nm").alias("cohort_month"),
            F.coalesce("month_offset", "no").alias("month_offset"),
            (
                F.coalesce("n_customers", F.lit(0))
                + F.coalesce("a_cust", F.lit(0))
            ).alias("n_customers"),
            (
                F.coalesce("n_orders", F.lit(0)) + F.coalesce("a_ord", F.lit(0))
            ).alias("n_orders"),
            F.expr(
                "coalesce(cents_sum, CAST(0 AS DECIMAL(38,0)))"
                " + coalesce(a_cents, CAST(0 AS DECIMAL(38,0)))"
            ).alias("cents_sum"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return _present_cells(spliced)


INCR_SPLIT_TS = "2000-07-01 00:00:00"


def revenue_cohorts_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (docstring of `revenue_cohorts_incremental_df`):
    base = orders before {INCR_SPLIT_TS}, new batch = the rest; the
    oracle is the BATCH triangle over all orders."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    base = orders.filter(F.expr(f"o_orderdate < TIMESTAMP '{INCR_SPLIT_TS}'"))
    new = orders.filter(F.expr(f"o_orderdate >= TIMESTAMP '{INCR_SPLIT_TS}'"))
    return revenue_cohorts_incremental_df(base, new)


def revenue_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (module docstring)."""
    return revenue_cohorts_df(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderdate", "o_totalprice"
        )
    )


def order_gaps_df(orders: DataFrame) -> DataFrame:
    """(o_custkey, gap_days) — exact integer days between a customer's
    consecutive orders, (orderdate, orderkey) deterministic order; the
    shared core of the cadence report and the survival curve."""
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.expr("CAST(o_orderdate AS DATE)").alias("d"),
        )
        .select(
            "o_custkey",
            F.expr("datediff(d, lag(d) OVER (PARTITION BY o_custkey"
                   " ORDER BY d, o_orderkey))").alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


def interarrival_df(orders: DataFrame, cust: DataFrame, nation: DataFrame) -> DataFrame:
    """Per-nation order-gap cadence over (o_custkey, o_orderkey,
    o_orderdate) × (c_custkey, c_nationkey) × nation frames."""
    g = order_gaps_df(orders)
    per_nation = (
        g.join(cust, g.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("sum(gap_days) div count(gap_days)").alias("mean_gap_days"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("p50_gap_days"),
            F.round(F.expr("percentile(gap_days, 0.9)"), 6).alias("p90_gap_days"),
        )
    )
    return per_nation


def order_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (module docstring)."""
    return interarrival_df(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderdate"
        ),
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
    )


SURVIVAL_WEEKS = 14  # grid: weeks 0..13, last bucket absorbs the tail


def order_gap_survival_df(spark: SparkSession, gaps: DataFrame) -> DataFrame:
    """Empirical survival curve of the inter-order gap at a weekly
    grid: S(w) = P(gap >= 7w), exact ppm. Gaps bucket map-side into
    least(gap div 7, 13); the full 14-row spine left-joins the counts
    (silent weeks are explicit zeros, the gap-fill discipline); the
    tail sums S(w) = Σ_{w'>=w} n run as a single-partition window over
    the BOUNDED 14-row aggregate — the `source_concentration`
    precedent. survival_ppm(0) = 1_000_000 by construction (every gap
    is >= 0); no censoring model (every observed gap is a completed
    interval — the open interval after a customer's last order is not
    a gap row, stated scope)."""
    wk = F.expr(f"least(gap_days div 7, {SURVIVAL_WEEKS - 1})")
    counts = gaps.select(wk.alias("wk")).groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_bucket")
    )
    spine = spark.range(SURVIVAL_WEEKS).select(F.col("id").alias("week"))
    from pyspark.sql.window import Window

    filled = spine.join(counts, spine.week == counts.wk, "left").select(
        "week", F.coalesce("n_bucket", F.lit(0)).alias("n_bucket")
    )
    w_tail = Window.orderBy(F.desc("week")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("week").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        filled.select(
            "week",
            (F.col("week") * 7).alias("gap_days_floor"),
            "n_bucket",
            F.sum("n_bucket").over(w_tail).alias("n_surviving"),
            F.sum("n_bucket").over(w_all).alias("n_total"),
        )
        .select(
            "week",
            "gap_days_floor",
            "n_bucket",
            "n_surviving",
            F.expr(
                "CASE WHEN n_total > 0 THEN CAST((CAST(n_surviving AS"
                " DECIMAL(38,0)) * 1000000) div n_total AS BIGINT) END"
            ).alias("survival_ppm"),
        )
    )


def order_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry (docstring of `order_gap_survival_df`)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return order_gap_survival_df(spark, order_gaps_df(orders))


ORACLE_SQL: dict[str, str] = {
    "revenue_cohorts": f"""
    WITH o AS (
        SELECT o_custkey,
               {MONTH_IDX} AS m_idx,
               {PRICE_CENTS} AS cents
        FROM orders
    ),
    firsts AS (
        SELECT o_custkey AS f_custkey, MIN(m_idx) AS cohort_idx
        FROM o GROUP BY 1
    )
    SELECT make_date(CAST(cohort_idx // 12 AS INTEGER),
                     CAST(cohort_idx % 12 + 1 AS INTEGER), 1)
               AS cohort_month,
           CAST(m_idx - cohort_idx AS BIGINT) AS month_offset,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0, 2)
               AS revenue
    FROM o JOIN firsts ON o_custkey = f_custkey
    GROUP BY 1, 2
""",
    "order_interarrival_stats": """
    WITH g AS (
        SELECT o_custkey,
               datediff('day',
                        lag(CAST(o_orderdate AS DATE)) OVER (
                            PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                        CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    )
    SELECT n_name AS nation,
           COUNT(gap_days) AS n_gaps,
           CAST(SUM(gap_days) // COUNT(gap_days) AS BIGINT) AS mean_gap_days,
           ROUND(quantile_cont(gap_days, 0.5), 6) AS p50_gap_days,
           ROUND(quantile_cont(gap_days, 0.9), 6) AS p90_gap_days
    FROM g
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE gap_days IS NOT NULL
    GROUP BY n_name
""",
    "order_gap_survival": """
    WITH g AS (
        SELECT datediff('day',
                        lag(CAST(o_orderdate AS DATE)) OVER (
                            PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                        CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ),
    counts AS (
        SELECT LEAST(gap_days // 7, 13) AS wk, COUNT(*) AS n_bucket
        FROM g WHERE gap_days IS NOT NULL
        GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, 14)) AS week),
    filled AS (
        SELECT week, COALESCE(n_bucket, 0) AS n_bucket
        FROM spine LEFT JOIN counts ON week = wk
    )
    SELECT week,
           CAST(week * 7 AS BIGINT) AS gap_days_floor,
           CAST(n_bucket AS BIGINT) AS n_bucket,
           CAST(SUM(n_bucket) OVER (ORDER BY week DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_surviving,
           CASE WHEN SUM(n_bucket) OVER () > 0 THEN
               CAST((CAST(SUM(n_bucket) OVER (ORDER BY week DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS HUGEINT) * 1000000)
                    // SUM(n_bucket) OVER () AS BIGINT) END AS survival_ppm
    FROM filled
""",
}

# incremental ≡ batch: the SAME oracle certifies the spliced result
ORACLE_SQL["revenue_cohorts_incremental"] = ORACLE_SQL["revenue_cohorts"]
