"""Data-quality expectation suite: column profiles + constraint checks.

The reference pipeline trusts its inputs (SURVEY.md §2.12's dbt tests
cover two gold columns); a 100 TB ingest cannot — before a training run
reads a corpus snapshot, a validation job profiles every column and
evaluates the declared expectations, and the run aborts on regression.
This module is that job, Deequ/Great-Expectations-shaped but expressed
as two plain aggregation queries so the verdict table itself is
oracle-checkable.

`table_profile` — one row per (table, column) over `orders`,
`documents`, `events`: row count, non-null count, exact distinct count,
and an order-independent md5-lane XOR fingerprint of the column's
canonical string form. Canonical forms follow the repo's cross-engine
conventions: integers/strings verbatim, doubles micro-quantized
(×1e6 → bigint, DECISIONS.md #12), timestamps as epoch micros
(`unix_micros` ↔ `epoch_us`), and `documents.text` through its md5
digest (profiling shuffles digests, not document bodies — the same
digest-keyed discipline as `dedup_exact_hash`).

Scale shape: each table is scanned ONCE into long (table, column,
canon) form via a single explode — no per-column jobs — and the union
feeds ONE aggregation. The only shuffle is the distinct-count expand,
which Catalyst plans as a partial aggregate on (table, column, canon)
before the final tables×columns-row reduce, so the wide first phase
distributes over the full cluster and nothing hot-spots on the
17-value group key. The xor lane reuses `corpus_checksum_by_source`'s
convention (audit.py), so profile fingerprints and corpus audit
checksums are comparable artifacts.

`constraint_checks` — the expectation suite: one row per declared
check (primary-key uniqueness, referential integrity, value-range,
domain-membership, derived-column consistency) with
(n_checked, n_violations, passed). Checks over the same table share
one scan (a single multi-aggregate pass emits all of that table's
verdicts); referential checks are LEFT joins against the DISTINCT
parent key followed by the same shared-scan aggregate, so the whole
suite costs one pass per fact table plus one keyed join per FK — the
minimum any engine pays. A NULL foreign key counts as a violation
(no parent row matches it); stated here because TPC-H data never
exercises it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_LANE = "cast(conv(substring(md5({c}), 1, 15), 16, 10) as bigint)"


def _canon_micro(col: str) -> Column:
    # doubles: micro-quantize ×1e6 → bigint (DECISIONS.md #12), then string
    return F.round(F.col(col) * 1_000_000).cast("long").cast("string")


def _canon_micros_ts(col: str) -> Column:
    # `orders.o_orderdate` arrives TIMESTAMP_NTZ from parquet; the cast to
    # session-zone timestamp is wall-clock preserving under the UTC session
    # zone (same adaptation load_table applies to events.ts).
    return F.unix_micros(F.col(col).cast("timestamp")).cast("string")


def _canon_str(col: str) -> Column:
    return F.col(col).cast("string")


# (table, column, canonicalizer) — the declared profile surface.
_PROFILE_COLUMNS: list[tuple[str, str, Callable[[str], Column]]] = [
    ("orders", "o_orderkey", _canon_str),
    ("orders", "o_custkey", _canon_str),
    ("orders", "o_orderstatus", _canon_str),
    ("orders", "o_totalprice", _canon_micro),
    ("orders", "o_orderdate", _canon_micros_ts),
    ("orders", "o_orderpriority", _canon_str),
    ("documents", "doc_id", _canon_str),
    ("documents", "text", lambda c: F.md5(F.col(c))),
    ("documents", "lang", _canon_str),
    ("documents", "source", _canon_str),
    ("documents", "n_chars", _canon_str),
    ("events", "event_id", _canon_str),
    ("events", "ts", _canon_micros_ts),
    ("events", "user_id", _canon_str),
    ("events", "event_type", _canon_str),
    ("events", "value", _canon_micro),
    ("events", "props", _canon_str),
]


def _long_form(df: DataFrame, table: str) -> DataFrame:
    """One scan → long (table_name, column_name, canon) rows."""
    kvs = [
        F.struct(
            F.lit(col).alias("column_name"),
            canon(col).alias("canon"),
        )
        for t, col, canon in _PROFILE_COLUMNS
        if t == table
    ]
    return df.select(F.explode(F.array(*kvs)).alias("kv")).select(
        F.lit(table).alias("table_name"), "kv.column_name", "kv.canon"
    )


def table_profile_df(
    orders: DataFrame, documents: DataFrame, events: DataFrame
) -> DataFrame:
    long = (
        _long_form(orders, "orders")
        .unionByName(_long_form(documents, "documents"))
        .unionByName(_long_form(events, "events"))
    )
    return long.groupBy("table_name", "column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("canon").alias("n_nonnull"),
        F.countDistinct("canon").alias("n_distinct"),
        F.expr(f"bit_xor({_LANE.format(c='canon')})").alias("xor_lane"),
    )


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile rows (module docstring): (table_name,
    column_name, n_rows, n_nonnull, n_distinct, xor_lane)."""
    return table_profile_df(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "events"),
    )


def _check_rows(agg_row: DataFrame, checks: list[tuple[str, str, str]]) -> DataFrame:
    """Explode a one-row multi-aggregate into (check_name, n_checked,
    n_violations, passed) rows — `checks` holds (name, checked_col,
    violations_col) referring to the agg row's columns."""
    kvs = [
        F.struct(
            F.lit(name).alias("check_name"),
            F.col(checked).cast("long").alias("n_checked"),
            F.col(viol).cast("long").alias("n_violations"),
        )
        for name, checked, viol in checks
    ]
    return (
        agg_row.select(F.explode(F.array(*kvs)).alias("kv"))
        .select("kv.*")
        .withColumn(
            # 0/1 bigint rather than boolean: verdict columns feed SUM/COUNT
            # rollups downstream, so they stay on the integer lane. (Booleans
            # themselves hash engine-agnostically — scd2_user_state.is_current
            # and semantic_decontaminate.contaminated are green precedents —
            # this is an arithmetic-convenience choice, not a hashing one.)
            "passed",
            (F.col("n_violations") == F.lit(0)).cast("long"),
        )
    )


def constraint_checks_df(
    orders: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    documents: DataFrame,
    events: DataFrame,
) -> DataFrame:
    one = F.count(F.lit(1))

    # orders scan: PK uniqueness surplus + status domain, one pass.
    orders_scan = orders.agg(
        one.alias("n_rows"),
        (one - F.countDistinct("o_orderkey")).alias("pk_viol"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P"),
                1,
            ).otherwise(0)
        ).alias("status_viol"),
    )
    # orders → customer FK: LEFT join the DISTINCT parent key, then the
    # same one-pass aggregate (n_checked and n_violations from one scan).
    cust_keys = customer.select("c_custkey").distinct().withColumn(
        "parent_hit", F.lit(1)
    )
    orders_fk = (
        orders.select("o_custkey")
        .join(cust_keys, orders["o_custkey"] == cust_keys["c_custkey"], "left")
        .agg(
            one.alias("n_rows"),
            F.sum(
                F.when(F.col("parent_hit").isNull(), 1).otherwise(0)
            ).alias("fk_viol"),
        )
    )
    # lineitem scan: quantity range + discount range, one pass.
    lineitem_scan = lineitem.agg(
        one.alias("n_rows"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        ).alias("qty_viol"),
        F.sum(
            F.when(
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 0.1),
                1,
            ).otherwise(0)
        ).alias("disc_viol"),
    )
    # lineitem → orders FK: the big-big referential check (keyed shuffle
    # join at scale — there is no cheaper exact form).
    order_keys = orders.select("o_orderkey").distinct().withColumn(
        "parent_hit", F.lit(1)
    )
    lineitem_fk = (
        lineitem.select("l_orderkey")
        .join(
            order_keys, lineitem["l_orderkey"] == order_keys["o_orderkey"], "left"
        )
        .agg(
            one.alias("n_rows"),
            F.sum(
                F.when(F.col("parent_hit").isNull(), 1).otherwise(0)
            ).alias("fk_viol"),
        )
    )
    # documents scan: PK surplus + n_chars derived-column consistency.
    docs_scan = documents.agg(
        one.alias("n_rows"),
        (one - F.countDistinct("doc_id")).alias("pk_viol"),
        F.sum(
            F.when(
                F.col("n_chars").isNull()
                | F.col("text").isNull()
                | (F.col("n_chars") != F.length("text")),
                1,
            ).otherwise(0)
        ).alias("nchars_viol"),
    )
    # events scan: value non-negativity (NULL value is not a violation —
    # absence is legal; negativity is not).
    events_scan = events.agg(
        one.alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNotNull() & (F.col("value") < 0), 1).otherwise(
                0
            )
        ).alias("neg_viol"),
    )

    return (
        _check_rows(
            orders_scan,
            [
                ("orders_pk_unique", "n_rows", "pk_viol"),
                ("orders_status_domain", "n_rows", "status_viol"),
            ],
        )
        .unionByName(
            _check_rows(orders_fk, [("orders_custkey_fk", "n_rows", "fk_viol")])
        )
        .unionByName(
            _check_rows(
                lineitem_scan,
                [
                    ("lineitem_qty_range", "n_rows", "qty_viol"),
                    ("lineitem_discount_range", "n_rows", "disc_viol"),
                ],
            )
        )
        .unionByName(
            _check_rows(
                lineitem_fk, [("lineitem_orderkey_fk", "n_rows", "fk_viol")]
            )
        )
        .unionByName(
            _check_rows(
                docs_scan,
                [
                    ("documents_pk_unique", "n_rows", "pk_viol"),
                    ("documents_nchars_consistent", "n_rows", "nchars_viol"),
                ],
            )
        )
        .unionByName(
            _check_rows(events_scan, [("events_value_nonnegative", "n_rows", "neg_viol")])
        )
    )


def constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite verdicts (module docstring): one row per check,
    (check_name, n_checked, n_violations, passed)."""
    return constraint_checks_df(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "events"),
    )


_PROFILE_ARM = """
    SELECT '{table}' AS table_name, '{column}' AS column_name,
           CAST(COUNT(1) AS BIGINT) AS n_rows,
           CAST(COUNT(canon) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_distinct,
           CAST(bit_xor(CAST('0x' || substring(md5(canon), 1, 15) AS BIGINT))
                AS BIGINT) AS xor_lane
    FROM (SELECT {canon} AS canon FROM {table})
"""

_ORACLE_CANON = {
    _canon_str: "CAST({c} AS VARCHAR)",
    _canon_micro: "CAST(CAST(ROUND({c} * 1000000) AS BIGINT) AS VARCHAR)",
    _canon_micros_ts: "CAST(epoch_us({c}) AS VARCHAR)",
}


def _profile_oracle() -> str:
    arms = []
    for table, col, canon in _PROFILE_COLUMNS:
        canon_sql = (
            "md5({c})" if col == "text" else _ORACLE_CANON[canon]
        ).format(c=col)
        arms.append(
            _PROFILE_ARM.format(table=table, column=col, canon=canon_sql)
        )
    return "\nUNION ALL\n".join(arms)


ORACLE_SQL: dict[str, str] = {
    "table_profile": _profile_oracle(),
    "constraint_checks": """
    WITH orders_scan AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(COUNT(1) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk_viol,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL
                              OR o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS status_viol
        FROM orders
    ), orders_fk AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS fk_viol
        FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey
    ), lineitem_scan AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL
                              OR l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty_viol,
               CAST(SUM(CASE WHEN l_discount IS NULL
                              OR l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc_viol
        FROM lineitem
    ), lineitem_fk AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS fk_viol
        FROM lineitem l
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON l.l_orderkey = o.o_orderkey
    ), docs_scan AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(COUNT(1) - COUNT(DISTINCT doc_id) AS BIGINT) AS pk_viol,
               CAST(SUM(CASE WHEN n_chars IS NULL OR text IS NULL
                              OR n_chars <> LENGTH(text)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nchars_viol
        FROM documents
    ), events_scan AS (
        SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN value IS NOT NULL AND value < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS neg_viol
        FROM events
    )
    SELECT 'orders_pk_unique' AS check_name, n_rows AS n_checked,
           pk_viol AS n_violations, CAST(pk_viol = 0 AS BIGINT) AS passed FROM orders_scan
    UNION ALL
    SELECT 'orders_status_domain', n_rows, status_viol, CAST(status_viol = 0 AS BIGINT)
    FROM orders_scan
    UNION ALL
    SELECT 'orders_custkey_fk', n_rows, fk_viol, CAST(fk_viol = 0 AS BIGINT) FROM orders_fk
    UNION ALL
    SELECT 'lineitem_qty_range', n_rows, qty_viol, CAST(qty_viol = 0 AS BIGINT)
    FROM lineitem_scan
    UNION ALL
    SELECT 'lineitem_discount_range', n_rows, disc_viol, CAST(disc_viol = 0 AS BIGINT)
    FROM lineitem_scan
    UNION ALL
    SELECT 'lineitem_orderkey_fk', n_rows, fk_viol, CAST(fk_viol = 0 AS BIGINT)
    FROM lineitem_fk
    UNION ALL
    SELECT 'documents_pk_unique', n_rows, pk_viol, CAST(pk_viol = 0 AS BIGINT) FROM docs_scan
    UNION ALL
    SELECT 'documents_nchars_consistent', n_rows, nchars_viol,
           CAST(nchars_viol = 0 AS BIGINT) FROM docs_scan
    UNION ALL
    SELECT 'events_value_nonnegative', n_rows, neg_viol, CAST(neg_viol = 0 AS BIGINT)
    FROM events_scan
""",
}
