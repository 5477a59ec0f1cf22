"""Table catalog over the driver's parquet dirs + partitioned writes.

Mirrors the reference's source layer (SURVEY.md §2.1 SRC13/SRC12): DuckDB
glob scans become ``spark.read.parquet`` (partition discovery + pushdown are
free), the pyarrow ``partition_cols=['year','month','day']`` sink becomes
``df.write.partitionBy(...)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any scale.
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet scan → column pruning and filter
    pushdown happen automatically once the caller selects/filters.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's reader rejects
    (TimestampType is µs — the ns divergence documented in SURVEY.md §1.3).
    We read it as long nanos (legacy conf) and floor-divide to µs, matching
    DuckDB's ns→µs truncation so oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (Spark SQL surface —
    the analog of the reference's dbt sources)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Bucketed managed table: co-locates join/agg keys at write time so
    repeated joins on `key` skip the shuffle entirely (the Exchange-free
    plan is asserted in tests/test_bucketing.py).

    The 100 TB pattern: bucket the big fact tables on their join key once
    at ingest; every downstream join/aggregation on that key becomes a
    zero-shuffle local operation. Bucket count should be sized so one
    bucket ≈ one task's worth of data (hundreds of MB)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("year", "month", "day"), mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet sink (reference parse.py:182-200 analog).

    At 100 TB the year/month/day layout gives partition pruning on every
    time-ranged query; within a partition, files are sized by Spark's
    128 MB target so scans parallelize across executors.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
