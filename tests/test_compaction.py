"""Compaction: many small files → few per partition, data intact,
crash-safe swap, optional sort clustering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bread_spark.io import compact_partitioned


def _parquet_files(path):
    return [
        os.path.join(r, f)
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]


@pytest.fixture()
def fragmented(spark, tmp_path):
    """Simulate incremental appends: 6 micro-batches × 4 tasks of small
    files into 3 day-partitions."""
    path = str(tmp_path / "tbl")
    for batch in range(6):
        df = spark.range(batch * 100, (batch + 1) * 100).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("day"),
            (F.col("id") * 2).alias("v"),
        )
        df.repartition(4).write.mode("append").partitionBy("day").parquet(path)
    return path


def test_compaction_reduces_files_keeps_rows(spark, fragmented):
    before_files = len(_parquet_files(fragmented))
    before = spark.read.parquet(fragmented)
    before_rows = sorted(map(tuple, before.select("id", "day", "v").collect()))
    assert before_files > 20  # genuinely fragmented

    n_files = compact_partitioned(spark, fragmented, partition_cols=("day",))
    assert n_files == 3  # one file per day-partition
    assert len(_parquet_files(fragmented)) == n_files
    after = sorted(
        map(tuple, spark.read.parquet(fragmented).select("id", "day", "v").collect())
    )
    assert after == before_rows
    # no staging/backup leftovers
    parent = os.path.dirname(fragmented)
    assert not any("compact" in d for d in os.listdir(parent))


def test_compaction_multiple_files_and_sort(spark, fragmented):
    n_files = compact_partitioned(
        spark, fragmented, partition_cols=("day",), files_per_partition=2, sort_by="id"
    )
    assert 3 < n_files <= 6  # up to 2 per partition
    # rows inside each file are clustered by id (row-group pruning aid)
    for f in _parquet_files(fragmented):
        ids = [r["id"] for r in spark.read.parquet(f).select("id").collect()]
        assert ids == sorted(ids)
