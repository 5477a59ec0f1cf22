"""Resolved-source cache semantics: immutable testdata dirs are cached,
mutable paths are not (a cached DataFrame pins its file listing at
analysis time — serving it for a rewritten path would read stale files)."""

from __future__ import annotations

import os

from bread_spark.io import load_table
from tests.conftest import SF_DIR


def test_testdata_sources_are_cached(spark):
    a = load_table(spark, SF_DIR, "lineitem")
    b = load_table(spark, SF_DIR, "lineitem")
    assert a is b


def test_mutable_paths_are_not_cached(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(3).write.parquet(os.path.join(p, "x.parquet"))
    a = load_table(spark, p, "x")
    assert a.count() == 3
    # rewrite with different contents — a fresh load must see them
    spark.range(7).write.mode("overwrite").parquet(os.path.join(p, "x.parquet"))
    b = load_table(spark, p, "x")
    assert a is not b
    assert b.count() == 7


def test_events_nanos_handling_survives_cache(spark):
    df1 = load_table(spark, SF_DIR, "events")
    df2 = load_table(spark, SF_DIR, "events")
    assert df1 is df2
    assert dict(df1.dtypes)["ts"] == "timestamp"
