"""Dynamic wide-events schema evolution across batches (SURVEY.md §4.2).

The wide `events` table's columns are data-dependent (pivot on observed
type_key). Across batches the key set drifts; the design decision is:
EAV `log_attributes` stays canonical, wide `events` is derived, and
multi-batch reads use parquet `mergeSchema` so early batches surface
later batches' columns as NULL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark import parse as P
from tests.fixtures import write_fixture_files


def _raw_txs_with_key(spark, tmp_path, name, extra_key):
    bdir, tdir, blocks, txs = write_fixture_files(str(tmp_path / name))
    raw = P.read_raw_txs(spark, tdir)
    return raw, txs


def test_wide_events_schema_drift_and_merge(spark, tmp_path):
    # batch 1: fixture keys as-is; batch 2: same txs plus a brand-new
    # attribute type_key that batch 1 never saw
    raw1, txs1 = _raw_txs_with_key(spark, tmp_path, "b1", None)
    wide1 = P.parse_events_wide(raw1)

    bdir2, tdir2, blocks2, txs2 = write_fixture_files(str(tmp_path / "b2"))
    raw2 = P.read_raw_txs(spark, tdir2)
    import base64

    def b64(s):
        return base64.b64encode(s.encode()).decode()

    # inject a new event type into every tx of batch 2 via the typed
    # events array (schema-compatible: same struct, new type string)
    raw2 = raw2.withColumn(
        "tx_result",
        F.col("tx_result").withField(
            "events",
            F.concat(
                F.col("tx_result.events"),
                F.array(
                    F.struct(
                        F.lit("airdrop").alias("type"),
                        F.array(
                            F.struct(
                                F.lit(b64("claimed")).alias("key"),
                                F.lit(b64("42")).alias("value"),
                                F.lit(True).alias("index"),
                            )
                        ).alias("attributes"),
                    )
                ),
            ),
        ),
    )
    wide2 = P.parse_events_wide(raw2)
    assert "airdrop_claimed" not in wide1.columns
    assert "airdrop_claimed" in wide2.columns

    # partitioned-append both batches, then a mergeSchema read unifies
    out = str(tmp_path / "events_wide")
    wide1.write.mode("append").parquet(out)
    wide2.write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "airdrop_claimed" in merged.columns
    # batch-1 rows surface the new column as NULL; batch-2 rows carry it
    # at occurrence 0 (one airdrop per tx — repeated other-type keys add
    # occurrence>0 rows where the new column is NULL, the pivot grain)
    n_rows = merged.count()
    assert n_rows == wide1.count() + wide2.count()
    n_txs2 = wide2.select("hash").distinct().count()
    assert merged.filter(F.col("airdrop_claimed") == "42").count() == n_txs2
    assert merged.filter(F.col("airdrop_claimed").isNull()).count() == n_rows - n_txs2

    # EAV canonical stays append-stable (fixed schema) — rebuilding wide
    # from the merged EAV equals the union of per-batch pivots
    eav = P.parse_log_attributes(raw1)
    assert set(eav.columns) == set(P.parse_log_attributes(raw2).columns)
