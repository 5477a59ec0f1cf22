"""SparkSession factory tuned for the target deployment.

Local testing runs on ``local[N]`` but every setting here is chosen for a
multi-executor cluster reading ~100 TB:

- AQE on (runtime re-plan: broadcast conversion, skew-join splitting,
  partition coalescing) so plans written at sf0.01 survive 1000x scale-up.
- Shuffle partitions sized by env; at cluster scale this should be
  ~2-3x total cores (AQE coalesces small ones back down).
- Arrow enabled so the few Pandas-UDF operators (multimodal decode,
  custom stateful ops) move columnar batches, never rows.
- Parquet pushdown/pruning left at defaults (on) — models are written so
  filters and projections reach the scan (verified in tests via explain).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bread-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # coalescePartitions.parallelismFirst stays at its default (true):
        # measured locally, size-first coalescing starved the shingle
        # self-join of parallelism (+2.3s) for ~0.1s saved on tiny shuffles.
        # On a production cluster with large shuffles, revisit per job.
        # r13 experiment knob (guide §3.1): allow the planner to pick
        # shuffled-hash over sort-merge when its size conditions hold.
        # Default stays Spark's (prefer SMJ) — flip via env for A/B.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # files.maxPartitionBytes default 128MB is right for the target;
        # local test parquet is tiny so it makes one partition per file.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_bench(spark: SparkSession) -> None:
    """Runtime conf that is safe to set on an externally-owned session."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
