from __future__ import annotations

import os

import pytest

from bread_spark.session import get_spark

# Smallest sf by default for speed; BREAD_TEST_SF_DIR=/root/testdata/sf0.01
# reproduces the driver's correctness gate exactly.
SF_DIR = os.environ.get("BREAD_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two test tiers (r9, VERDICT r8 #2): the DEFAULT tier must stay under
# 600 s on 32 cores; the slowest streaming checkpoint-restart twins
# (their cost is real micro-batch/watermark WAITS, not computation)
# carry @pytest.mark.nightly and are skipped by default. A full
# certification pass runs them all: BREAD_TEST_NIGHTLY=1 python -m
# pytest tests/  (or -m nightly for the nightly tier alone). Every
# nightly-marked test still guards a pin that the default tier covers
# at lower depth (each twin keeps a default-tier agreement test; only
# the restart / multi-batch variants move to nightly).
NIGHTLY = os.environ.get("BREAD_TEST_NIGHTLY", "") not in ("", "0")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "nightly: slow streaming restart/multi-batch pins — default tier "
        "skips these; run with BREAD_TEST_NIGHTLY=1 (or -m nightly)",
    )


def pytest_collection_modifyitems(config, items):
    # Only an explicit nightly selection bypasses the auto-skip: an
    # unrelated -m expression (e.g. -m 'not foo') must NOT silently pull
    # the slow restart/multi-batch pins into a default-tier run.
    if NIGHTLY or "nightly" in config.getoption("markexpr", default=""):
        return
    skip = pytest.mark.skip(
        reason="nightly tier (BREAD_TEST_NIGHTLY=1 to run)"
    )
    for item in items:
        if "nightly" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # local[8], not local[32], for the DEFAULT tier (r10): at sf0.001
    # the per-stage task-scheduling overhead of 32 task slots swamps any
    # parallel gain — measured on this host: test_models_stats 66.5 s at
    # 32 / 48.6 at 16 / 30.8 at 8, and even the deliberately parallel
    # brute-force fuzzy + recall files are FASTER at 8 (61 vs 71 s).
    # bench.py and the driver keep local[$SPARK_GRAFT_CPUS]=32 (the
    # production-shaped path); nothing in the suite asserts parallelism
    # beyond >= 2 partitions, and shuffle_partitions stays 8 either way.
    # Hermetic to the SPARK_GRAFT_PREFER_SMJ A/B knob (ADVICE r13 #4):
    # plan pins assert SortMergeJoin shapes, so a stray env var flipping
    # the planner preference would silently change tested plan shapes.
    os.environ.pop("SPARK_GRAFT_PREFER_SMJ", None)
    spark = get_spark(
        app_name="bread-spark-tests", master="local[8]", shuffle_partitions=8
    )
    assert spark.conf.get("spark.sql.join.preferSortMergeJoin") == "true"
    # AQE OFF for the default test tier (r9): adaptive execution
    # finalizes stages one at a time and re-optimizes between them —
    # measured +0.08 s per tiny query (0.134 → 0.215 s on a two-agg
    # events query at sf0.001), which across the suite's ~2k actions is
    # >100 s of pure overhead with zero benefit at test scale. AQE is
    # semantics-preserving, bench.py and the driver keep it ON (the
    # production path), and the nightly tier pins AQE-on/off result
    # parity over representative plan shapes (test_aqe_parity.py) so
    # the divergence stays guarded.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# The whole-catalog catalog_frames/catalog_plans session fixtures are
# GONE as of r13: after the oracle sweep was segmented (oracle_segments
# .py builds each quarter's frames in its own file/shard), test_plans.py
# was the only consumer left and the eager 264-frame build made it the
# tier's tallest file. Plan pins now use test_plans.py's LAZY per-name
# fixture; the whole-catalog no-cartesian sweep rides the segment files
# (frames in hand from the differential) with registry tiling accounted
# in test_plans.py::test_registry_partition_accounting.
