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
    spark = get_spark(
        app_name="bread-spark-tests", master="local[8]", shuffle_partitions=8
    )
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


@pytest.fixture(scope="session")
def catalog_frames(spark, sf_dir):
    """Every catalog entry's DataFrame, constructed ONCE per session
    (r10: catalog_plans and the oracle differential each rebuilt all
    252 frames — construction executes the seam builds and the
    bounded scalar collects, so paying it twice was the suite's
    biggest avoidable block). DataFrames are immutable plan handles;
    sharing them across the oracle pool's threads is safe."""
    from bread_spark.queries import QUERIES

    return {name: fn(spark, sf_dir) for name, fn in QUERIES.items()}


@pytest.fixture(scope="session")
def catalog_plans(catalog_frames):
    """Physical-plan text of EVERY catalog entry, compiled ONCE per
    session (VERDICT r8 #2: the whole-catalog cartesian sweep and the
    per-entry plan pins used to each rebuild their frames — at 183
    entries that is the O(catalog) cost worth paying exactly once).
    Building a frame also primes its materialized seams, so later
    correctness tests reuse them."""
    return {
        name: df._jdf.queryExecution().executedPlan().toString()
        for name, df in catalog_frames.items()
    }
