from __future__ import annotations

import os

import pytest

from bread_spark.session import get_spark

# Smallest sf by default for speed; BREAD_TEST_SF_DIR=/root/testdata/sf0.01
# reproduces the driver's correctness gate exactly.
SF_DIR = os.environ.get("BREAD_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bread-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
