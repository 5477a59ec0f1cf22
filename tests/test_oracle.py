"""Driver-protocol pins + the rows-only half of the correctness gate.
The oracle differential itself lives in test_oracle_q1..q4.py (r13,
VERDICT r12 #3: the monolithic parameterized sweep was the tier's wall
floor — see tests/oracle_segments.py for the split)."""

from __future__ import annotations

import pytest

from bread_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import duckdb_con
from tests.conftest import SF_DIR

ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    # rows-only contract: runs, stable schema, ≥0 rows
    assert df.columns
    assert df.count() >= 0


def test_driver_protocol_distinguishes_float_from_int():
    """r5 regression class: DuckDB HUGEINT/DECIMAL materializes as float64,
    so an uncast oracle SUM renders `4950.0` against Spark's `4950` — the
    canon must treat those as different even though the typed values agree."""
    import pandas as pd

    from tests.oracle_utils import driver_canon

    assert driver_canon(pd.DataFrame({"x": [4950]})) != driver_canon(
        pd.DataFrame({"x": [4950.0]})
    )


def test_driver_protocol_errs_on_array_cells():
    """r5 regression class: array-typed result columns break the driver's
    row sort (pandas factorize: unhashable type) — the canon must raise, not
    silently pass, so array-shaped catalog outputs get caught locally."""
    import numpy as np
    import pandas as pd

    from tests.oracle_utils import driver_canon

    pdf = pd.DataFrame({"a": [np.array([1]), np.array([2])], "b": [2, 1]})
    with pytest.raises(TypeError):
        driver_canon(pdf)


def test_driver_protocol_end_to_end_hugeint(spark, con):
    """An uncast SUM(BIGINT) oracle must fail `compare` against an int64
    Spark result; the CAST(... AS BIGINT) form must pass."""
    from tests.oracle_utils import compare

    sdf = spark.createDataFrame([(4950,)], "cum: long")
    ok, msg = compare(sdf, con, "SELECT SUM(x) AS cum FROM (SELECT CAST(4950 AS BIGINT) AS x)")
    assert not ok and "differ" in msg
    ok, _ = compare(
        sdf, con, "SELECT CAST(SUM(x) AS BIGINT) AS cum FROM (SELECT CAST(4950 AS BIGINT) AS x)"
    )
    assert ok


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL estimate must land within ~3x the configured rsd of exact."""
    from pyspark.sql import functions as F

    from bread_spark.io import load_table
    from bread_spark.models import approx_distinct_users_per_day

    approx = {r["day"]: r["approx_users"] for r in approx_distinct_users_per_day(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["day"]: r["n"]
        for r in ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.06 * n), (day, approx[day], n)
