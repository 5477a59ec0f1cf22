"""AQE on/off result parity (nightly): the default test tier runs with
adaptive execution DISABLED for speed (conftest rationale), while bench
and the driver run with it ON. AQE is semantics-preserving by contract;
this nightly pin proves that contract over representative catalog plan
shapes (scan+agg, broadcast join, window, pivot, mapInPandas kernel,
banded self-join, grouped-pandas packing) so the tiers can never drift
silently."""

from __future__ import annotations

import pytest

from bread_spark.queries import QUERIES
from tests.oracle_utils import driver_canon

# one entry per major plan shape
PARITY_ENTRIES = [
    "pricing_summary",  # scan + partial agg
    "revenue_by_segment",  # broadcast joins
    "cum_value_by_type",  # partitioned window
    "events_pivot_by_type",  # dynamic pivot
    "embedding_cosine_dups_tiled",  # mapInPandas tile kernel
    "lsh_bucket_pairs",  # banded self-join, grouped pandas
    "pack_sequences",  # applyInPandas per-bucket fold
    "nb_margin_auc",  # stripe-partitioned cumulative windows
    # ADVICE r13 #2: the pre-aggregate-then-CUBE re-associates the
    # double SUM for subtotal rows — the round(4)-boundary risk class;
    # pin that AQE's partition re-planning never moves the summation
    # tree across the boundary on real data.
    "value_cube_by_type_day",  # pre-agg + CUBE grouping sets
]


@pytest.mark.nightly  # the default tier runs AQE-off only; this is the guard
@pytest.mark.parametrize("name", PARITY_ENTRIES)
def test_aqe_on_off_results_identical(spark, sf_dir, name):
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = driver_canon(QUERIES[name](spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = driver_canon(QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert on == off, name
