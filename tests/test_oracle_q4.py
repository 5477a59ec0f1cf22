"""Oracle differential, segment 4 of 4 (alphabetical quarter — see
tests/oracle_segments.py for the r13 split rationale)."""

from __future__ import annotations

import pytest

from tests.oracle_segments import run_segment, segment

NAMES = segment(3)


@pytest.fixture(scope="module")
def seg_results(spark, sf_dir):
    return run_segment(spark, sf_dir, NAMES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(seg_results, name):
    ok, msg = seg_results[0][name]
    assert ok, f"{name}: {msg}"


def test_segment_no_cartesian(seg_results):
    """The whole-catalog no-cartesian sweep, segment slice (r13): the
    frames are built here anyway, so the plan-shape safety net reads
    their compiled texts instead of paying a second whole-catalog build
    in test_plans.py. Registry tiling is accounted in
    test_plans.py::test_registry_partition_accounting."""
    for name, p in seg_results[1].items():
        assert "CartesianProduct" not in p, name
