"""Oracle differential, segment 2 of 4 (alphabetical quarter — see
tests/oracle_segments.py for the r13 split rationale)."""

from __future__ import annotations

import pytest

from tests.oracle_segments import run_segment, segment

NAMES = segment(1)


@pytest.fixture(scope="module")
def seg_results(spark, sf_dir):
    return run_segment(spark, sf_dir, NAMES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(seg_results, name):
    ok, msg = seg_results[name]
    assert ok, f"{name}: {msg}"
