"""Streaming twin of the source-similarity cartography — the
per-source component-sum table (the matrix's entire sufficient
statistic) maintained online.

Same discipline as `nb_model_count_stream` and the collocation count
streams: the exact integer sums + counts fold as ONE grouped
streaming aggregation in complete mode; a snapshot fed through the
BATCH pairwise scorer (`similarity_matrix_df`) IS the batch matrix
over everything seen — one scoring implementation. Pinned including
a checkpoint fold in tests/test_streaming_source_sim.py."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.source_sim import source_sums_df


def source_sums_stream(stream: DataFrame) -> DataFrame:
    """Running (source, pos, s, n) over a (source, embedding) stream —
    the identical fold expression as the batch `source_sums_df`."""
    return source_sums_df(stream)
