"""Streaming twin of the silhouette cluster-QC scorer
(extensions/similarity.py) — score each incoming LABELED embedding
against the FROZEN base centroids as it lands: the online label-noise /
outlier gate (route negative-silhouette arrivals to review before they
enter the training corpus), the embedding-space sibling of the NB
language gate in `streaming/classify.py`.

The centroid table enters as a static frame ((clabel, pos, s, n) from
`silhouette_centroids_df`) — labels × dims rows, broadcast per
micro-batch. Same two-chained-windowed-aggregation shape as the NB twin:

1. per (window, vec, label, clabel): exact integer sum of squared
   micro-deviations (DECIMAL(38,0) state, one value per group);
2. per (window, vec, label): own-centroid distance + argmin over the
   other centroids via the ≤ labels bounded min(struct(d, clabel)) —
   the identical (d ASC, clabel ASC) tie-break the batch scorer ranks
   with, so batch and stream cannot disagree.

Deliberate divergence, inherent to frozen-model scoring: the base
centroids do NOT include the incoming point (the batch entry scores the
corpus against itself, so each point is inside its own centroid). For
vectors already IN the base corpus the arithmetic reduces to the batch
scorer's exactly — agreement pinned in tests/test_streaming_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extensions.similarity import (
    _quantized_dims,
    _sil_argmin_aggs,
    _sil_dist,
    _sil_projection,
    _sil_sq_dev_sum,
)


def silhouette_stream_against_base(
    stream: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    ts_col: str = "ts",
    window: str = "10 minutes",
    lateness: str = "1 hour",
) -> DataFrame:
    """One row per (event-time window, vec) in append mode:
    (window, vec_id, label, intra_dist, nearest_label, nearest_dist,
    silhouette) — the batch scorer's columns, against frozen centroids.
    The deviation sum, distance, argmin aggregates, and final projection
    are the batch scorer's OWN expression builders (`_sil_*`), so a
    change to the batch arithmetic or tie-break propagates here by
    construction."""
    wm = stream.withWatermark(ts_col, lateness)
    dims = _quantized_dims(wm, id_col, label_col, ts_col)
    per_pair = (
        dims.join(F.broadcast(centroids), "pos")
        .groupBy(
            F.window(ts_col, window).alias("window"),
            id_col,
            label_col,
            "clabel",
            "n",
        )
        .agg(_sil_sq_dev_sum())
        .select("window", id_col, label_col, "clabel", _sil_dist())
    )
    agg = per_pair.groupBy(
        F.window(F.window_time("window"), window).alias("window"),
        id_col,
        label_col,
    ).agg(*_sil_argmin_aggs(label_col))
    return agg.filter(F.col("nb").isNotNull()).select(
        "window", id_col, label_col, *_sil_projection()
    )


def semantic_decontam_stream(
    stream: DataFrame,
    probes: DataFrame,
    threshold: float | None = None,
) -> DataFrame:
    """Streaming twin of `extensions.similarity.semantic_decontaminate`:
    score arriving (vec_id, embedding) rows against the FROZEN probe
    matrix on arrival — the eval-leak gate a crawl ingest runs before a
    document's embedding ever enters the training corpus.

    The batch operator is a STATELESS map (broadcast probe matrix, one
    BLAS block per Arrow batch), so the twin IS the batch kernel applied
    to a streaming frame — `make_probe_kernel` returns the identical
    function both wrap, which is the strongest batch/stream agreement
    possible: not two implementations pinned equal, one implementation.
    No watermark, no state, append mode; each row is scored exactly once
    on arrival."""
    from ..extensions.similarity import (
        SEM_CONTAM_THRESHOLD,
        make_probe_kernel,
    )

    if threshold is None:
        threshold = SEM_CONTAM_THRESHOLD
    kernel = make_probe_kernel(probes, threshold)
    return stream.select("vec_id", "embedding").mapInPandas(
        kernel,
        "vec_id long, n_probe_hits long, top_probe long, "
        "top_cosine double, contaminated boolean",
    )
