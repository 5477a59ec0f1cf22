"""Batch/stream agreement for the silhouette scorer twin
(streaming/similarity.py): streamed base vectors must reproduce the
batch entry's rows exactly — the distances are exact-operand doubles on
both paths and the argmin tie-break is shared. Includes a checkpoint
restart via the second availableNow run."""

from __future__ import annotations

import datetime
import json
import os

import pyspark.sql.functions as F

from bread_spark.extensions.similarity import (
    silhouette_centroids_df,
    silhouette_scores,
)
from bread_spark.io import load_table
from bread_spark.streaming.similarity import silhouette_stream_against_base
from tests.conftest import SF_DIR


def test_silhouette_stream_agrees_with_batch(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    cent = silhouette_centroids_df(emb).localCheckpoint()
    batch = {r["vec_id"]: r for r in silhouette_scores(spark, SF_DIR).limit(6).collect()}
    vecs = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id").isin(list(batch))).collect()
    }

    ts = datetime.datetime(2024, 8, 1, 12, 0).isoformat()
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for vec_id, (label, v) in vecs.items():
            f.write(
                json.dumps(
                    {"vec_id": vec_id, "ts": ts, "label": label, "embedding": v}
                )
                + "\n"
            )

    def _run():
        stream = spark.readStream.schema(
            "vec_id long, ts timestamp, label int, embedding array<float>"
        ).json(src)
        q = (
            silhouette_stream_against_base(stream, cent)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "vec_id": 999_999,
                    "ts": datetime.datetime(2024, 8, 2, 12, 0).isoformat(),
                    "label": 0,
                    "embedding": [0.0] * 64,
                }
            )
            + "\n"
        )
    _run()

    got = {
        r["vec_id"]: (
            r["label"],
            r["intra_dist"],
            r["nearest_label"],
            r["nearest_dist"],
            r["silhouette"],
        )
        for r in spark.read.parquet(sink).collect()
        if r["vec_id"] in batch
    }
    assert set(got) == set(batch)
    for vec_id, r in batch.items():
        assert got[vec_id] == (
            r["label"],
            r["intra_dist"],
            r["nearest_label"],
            r["nearest_dist"],
            r["silhouette"],
        ), vec_id


def test_semantic_decontam_stream_is_the_batch_kernel(spark, tmp_path):
    """The twin wraps the SAME kernel function as the batch operator —
    streamed verdicts over arriving vectors must equal the batch frame
    row for row (availableNow over a json file source)."""
    import json
    import os

    from bread_spark.extensions.similarity import semantic_decontam_df
    from bread_spark.io import load_table
    from bread_spark.streaming.similarity import semantic_decontam_stream
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    probes = emb.filter("vec_id < 20").localCheckpoint()
    sample = emb.filter("vec_id >= 20").limit(40).collect()

    src, ckpt, sink = (str(tmp_path / x) for x in ("src", "ck", "sink"))
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in sample:
            f.write(
                json.dumps(
                    {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
                )
                + "\n"
            )
    stream = spark.readStream.schema("vec_id long, embedding array<float>").json(src)
    q = (
        semantic_decontam_stream(stream, probes)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    batch_in = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in sample],
        "vec_id long, embedding array<float>",
    )
    want = sorted(map(tuple, semantic_decontam_df(batch_in, probes).collect()))
    assert got == want and len(got) == 40
