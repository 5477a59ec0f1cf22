"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — schema, partitioning, UDF
signature, batch shapes; the codec step is a deterministic fake behind
``set_decoder`` (image/audio libraries aren't in this container — a real
deployment plugs Pillow/torchaudio into the same seam).

Scale notes:
- binary payloads ride the columnar scan; `maxPartitionBytes` keeps
  partitions bounded regardless of blob sizes, and mapInPandas streams
  Arrow record batches so a partition never has to fit in pandas at once.
- decode is embarrassingly parallel — zero shuffles end-to-end; metadata
  extraction keeps payload bytes out of any shuffle by projecting early.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, mime string"

FEATURE_SCHEMA = (
    "media_id long, kind string, byte_len long, content_sha256 string, "
    "width int, height int, n_frames int"
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height, frames)
    from a digest of the payload. Replace via set_decoder(real_fn)."""
    d = hashlib.sha256(payload).digest()
    w, h, f = struct.unpack("<HHH", d[:6])
    return (w % 1920 + 1, h % 1080 + 1, (f % 300 + 1) if kind == "video" else 1)


_DECODER: Callable[[bytes, str], tuple[int, int, int]] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], tuple[int, int, int]]) -> None:
    """Plug a real codec (e.g. PIL-based). Must be picklable for executors."""
    global _DECODER
    _DECODER = fn


def extract_media_features(media: DataFrame) -> DataFrame:
    """binary column → typed feature rows via mapInPandas.

    Batches arrive as Arrow-backed pandas frames; output preserves 1 row
    per input row (a pure map — Catalyst can pipeline it with the scan).
    """
    decoder = _DECODER

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index, done
    with a JVM-side sequence+explode over the (already-extracted) frame
    count — the expensive decode only ever touches sampled frames in a
    real codec. Demonstrates the explode-not-loop shape for media."""
    feats = extract_media_features(media)
    return feats.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})")).alias("frame_idx"),
    )


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact binary dedup via content digest — the 100 TB pattern: shuffle
    32-byte digests, never payloads."""
    feats = extract_media_features(media)
    return feats.groupBy("content_sha256").agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.first("byte_len").alias("byte_len"),
    )
