"""Compute-once materialized intermediates shared across catalog entries.

Several catalog queries consume the same expensive intermediate frame —
the distinct word-shingle index (jaccard, decontamination), the LSH band
table (minhash candidates and every corpus built on them), the
paragraph-dedup rebuilt text (paragraph_dedup, curated_corpus), the
bigram-LM scored frame (scores + both perplexity-bucket forms). Run as a
catalog/bench pass, each consumer was re-executing the identical build —
the shingle index alone was built 4× per pass.

This is the materialized-intermediate pattern (dbt: a model downstream
models `ref()`; at 100 TB: a staging table each stage reads instead of
re-deriving). The cache contract:

- KEY = (Spark applicationId, seam name, realpath(sf_dir), *params).
  A new session, a different dataset, or a different parameterization
  always rebuilds — nothing persists across processes.
- VALUE = the exact DataFrame every consumer would have computed itself
  (equality stays pinned by each consumer's own oracle/tests), eagerly
  materialized via localCheckpoint so downstream plan sampling (e.g.
  repartitionByRange bound estimation) hits materialized partitions
  instead of re-executing the build. localCheckpoint (deserialized RDD
  blocks) over persist(MEMORY_AND_DISK): the columnar cache pays a
  decompression tax on every read — measured ~0.5 s/pass slower on the
  1M-row shingle index at sf0.1 — and the seam frames are read many
  times but never benefit from columnar pruning (consumers read every
  column). The blocks stay pinned while the cache holds the reference
  (ContextCleaner only frees them once the object is collected).
"""
from __future__ import annotations

import os
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
# One lock for the build-and-store section: concurrent consumers (the
# test suite's 4-way oracle differential; any future threaded driver)
# must never stampede the same seam into two parallel builds. Spark
# actions themselves are thread-safe; the lock only serializes SEAM
# materialization, which is a small minority of any pass's work.
# RLock, NOT Lock: seam builds nest (nb_lang_scores' build reads the
# nb_lang_model seam; curated_corpus_v2 chains several) — a plain Lock
# self-deadlocks on the same thread's nested materialized_frame call.
_LOCK = threading.RLock()


def materialized_frame(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    params: tuple = (),
) -> DataFrame:
    """Return the cached frame for (app, name, sf_dir, params), building,
    persisting and eagerly materializing it on first use."""
    key = (
        spark.sparkContext.applicationId,
        name,
        os.path.realpath(sf_dir),
        *params,
    )
    df = _CACHE.get(key)
    if df is None:
        with _LOCK:
            df = _CACHE.get(key)
            if df is None:
                df = build().localCheckpoint()  # eager: materializes here
                _CACHE[key] = df
    return df


# Driver-side value caches that live beside the frame seams (e.g. the
# BPE learned-merge lists): modules register theirs so ONE clear hook
# invalidates every seam-scoped cache together — a frame rebuilt after
# clearing must never pair with a stale sibling value.
_SIDE_CACHES: list[dict] = []


def register_side_cache(cache: dict) -> dict:
    """Register a module-level dict whose entries share the seam cache's
    key contract (applicationId + inputs); it will be emptied by
    `clear_materialized_frames`. Returns the dict for inline use."""
    _SIDE_CACHES.append(cache)
    return cache


def clear_materialized_frames() -> None:
    """Drop every cached seam frame AND registered side cache (test
    isolation hook). The checkpoint blocks are freed by the
    ContextCleaner once the references go."""
    _CACHE.clear()
    for c in _SIDE_CACHES:
        c.clear()
