"""Streaming deduplication — the stream-shaped member of the dedup
family (extensions/dedup.py covers the batch strategies).

Two built-in state-bounded mechanisms:

- `dedup_stream_exact`: `dropDuplicatesWithinWatermark(keys)` — drops any
  row whose key was already seen within the watermark horizon. State is
  evicted once the watermark passes, so memory is O(keys per horizon),
  not O(stream history). The right tool for at-least-once sources
  (RPC re-fetch, landing-zone re-delivery) where duplicates arrive close
  together in event time.
- `dedup_stream_by_digest`: same, keyed on a content digest instead of an
  identity column — the streaming analog of `dedup_exact_hash` (dedupe by
  payload, shuffle 32-byte digests).

For exact global dedup across all history, the batch strategies apply at
compaction time; the streaming pass bounds duplicate *bursts* online.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON = "1 hour"


def dedup_stream_exact(
    events: DataFrame, keys: list[str], ts_col: str = "ts", horizon: str = DEFAULT_HORIZON
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon."""
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(keys)


def dedup_stream_by_digest(
    events: DataFrame,
    payload_col: str,
    ts_col: str = "ts",
    horizon: str = DEFAULT_HORIZON,
) -> DataFrame:
    """Content-keyed streaming dedup: digest the payload, dedupe on the
    digest — state holds 32-byte keys regardless of payload size."""
    with_digest = events.withColumn("__digest", F.sha2(F.col(payload_col).cast("binary"), 256))
    return (
        with_digest.withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )


def dedup_stream_against_base(
    stream: DataFrame, base: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """The streaming twin of `extensions.dedup.cross_dedup`: drop any
    incoming row whose content digest already exists in a STATIC base
    corpus — a stream-static LEFT ANTI join, which Spark executes by
    re-resolving only the static side per micro-batch (no streaming
    state at all, unlike the within-watermark variants above).

    `base` must be a static frame with a `text` column (the already-
    ingested corpus). At 100 TB the base is its bucketed digest table,
    so each micro-batch's anti join co-partitions against it without
    rescanning raw text. Combine with `dedup_stream_by_digest` upstream
    to also bound duplicate bursts WITHIN the stream — this operator
    only gates against history.
    """
    base_h = base.select(
        F.md5(F.col("text").cast("binary")).alias("__digest")
    ).distinct()
    with_digest = stream.withColumn(
        "__digest", F.md5(F.col(payload_col).cast("binary"))
    )
    return with_digest.join(base_h, "__digest", "left_anti").drop("__digest")


def base_span_table(base: DataFrame, text_col: str = "text") -> DataFrame:
    """The distinct w-token span digests of a static corpus — the frame
    `span_gate_stream_against_base` joins every micro-batch against.
    Build it ONCE per stream (and `localCheckpoint(eager=True)` or stage
    it as a bucketed table keyed on `span`) and pass it via `base_spans`;
    otherwise Spark re-resolves the static side per micro-batch and this
    explode+distinct re-runs over the whole base corpus each batch."""
    from ..extensions.dedup import SPAN_W, span_array

    return (
        base.select(
            F.expr(f"filter(split({text_col}, ' '), t -> t != '')").alias(
                "__base_toks"
            )
        )
        .select(F.explode(span_array("__base_toks", SPAN_W)).alias("span"))
        .distinct()
    )


def span_gate_stream_against_base(
    stream: DataFrame,
    base: DataFrame | None = None,
    payload_col: str = "payload",
    id_col: str = "event_id",
    ts_col: str = "ts",
    window: str = "10 minutes",
    lateness: str = DEFAULT_HORIZON,
    base_spans: DataFrame | None = None,
    base_text_col: str = "text",
) -> DataFrame:
    """The streaming twin of `extensions.dedup.cross_dedup_spans`: score
    each incoming document's token windows against the STATIC base
    corpus's distinct-span table and emit a per-document coverage verdict
    — the online form of the refresh-crawl span gate (catches "new" pages
    that are mostly recycled old content, which the exact-digest gate
    above misses).

    Plan: the span array is built map-side per row (`span_array`), then
    exploded into a stream-static LEFT join against the base span digests.
    Spark re-resolves the static side per micro-batch, so for anything
    long-running pass `base_spans` — `base_span_table(base)` staged once
    (localCheckpoint, or at 100 TB a bucketed table keyed on the digest so
    the join co-partitions without rescan); the raw-`base` form here
    re-runs the explode+distinct per batch and is for tests/small bases.
    The per-document hit count is a watermarked tumbling-
    window aggregation keyed on (window, doc), so state evicts once event
    time passes — O(docs per horizon), not O(stream history). Verdicts
    emit in append mode when their window finalizes. Same integer-exact
    keep rule as the batch gate. Documents shorter than the span width
    have nothing to match and pass through un-scored (gate them upstream
    if zero-window docs need rows here).
    """
    from ..extensions.dedup import SPAN_W, span_array, span_keep_expr

    if base_spans is None:
        if base is None:
            raise ValueError("pass either `base` (raw corpus) or `base_spans`")
        base_spans = base_span_table(base, base_text_col)
    hits = base_spans.select("span").withColumn("__hit", F.lit(1))
    exploded = (
        stream.withColumn(
            "__toks", F.expr(f"filter(split({payload_col}, ' '), t -> t != '')")
        )
        .withColumn("__wins", span_array("__toks", SPAN_W))
        .filter(F.size("__wins") > 0)
        .select(id_col, ts_col, F.explode("__wins").alias("span"))
    )
    scored = (
        exploded.join(hits, "span", "left")
        .withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_base_windows"),
        )
    )
    return scored.select(
        F.col("win").getField("start").alias("window_start"),
        id_col,
        "n_windows",
        "n_base_windows",
        F.round(
            F.col("n_base_windows") / F.col("n_windows").cast("double"), 4
        ).alias("base_frac"),
        span_keep_expr(F.col("n_base_windows"), F.col("n_windows")).alias("keep"),
    )


def base_dup_shingle_table(base: DataFrame, text_col: str = "text") -> DataFrame:
    """The base corpus's DUPLICATED word-3-gram shingles (df ≥
    `DUP_SATURATION_MIN_DF`) — the static side of the streaming
    memorization-risk gate. Same staging contract as `base_span_table`:
    build once, localCheckpoint (or stage bucketed on `shingle` at
    100 TB); the raw-`base` form re-runs the explode+aggregate per
    micro-batch and is for tests/small bases. Incremental maintenance
    is the df-table discipline from `doc_dup_saturation`: append new
    docs' shingles, increment df, re-emit rows crossing the threshold."""
    from ..extensions.dedup import DUP_SATURATION_MIN_DF, _word_shingles

    sh = _word_shingles(base.select("doc_id", F.col(text_col).alias("text")))
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= DUP_SATURATION_MIN_DF)
        .select("shingle")
    )


def dup_saturation_stream_against_base(
    stream: DataFrame,
    base: DataFrame | None = None,
    payload_col: str = "payload",
    id_col: str = "event_id",
    ts_col: str = "ts",
    window: str = "10 minutes",
    lateness: str = DEFAULT_HORIZON,
    base_dup_shingles: DataFrame | None = None,
) -> DataFrame:
    """The streaming twin of `extensions.dedup.doc_dup_saturation`:
    score each incoming document's distinct word-3-gram shingles
    against the STATIC base corpus's duplicated-shingle set and emit a
    per-document saturation verdict — the online form of the
    memorization-risk profile (an ingest dashboard asking "how much of
    this 'new' content is text the corpus already repeats?").

    Plan: the shingle array is built map-side per row (the same
    xxhash64 trigram identity as the batch seam, `array_distinct` for
    the batch's per-doc distinct), then exploded into a stream-static
    LEFT join against the duplicated-shingle table; the per-document
    counts are a watermarked tumbling-window aggregation keyed on
    (window, doc) — state evicts once event time passes, O(docs per
    horizon). Documents shorter than 3 tokens have no shingles and are
    EXCLUDED from the scored output (the size filter runs before the
    shingle projection — under ANSI, sequence(0, negative) would
    otherwise throw; the batch `_word_shingles` filters first too)."""
    if base_dup_shingles is None:
        if base is None:
            raise ValueError("pass either `base` (raw corpus) or `base_dup_shingles`")
        base_dup_shingles = base_dup_shingle_table(base)
    hits = base_dup_shingles.select("shingle").withColumn("__hit", F.lit(1))
    exploded = (
        stream.withColumn("__toks", F.split(payload_col, " "))
        .filter(F.size("__toks") >= 3)
        .withColumn(
            "__sh",
            F.expr(
                # get() (NULL out-of-bounds) instead of __toks[i]: the
                # size>=3 filter above is NOT enough under ANSI — the
                # optimizer's InferFiltersFromGenerate predicate
                # (size(__sh)>0) is evaluated through codegen
                # subexpression elimination BEFORE the AND can
                # short-circuit, so the transform must be total. Valid
                # rows hash identical values either way (same seam
                # identity as the batch _word_shingles).
                "array_distinct(transform(sequence(0, size(__toks) - 3), "
                "i -> xxhash64(get(__toks, i), get(__toks, i+1), get(__toks, i+2))))"
            ),
        )
        .select(id_col, ts_col, F.explode("__sh").alias("shingle"))
    )
    scored = (
        exploded.join(hits, "shingle", "left")
        .withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_dup_shingles"),
        )
    )
    return scored.select(
        F.col("win").getField("start").alias("window_start"),
        id_col,
        "n_shingles",
        "n_dup_shingles",
        F.round(
            F.col("n_dup_shingles") / F.col("n_shingles").cast("double"), 4
        ).alias("dup_frac"),
    )


def base_fuzzy_tables(base: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The static side of the fuzzy gate: (selected-gram index, norm
    texts) of the base corpus. Build ONCE per stream and
    `localCheckpoint(eager=True)` both (or stage them as tables keyed
    on gram / doc_id at 100 TB); otherwise Spark re-resolves the static
    side per micro-batch and replays the md5 explode + rank over the
    whole base corpus each batch. min_df=1: a base doc whose twin
    arrives only on the stream has df=1 on its distinguishing grams
    within the base (see `_selected_grams`)."""
    from ..extensions.fuzzy import _norm_docs, _selected_grams

    norm = _norm_docs(base)
    return _selected_grams(norm, min_df=1), norm


def fuzzy_gate_stream_against_base(
    stream: DataFrame,
    base: DataFrame | None = None,
    payload_col: str = "payload",
    id_col: str = "event_id",
    ts_col: str = "ts",
    window: str = "10 minutes",
    lateness: str = DEFAULT_HORIZON,
    base_tables: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The streaming twin of `extensions.fuzzy.fuzzy_matches_df`: match
    each incoming document against the STATIC base corpus by bounded
    edit distance — the refresh-crawl gate for typo-mutated recycled
    content, which the exact-digest gate (`dedup_stream_against_base`)
    and the span gate both miss.

    Plan: the arriving payload's distinct gram set is built in-row
    (`gram_array_expr` — the SAME expression the batch probe uses, so
    batch and stream hash identically; in-row `array_distinct` means no
    stateful streaming distinct), exploded into a stream-static join
    against the base's selected-gram postings. Two chained windowed
    aggregations (the `nb_score_stream_against_base` shape):

    1. per (window, event, base_doc): shared-gram count, with the
       normalized payload riding via `first` (constant per event);
       candidates below `FUZZY_MIN_SHARED` drop here — state is one
       count + one string per candidate pair, and only docs sharing
       selected grams ever create state;
    2. verify + per (window, event): join the static base texts, the
       length-difference prefilter, one thresholded `levenshtein`, then
       the nearest match via lexicographic MIN of (dist, base_doc) —
       the batch tie-break, so batch and stream can never disagree.

    Emits (window, event_id, matched_doc, dist, n_candidates) in append
    mode once the watermark passes — one row per arriving doc that HAS
    a fuzzy match (a clean doc emits nothing; gate by anti-joining the
    verdicts downstream). Agreement with the batch matcher, including a
    checkpoint restart, is pinned in tests/test_streaming_dedup.py."""
    from ..extensions.fuzzy import (
        FUZZY_MAX_DIST,
        FUZZY_MIN_SHARED,
        FUZZY_Q,
        byte_faithful,
        gram_array_expr,
        normalize_text_expr,
    )

    if base_tables is None:
        if base is None:
            raise ValueError("pass base or base_tables")
        base_tables = base_fuzzy_tables(base)
    base_sel, base_norm = base_tables

    wm = stream.withWatermark(ts_col, lateness)
    norm = wm.select(
        ts_col,
        F.col(id_col).alias("event_id"),
        normalize_text_expr(payload_col).alias("s"),
    ).withColumn("len", F.length("s"))
    grams = norm.filter(F.col("len") >= FUZZY_Q).select(
        ts_col,
        "event_id",
        "s",
        "len",
        F.explode(F.expr(gram_array_expr("s", "len"))).alias("gram"),
    )
    hits = grams.join(
        base_sel.select(F.col("doc_id").alias("base_doc"), "gram"), "gram"
    )
    cand = (
        hits.groupBy(
            F.window(ts_col, window).alias("window"),
            "event_id",
            "base_doc",
        )
        .agg(
            F.count(F.lit(1)).alias("shared_grams"),
            F.first("s").alias("s"),
            F.first("len").alias("len"),
        )
        .filter(F.col("shared_grams") >= FUZZY_MIN_SHARED)
    )
    bn = base_norm.select(
        F.col("doc_id").alias("base_doc"),
        F.col("s").alias("sb"),
        F.col("len").alias("lb"),
    )
    verified = (
        cand.join(bn, "base_doc")
        # byte semantics, mirroring the batch matcher exactly (fuzzy.py
        # byte_faithful note): byte-length prefilter + byte distance
        .filter(
            F.abs(F.octet_length("s") - F.octet_length("sb"))
            <= FUZZY_MAX_DIST
        )
        .withColumn(
            "dist",
            F.levenshtein(
                byte_faithful("s"), byte_faithful("sb"), FUZZY_MAX_DIST
            ),
        )
        .filter(F.col("dist") >= 0)
    )
    best = verified.groupBy(
        F.window(F.window_time("window"), window).alias("window"),
        "event_id",
    ).agg(
        F.min(F.struct("dist", "base_doc")).alias("best"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return best.select(
        "window",
        "event_id",
        F.col("best.base_doc").alias("matched_doc"),
        F.col("best.dist").alias("dist"),
        "n_candidates",
    )
