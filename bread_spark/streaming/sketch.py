"""Streaming sketch maintenance — the stream-shaped members of the
sketching family (extensions/sketch.py covers the batch forms).

At 100 TB the crawl never stops, and the two questions a corpus
dashboard keeps asking — "how many distinct tokens per source?" and
"how often does each token occur?" — must stay answerable WITHOUT
re-reading history. Both sketches are built here as unbounded streaming
aggregations whose state IS the sketch:

- `hll_register_stream`:  per-source HyperLogLog registers — state is
  O(sources · 64) max-of-rho cells; every micro-batch folds in by MAX,
  which is exactly the sketch's merge operator, so the stream's running
  answer equals the batch sketch over everything seen (pinned in
  tests).
- `cms_sketch_stream`:    the count-min counter table — state is the
  constant D·WIDTH grid; micro-batches fold in by SUM (count-min's
  merge operator).

Both reuse the IDENTICAL expressions as the batch catalog entries
(`hll_registers_df` / `cms_sketch_df`) — a shuffle-free projection plus
one grouped aggregate applies to a streaming frame unchanged, so the
batch entry and the monitor can never disagree. No watermark: the state
is constant-size by construction, the property that makes sketches the
right streaming citizens in the first place. Run in `update`/`complete`
output mode into a dashboard sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.sketch import cms_sketch_df, hdr_sketch_df, hll_registers_df


def hll_register_stream(docs: DataFrame) -> DataFrame:
    """Running per-source HLL register table over a (source, text)
    document stream — the online distinct-count monitor. The streaming
    state is the register table itself: new batches can only raise a
    register (MAX merge), never grow the state past sources · M rows."""
    return hll_registers_df(docs)


def cms_sketch_stream(docs: DataFrame) -> DataFrame:
    """Running count-min counter table over a (text) document stream —
    the online frequency monitor. State is the constant D·WIDTH counter
    grid regardless of how long the stream runs."""
    return cms_sketch_df(docs)


def hdr_sketch_stream(values: DataFrame, value_col: str = "value") -> DataFrame:
    """Running log-histogram over a value stream — the online quantile
    monitor (p50/p99 of a latency/price/size column without retaining
    values). State is the constant O(log(max)·2^SUB_BITS) bucket table;
    micro-batches fold in by SUM (the histogram's merge operator), so
    the running answer equals the batch sketch over everything seen —
    same expressions as the batch entry, pinned in tests."""
    return hdr_sketch_df(values, value_col)


def kmv_sketch_stream(docs: DataFrame, k: int | None = None) -> DataFrame:
    """Running per-source KMV (bottom-k) sketch over a (source, text)
    document stream — the online set-overlap monitor (feed two monitors'
    outputs to `kmv_source_overlap`'s estimator and pairwise source
    resemblance stays answerable while the crawl runs).

    Unlike the CMS/HLL/HDR twins, bottom-k is NOT expressible as a
    grouped streaming aggregation (rank-over-window is a batch
    construct, and a streaming `distinct` would hold the whole value
    set), so this is the custom-stateful form: `applyInPandasWithState`
    keyed by source, state = the sorted ≤K smallest distinct hashes —
    STRICTLY bounded at K longs per source no matter how long the
    stream runs. Each micro-batch folds its values in (set-union then
    re-truncate — exactly `merge_kmv_sketches`' operator), so the state
    after any prefix equals the batch sketch over that prefix: pinned,
    including across a checkpoint restart, in tests.

    Output per updated source: the full current sketch (source, ver, rk,
    h), `ver` a per-source monotone update counter so a consumer (or the
    agreement test) keeps MAX(ver) per source. Update output mode."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..extensions.sketch import KMV_K, _kmv_hash_rows

    kk = KMV_K if k is None else k

    def fold(key, pdfs, state):
        vals, ver = (
            (state.get[0], state.get[1]) if state.exists else ((), 0)
        )
        seen = set(vals)
        for pdf in pdfs:
            seen.update(int(v) for v in pdf["h"])
        best = sorted(seen)[:kk]
        state.update((best, ver + 1))
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(best),
                "ver": [ver + 1] * len(best),
                "rk": list(range(1, len(best) + 1)),
                "h": best,
            }
        )

    return (
        _kmv_hash_rows(docs)
        .groupBy("source")
        .applyInPandasWithState(
            fold,
            outputStructType="source string, ver long, rk int, h long",
            stateStructType="vals array<long>, ver long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def hll_windowed_register_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    payload_col: str = "text",
    window: str = "10 minutes",
    lateness: str = "1 hour",
) -> DataFrame:
    """Per-event-time-window HLL registers over a document stream —
    "how many distinct tokens arrived THIS hour", the windowed form of
    the running monitor above. State is O(open windows · M) and evicts
    with the watermark; each finalized window emits its ≤M register rows
    (window_start, bucket, max_rho) in append mode — still mergeable
    downstream (max across windows = the period's registers), so a
    dashboard can roll hours into days without touching raw data.

    Same md5/rho arithmetic as the batch sketch (`_HLL_U32`/`_rho_sql`
    are imported, not re-derived), so a window's registers are
    bit-identical to a batch build over that window's documents —
    pinned in tests."""
    from pyspark.sql import functions as F

    from ..extensions.sketch import HLL_M, _HLL_U32, _rho_sql

    toks = F.filter(F.split(payload_col, " "), lambda t: t != "")
    rows = docs.select(ts_col, F.explode(toks).alias("token")).select(
        ts_col,
        F.expr(f"{_HLL_U32} % {HLL_M}").alias("bucket"),
        F.expr(_rho_sql(f"({_HLL_U32} div {HLL_M})")).alias("rho"),
    )
    return (
        rows.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window).alias("win"), F.col("bucket"))
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("win").getField("start").alias("window_start"),
            "bucket",
            "max_rho",
        )
    )
