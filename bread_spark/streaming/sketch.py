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


def fd_sketch_stream(
    emb_stream: DataFrame, ell: int | None = None
) -> DataFrame:
    """Running per-source Frequent-Directions sketch over a
    (source, embedding) vector stream — the MATRIX member of the
    streaming sketch monitors (CMS/HLL/HDR/KMV twins above): keeps a
    live low-rank summary of each source's Gram matrix while the crawl
    runs, so covariance/subspace drift is answerable without storing
    vectors.

    Custom-stateful form (`applyInPandasWithState` keyed by source):
    the state IS the sketch — the flattened ell x d row matrix,
    STRICTLY bounded at ell*d doubles per source regardless of stream
    length. Each micro-batch stacks its vectors under the carried
    rows and re-shrinks (the same `shrink` step the batch partials
    use), which is exactly FD's merge operator — so the state after
    any prefix is a VALID sketch of that prefix with the
    ||A^T A - B^T B||_2 <= ||A||_F^2 / ell guarantee. Row VALUES are
    arrival-order-dependent (SVD floats) — the twin contract here is
    the BOUND, pinned in tests incl. a checkpoint restart, not row
    equality (same posture as `merge_mg_summaries`).

    Output per updated source: the full current sketch (source, ver,
    row_idx, vector), `ver` a per-source monotone update counter so a
    consumer keeps MAX(ver). Append mode (each versioned row emits
    once)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..extensions.spectral import FD_ELL

    L = FD_ELL if ell is None else ell

    def shrink(mat, ell_):
        # thin case (d < ell): s*vt is exact in <= len(s) rows — see
        # the batch kernel's comment; returning mat unchanged would
        # stall the stack-and-shrink fold
        u, s, vt = np.linalg.svd(mat, full_matrices=False)
        if len(s) < ell_:
            return s[:, None] * vt
        delta = s[ell_ - 1] ** 2
        s2 = np.sqrt(np.maximum(s**2 - delta, 0.0))
        return (s2[:, None] * vt)[:ell_]

    def fold(key, pdfs, state):
        if state.exists:
            flat, d, ver = state.get
            buf = (
                np.array(flat, dtype=np.float64).reshape(-1, d)
                if d > 0
                else None
            )
        else:
            buf, d, ver = None, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            a = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d = a.shape[1]
            buf = a if buf is None else np.vstack([buf, a])
            while len(buf) >= 2 * L:
                buf = shrink(buf, L)
        if buf is None:
            state.update(([], 0, ver))
            return
        if len(buf) > L:
            buf = shrink(buf, L)
        ver += 1
        state.update(([float(x) for x in buf.ravel()], int(d), ver))
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(buf),
                "ver": [ver] * len(buf),
                "row_idx": list(range(len(buf))),
                "vector": [list(map(float, r)) for r in buf],
            }
        )

    return emb_stream.select("source", "embedding").groupBy("source").applyInPandasWithState(
        fold,
        outputStructType=(
            "source string, ver long, row_idx int, vector array<double>"
        ),
        stateStructType="flat array<double>, d int, ver long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
