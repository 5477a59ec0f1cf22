"""Streaming twin of the CUSUM changepoint detector — the recurrence
run ONLINE with `applyInPandasWithState`.

CUSUM is the naturally incremental detector: its entire state is one
(S+, S-) pair per key. The batch entry turns the clamped recurrence
into window functions; here the recurrence just runs directly, one
fold per arriving event, against a FROZEN baseline (mu, k, h per
event_type from a reference window — `extensions.timeseries.
cusum_baseline`). State is STRICTLY two longs per event_type no matter
how long the stream runs — no eviction needed, NoTimeout.

Ordering contract: the batch core (`event_cusum_df`) orders by
(ts, event_id); each micro-batch here sorts its rows the same way
before folding, so as long as batches arrive in event-time order
(true for replay/backfill and for an in-order source) the stream's
running statistic equals the batch one row for row — pinned in
tests/test_streaming_timeseries.py, including a checkpoint restart.
Out-of-order arrival WITHIN a batch is handled by the sort;
cross-batch stragglers would need the watermarked daily form instead.

Output per event (append mode — every row is emitted exactly once
and never retracted): (event_type, event_id, v_u, s_pos, s_neg,
alarm) — the same columns the batch core certifies."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    """Quote a data-derived string as a Spark SQL literal, escaping
    backslashes and single quotes (type names come from event DATA —
    an unescaped quote would malform the compiled CASE expression)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def cusum_stream_against_base(
    stream: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fold the two-sided CUSUM over an event stream against the frozen
    per-type baseline (module docstring)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    base = {
        r["event_type"]: (r["mu"], r["k"], r["h"])
        for r in baseline.collect()
    }

    def fold(key, pdfs, state):
        etype = key[0]
        if etype not in base:
            # an unscoreable type: a zero baseline would turn every
            # value into a huge "deviation" and alarm-storm — drain
            # the batch, keep no state, emit nothing (gate unseen
            # types upstream or retrain the baseline to admit them)
            for _ in pdfs:
                pass
            return
        mu, k, h = base[etype]
        s_pos, s_neg = (
            (state.get[0], state.get[1]) if state.exists else (0, 0)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((s_pos, s_neg))
            return
        batch = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["__ts", "__id"])
            .reset_index(drop=True)
        )
        # vectorized clamped recurrence with carried state (review
        # finding: iterrows was ~100x slower): seed the prefix sums
        # with the carried S, then the same reflection identity the
        # batch core uses — S_t = Q_t - min(0, running_min(Q)) where
        # Q_t = S_carried + cumsum(d). Exact int64 throughout.
        import numpy as np

        v = batch["__v"].to_numpy(dtype=np.int64)
        qp = s_pos + np.cumsum(v - mu - k)
        qn = s_neg + np.cumsum(-(v - mu + k))
        sp = qp - np.minimum(np.minimum.accumulate(qp), 0)
        sn = qn - np.minimum(np.minimum.accumulate(qn), 0)
        s_pos, s_neg = int(sp[-1]), int(sn[-1])
        state.update((s_pos, s_neg))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(v),
                "event_id": batch["__id"].to_numpy(dtype=np.int64),
                "v_u": v,
                "s_pos": sp,
                "s_neg": sn,
                "alarm": ((sp > h) | (sn > h)).astype("int32"),
            }
        )

    prepped = stream.select(
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.round(F.col(value_col) * 1_000_000).cast("long").alias("__v"),
    )
    return prepped.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=(
            "event_type string, event_id long, v_u long, "
            "s_pos long, s_neg long, alarm int"
        ),
        stateStructType="s_pos long, s_neg long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def psi_reference(ev: DataFrame) -> DataFrame:
    """Frozen reference bucket distribution from a reference window:
    (event_type, bucket, n_ref_b) over the HDR lattice — the static
    side the streaming drift monitor compares each window against."""
    from ..extensions.sketch import _hdr_bucket_expr

    return (
        ev.select(
            "event_type",
            F.expr(_hdr_bucket_expr("value")).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_ref_b"))
    )


def psi_stream_against_base(
    stream: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window: str = "10 minutes",
    lateness: str = "1 hour",
) -> DataFrame:
    """The streaming twin of `value_psi_by_type`: per (event-time
    window, type), the PSI of that window's value distribution against
    the FROZEN reference (`psi_reference` over the training period) —
    the online distribution-drift alarm next to the online CUSUM
    (which watches the level).

    Shape: two chained stateful stages — a windowed (window, type,
    bucket) count (state: one long per occupied lattice bucket, and
    the HDR lattice bounds occupied buckets at O(log(max)·16) per type
    regardless of volume), then a windowed collect of the ≤O(log·16)
    bucket structs per (window, type). The PSI itself is ONE in-array
    expression over the collected list: the reference counts ride as a
    compile-time map LITERAL (bounded by construction — types×buckets
    rows), the bucket union is array_union(window buckets, reference
    buckets), and add-1 smoothing over that union matches the batch
    operator's rule exactly. Emits (window, event_type, psi, n_buckets,
    n_cur) in append mode once the watermark passes.

    Same smoothing, same lattice, same union rule as the batch PSI —
    agreement with a from-first-principles batch computation over each
    window's events is pinned in tests/test_streaming_timeseries.py."""
    from ..extensions.sketch import _hdr_bucket_expr

    ref_rows = reference.collect()
    ref_counts: dict[str, dict[int, int]] = {}
    for r in ref_rows:
        ref_counts.setdefault(r["event_type"], {})[r["bucket"]] = r["n_ref_b"]

    # compile the frozen reference into literal expressions; type names
    # are escaped via _sql_str (they come from data)
    type_entries = []
    for t, buckets in sorted(ref_counts.items()):
        n_ref = sum(buckets.values())
        pairs = ", ".join(
            f"struct({b}L as b, {n}L as n)"
            for b, n in sorted(buckets.items())
        )
        type_entries.append((t, n_ref, f"array({pairs})"))
    ref_arr_expr = (
        "CASE "
        + " ".join(
            f"WHEN event_type = {_sql_str(t)} THEN {arr}"
            for t, _, arr in type_entries
        )
        + " ELSE array() END"
    )
    ref_tot_expr = (
        "CASE "
        + " ".join(
            f"WHEN event_type = {_sql_str(t)} THEN {n}L"
            for t, n, _ in type_entries
        )
        + " ELSE 0L END"
    )

    wm = stream.withWatermark(ts_col, lateness)
    binned = wm.select(
        ts_col,
        F.col(type_col).alias("event_type"),
        F.expr(_hdr_bucket_expr(value_col)).alias("bucket"),
    )
    counts = binned.groupBy(
        F.window(ts_col, window).alias("window"),
        "event_type",
        "bucket",
    ).agg(F.count(F.lit(1)).alias("n_cur_b"))
    collected = counts.groupBy(
        F.window(F.window_time("window"), window).alias("window"),
        "event_type",
    ).agg(
        F.collect_list(F.struct("bucket", "n_cur_b")).alias("cur"),
    )
    # the PSI fold: union of window + reference buckets, add-1 smoothing
    psi_expr = f"""
        transform(array(struct(
            map_from_entries(transform(cur, c -> struct(c.bucket, c.n_cur_b))) as cm,
            {ref_arr_expr} as ra,
            {ref_tot_expr} as nref,
            aggregate(cur, 0L, (a, c) -> a + c.n_cur_b) as ncur
        )), s -> struct(
            array_union(
                transform(s.ra, r -> r.b),
                transform(cur, c -> c.bucket)
            ) as keys, s.cm as cm,
            map_from_entries(transform(s.ra, r -> struct(r.b, r.n))) as rm,
            s.nref as nref, s.ncur as ncur
        ))[0]
    """
    staged = collected.withColumn("st", F.expr(psi_expr))
    psi = F.expr(
        """
        round(aggregate(st.keys, cast(0.0 as double), (acc, b) ->
            acc + (
                ((coalesce(element_at(st.rm, b), 0L) + 1) /
                 cast(st.nref + size(st.keys) as double))
                -
                ((coalesce(element_at(st.cm, b), 0L) + 1) /
                 cast(st.ncur + size(st.keys) as double))
            ) * ln(
                ((coalesce(element_at(st.rm, b), 0L) + 1) /
                 cast(st.nref + size(st.keys) as double))
                /
                ((coalesce(element_at(st.cm, b), 0L) + 1) /
                 cast(st.ncur + size(st.keys) as double))
            )
        ), 6)
        """
    )
    return staged.select(
        "window",
        "event_type",
        psi.alias("psi"),
        F.size("st.keys").alias("n_buckets"),
        F.col("st.ncur").alias("n_cur"),
    )
