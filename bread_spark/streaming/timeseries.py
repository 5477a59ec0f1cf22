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
