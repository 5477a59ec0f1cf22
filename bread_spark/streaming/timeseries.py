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
        out_id, out_v, out_sp, out_sn, out_al = [], [], [], [], []
        for _, row in batch.iterrows():
            v = int(row["__v"])
            s_pos = max(0, s_pos + (v - mu - k))
            s_neg = max(0, s_neg - (v - mu + k))
            out_id.append(int(row["__id"]))
            out_v.append(v)
            out_sp.append(s_pos)
            out_sn.append(s_neg)
            out_al.append(1 if (s_pos > h or s_neg > h) else 0)
        state.update((s_pos, s_neg))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(out_id),
                "event_id": out_id,
                "v_u": out_v,
                "s_pos": out_sp,
                "s_neg": out_sn,
                "alarm": out_al,
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
