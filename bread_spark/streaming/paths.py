"""Streaming twin of the event-sequence analytics: transitions online.

A user's next-event transition depends on exactly one thing — their
LAST event — so the online form is `applyInPandasWithState` keyed by
user with state (last_ts, last_id, last_type): one bounded tuple per
user, no eviction logic needed beyond the usual key-cardinality bound
(add a TTL timeout if user space is unbounded in production).

Each micro-batch sorts its rows by (ts, event_id) — the batch
operator's exact order — folds them against the carried last event,
and emits one row per observed transition. The running transition
matrix / trigram table is then a plain windowed count downstream
(composition, not duplication). Emitting `prev2_type` alongside makes
the same stream feed the trigram table too.

In-order contract as the CUSUM twin: batches must arrive in event-time
order (replay/backfill, in-order sources); within-batch disorder is
handled by the sort. Batch/stream transition-multiset agreement, incl.
a checkpoint restart, is pinned in tests/test_streaming_paths.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transition_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Emit (user_id, from_type, to_type, prev2_type, event_id) for
    every observed per-user transition (module docstring)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        if state.exists:
            last_type, prev_type = state.get[0], state.get[1]
        else:
            last_type, prev_type = None, None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((last_type, prev_type))
            return
        batch = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["__ts", "__id"])
            .reset_index(drop=True)
        )
        # vectorized (review finding): from/prev2 are shift(1)/shift(2)
        # seeded with the carried last two types
        cur = batch["__type"]
        frm = cur.shift(1)
        prev2 = cur.shift(2)
        frm.iloc[0:1] = last_type
        if len(batch) >= 1:
            prev2.iloc[0:1] = prev_type
        if len(batch) >= 2:
            prev2.iloc[1:2] = last_type
        n = len(batch)
        prev_type = cur.iloc[-2] if n >= 2 else last_type
        last_type = cur.iloc[-1]
        state.update((last_type, prev_type))
        mask = frm.notna()
        if mask.any():
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * int(mask.sum()),
                    "from_type": frm[mask].tolist(),
                    "to_type": cur[mask].tolist(),
                    "prev2_type": prev2[mask].tolist(),
                    "event_id": batch["__id"][mask].astype("int64").tolist(),
                }
            )

    prepped = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__type"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, from_type string, to_type string, "
            "prev2_type string, event_id long"
        ),
        stateStructType="last_type string, prev_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
