"""Streaming conversion funnel — the stateful ordered-pattern twin of
`models.conversion_funnel` (`applyInPandasWithState`, per-user state).

Design: a user's events are BUFFERED in state until the event-time
watermark passes `first_view + 2·horizon` (after which no event can
change any stage), then the funnel is evaluated ONCE with the exact
closed form the batch operator's cumulative windows compute:

    t_view     = min view ts
    t_click    = min click ts in [t_view, t_view + horizon]
    t_purchase = min purchase ts in [t_click, t_click + horizon]

Buffer-then-finalize is what makes the twin EXACT under out-of-order
arrival inside the watermark: a greedy running-state design commits to
the earliest view seen so far, and a later-arriving earlier view would
silently invalidate its click decisions; the buffered form re-derives
everything from the user's full event set at finalization (pinned by a
test that delivers the first view in the SECOND micro-batch).

State size: a user's buffered events until finalization — bounded by
the watermark horizon past `first_view + 2·horizon` (and in a real
deployment by pre-filtering to the attribution/campaign window before
the groupBy; views/clicks outside it can't change any verdict). State
is O(active users × their in-window events), evicted at finalization.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

FUNNEL_HORIZON_S = 24 * 3600
FUNNEL_STATE_SCHEMA = "tss array<long>, types array<string>"
FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp, t_purchase timestamp"
)


def _evaluate(tss: list[int], types: list[str]) -> tuple[int | None, int | None, int | None]:
    """The closed form, on epoch seconds. Returns (t_view, t_click,
    t_purchase) with None for unreached stages."""
    views = [t for t, y in zip(tss, types) if y == "view"]
    if not views:
        return None, None, None
    tv = min(views)
    clicks = [
        t
        for t, y in zip(tss, types)
        if y == "click" and tv <= t <= tv + FUNNEL_HORIZON_S
    ]
    if not clicks:
        return tv, None, None
    tc = min(clicks)
    purchases = [
        t
        for t, y in zip(tss, types)
        if y == "purchase" and tc <= t <= tc + FUNNEL_HORIZON_S
    ]
    return tv, tc, (min(purchases) if purchases else None)


def _funnel_func(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    def finalized(tss: list[int], types: list[str]) -> pd.DataFrame:
        tv, tc, tp = _evaluate(tss, types)
        if tv is None:
            return pd.DataFrame(columns=["user_id", "t_view", "t_click", "t_purchase"])
        to_ts = lambda v: pd.Timestamp(v, unit="s") if v is not None else pd.NaT
        return pd.DataFrame(
            [(user_id, to_ts(tv), to_ts(tc), to_ts(tp))],
            columns=["user_id", "t_view", "t_click", "t_purchase"],
        )

    # ONE path for data and timeout: drain whatever the iterator holds,
    # recompute the finalization point, then either finalize (it's behind
    # the watermark — covers the pure-timeout case, where no new rows
    # leave the target unchanged and expired) or re-arm the timer. A
    # separate hasTimedOut branch that skips the iterator would be
    # fragile against rows co-delivered with an expired timer; deciding
    # from the recomputed target alone is correct in every interleaving.
    tss, types = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        tss.extend(int(t.value // 1_000_000_000) for t in pdf["ts"])
        types.extend(str(y) for y in pdf["event_type"])
    # Finalization point: nothing can change a stage once the watermark
    # passes first_view + 2·horizon (clicks ≤ view+h, purchases ≤
    # click+h; a later-arriving EARLIER view only moves the point
    # earlier). No view yet → one horizon past the user's latest event,
    # then conclude view-less.
    views = [t for t, y in zip(tss, types) if y == "view"]
    anchor = min(views) + 2 * FUNNEL_HORIZON_S if views else max(tss) + FUNNEL_HORIZON_S
    target_ms = (anchor + 1) * 1000
    if target_ms <= state.getCurrentWatermarkMs():
        state.remove()
        yield finalized(tss, types)
        return
    state.update((tss, types))
    state.setTimeoutTimestamp(target_ms)
    yield pd.DataFrame(columns=["user_id", "t_view", "t_click", "t_purchase"])


def funnel_stream(events_stream: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Per-user funnel stages over a stream of (user_id, event_type, ts);
    one finalized row per user who VIEWED, emitted when the event-time
    watermark passes their finalization point. Roll up downstream by
    `CAST(t_view AS DATE)` for the batch operator's day-grain output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_func,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
