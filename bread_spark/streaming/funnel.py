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

All arithmetic is on epoch MICROseconds — Spark timestamps are µs
precision, so the closed form compares exactly the instants the batch
operator compares (second-truncation would move sub-second orderings
and horizon boundaries).

After finalization the state collapses to a TOMBSTONE (the TTL deadline
in event-time ms, no buffer): events arriving later for the same user
are ignored instead of re-opening the funnel, preserving the
one-row-per-user contract the batch operator has. The tombstone
self-evicts one `FUNNEL_TOMBSTONE_S` after finalization — an event
older than that horizon arriving for a finalized user would
double-count, so size it to how long a user id can plausibly stay
active past their funnel (state cost: one long per finalized user
within the TTL). The deadline lives IN the state tuple — not only in
the timer — so straggler deliveries can re-arm the timer against it
regardless of whether the engine resets pending timeouts per
invocation (the documented Scala contract) or preserves them (what the
Spark 4.1 Python wrapper does).

State size: a user's buffered events until finalization — bounded by
the watermark horizon past `first_view + 2·horizon` (and in a real
deployment by pre-filtering to the attribution/campaign window before
the groupBy; views/clicks outside it can't change any verdict) — then
one tombstone row until the TTL passes.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

US = 1_000_000
FUNNEL_HORIZON_US = 24 * 3600 * US
FUNNEL_TOMBSTONE_S = 30 * 24 * 3600  # keep the done-flag 30 days of event time
FUNNEL_STATE_SCHEMA = "tss array<long>, types array<string>, done_until_ms long"
FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp, t_purchase timestamp"
)


def _evaluate(
    tss: list[int], types: list[str]
) -> tuple[int | None, int | None, int | None]:
    """The closed form, on epoch microseconds. Returns (t_view, t_click,
    t_purchase) with None for unreached stages."""
    views = [t for t, y in zip(tss, types) if y == "view"]
    if not views:
        return None, None, None
    tv = min(views)
    clicks = [
        t
        for t, y in zip(tss, types)
        if y == "click" and tv <= t <= tv + FUNNEL_HORIZON_US
    ]
    if not clicks:
        return tv, None, None
    tc = min(clicks)
    purchases = [
        t
        for t, y in zip(tss, types)
        if y == "purchase" and tc <= t <= tc + FUNNEL_HORIZON_US
    ]
    return tv, tc, (min(purchases) if purchases else None)


def _funnel_func(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    empty = pd.DataFrame(columns=["user_id", "t_view", "t_click", "t_purchase"])

    def finalized(tss: list[int], types: list[str]) -> pd.DataFrame:
        tv, tc, tp = _evaluate(tss, types)
        if tv is None:
            return empty
        to_ts = lambda v: pd.Timestamp(v, unit="us") if v is not None else pd.NaT
        return pd.DataFrame(
            [(user_id, to_ts(tv), to_ts(tc), to_ts(tp))],
            columns=["user_id", "t_view", "t_click", "t_purchase"],
        )

    if state.exists and state.get[2] is not None:
        # tombstone: the funnel already emitted — swallow stragglers until
        # event time passes the TTL deadline STORED IN THE STATE. The
        # deadline lives in the tuple, not only in the timer, because the
        # documented GroupState contract (the Scala engine's
        # flatMapGroupsWithState) resets a pending timeout on every
        # invocation for the key; Spark 4.1's Python wrapper happens to
        # echo the old timer back when unchanged (pyspark/sql/streaming/
        # state.py constructs GroupState WITH the prior timeoutTimestamp),
        # but relying on that implementation detail would let one
        # straggler cancel the TTL for good if the wrapper ever matches
        # the documented semantics. Re-deriving the timer from the stored
        # deadline makes eviction correct under either behavior.
        deadline_ms = state.get[2]
        for _ in pdf_iter:
            pass
        if state.getCurrentWatermarkMs() >= deadline_ms:
            # expired — whether we got here via timeout or via a straggler
            # arriving after the deadline, the contract is the same
            state.remove()
        else:
            # re-arm against the stored deadline (a no-op if the old timer
            # survived the invocation); clamp above the watermark —
            # setTimeoutTimestamp rejects timestamps at/below it
            state.update(([], [], deadline_ms))
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1000)
            )
        yield empty
        return

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
        tss.extend(int(t.value // 1_000) for t in pdf["ts"])  # ns → µs, exact
        types.extend(str(y) for y in pdf["event_type"])
    # Finalization point: nothing can change a stage once the watermark
    # passes first_view + 2·horizon (clicks ≤ view+h, purchases ≤
    # click+h; a later-arriving EARLIER view only moves the point
    # earlier). No view yet → one horizon past the user's latest event,
    # then conclude view-less.
    views = [t for t, y in zip(tss, types) if y == "view"]
    anchor = (
        min(views) + 2 * FUNNEL_HORIZON_US if views else max(tss) + FUNNEL_HORIZON_US
    )
    target_ms = anchor // 1000 + 1000  # µs → ms, one tick past the bound
    if target_ms <= state.getCurrentWatermarkMs():
        if views:
            # emitted a real row → tombstone so stragglers can't re-open.
            # The TTL deadline is persisted in the state (third field) so
            # straggler invocations — which clear the pending timer — can
            # re-arm it against the same fixed point. Clamp the timer
            # above the watermark: after a backfill replay the
            # finalization point (and even point + TTL) can already be
            # far behind it, and setTimeoutTimestamp REJECTS timestamps
            # below the watermark (query-crashing error).
            deadline_ms = target_ms + FUNNEL_TOMBSTONE_S * 1000
            state.update(([], [], deadline_ms))
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1000)
            )
        else:
            # nothing emitted → just drop the state. A future admitted
            # view has ts ≥ watermark > every buffered event here, so the
            # discarded clicks/purchases could never qualify against it
            # (they precede t_view) — batch agreement survives without a
            # tombstone, and the funnel CAN still open for this user.
            state.remove()
        yield finalized(tss, types)
        return
    state.update((tss, types, None))
    state.setTimeoutTimestamp(target_ms)
    yield empty


def funnel_stream(events_stream: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Per-user funnel stages over a stream of (user_id, event_type, ts);
    one finalized row per user who VIEWED, emitted when the event-time
    watermark passes their finalization point. Roll up downstream by
    `CAST(t_view AS DATE)` for the batch operator's day-grain output.

    Requires a UTC session timezone (the repo default): the state
    function compares pandas-materialized event times — which Arrow
    localizes to `spark.sql.session.timeZone` — against the UTC
    watermark, so a non-UTC zone would skew finalization by the offset.
    Guarded here instead of silently mis-finalizing."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"funnel_stream requires spark.sql.session.timeZone=UTC (got {tz}): "
            "state-internal epoch math would be offset by the zone"
        )

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
