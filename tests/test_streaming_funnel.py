"""Streaming funnel: buffered per-user state finalized at the event-time
watermark must agree EXACTLY with the batch funnel_stages closed form —
including out-of-order delivery WITHIN the lateness bound, which a greedy
running-state design would get wrong (it would have already discarded the
click that precedes its late-arriving qualifying view)."""

from __future__ import annotations

import pytest

import datetime
import json
import os

BASE = datetime.datetime(2024, 8, 1, 12, 0)
H = datetime.timedelta(hours=1)
D = datetime.timedelta(days=1)
LATENESS = "3 hours"


def _write(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for user, typ, ts in rows:
            f.write(
                json.dumps({"user_id": user, "event_type": typ, "ts": ts.isoformat()})
                + "\n"
            )


def _run(spark, src, ckpt, sink):
    from bread_spark.streaming.funnel import funnel_stream

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).json(src)
    q = (
        funnel_stream(stream, lateness=LATENESS)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_funnel_agrees_with_batch_stages(spark, tmp_path):
    from bread_spark.models import funnel_stages

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)

    us = datetime.timedelta(microseconds=1)
    batch1 = [
        # u1: full conversion, in order
        (1, "view", BASE),
        (1, "click", BASE + 2 * H),
        (1, "purchase", BASE + 3 * H),
        # u2: click+purchase arrive BEFORE the qualifying view (next batch)
        (2, "click", BASE + 2 * H),
        (2, "purchase", BASE + 3 * H),
        # u4: no view at all → no funnel row
        (4, "click", BASE),
        (4, "purchase", BASE + H),
        # u5: click 1 µs BEFORE the first view — batch excludes it; a
        # second-truncating stream would wrongly credit it
        (5, "click", BASE + H - us),
        (5, "view", BASE + H),
        (5, "click", BASE + 2 * H + us),
    ]
    # watermark after batch1 = BASE+3h − 3h lateness = BASE, so u2's view
    # at BASE+1h is out-of-order but NOT late — it must still be counted
    batch2 = [(2, "view", BASE + 1 * H)]
    # u3 (click outside the 24 h horizon) + watermark pushers; two runs so
    # every finalization point (≤ first_view + 48 h) passes the watermark
    batch3 = [(3, "view", BASE + 2 * D), (3, "click", BASE + 2 * D + 30 * H)]
    batch4 = [(99, "view", BASE + 10 * D)]
    batch5 = [(98, "view", BASE + 30 * D)]
    # u1 was finalized (tombstoned) long before this on-time view arrives;
    # the one-row-per-user contract means it must NOT re-open the funnel
    batch6 = [(1, "view", BASE + 40 * D)]
    batch7 = [(97, "view", BASE + 100 * D)]

    batches = (batch1, batch2, batch3, batch4, batch5, batch6, batch7)
    for i, b in enumerate(batches, 1):
        _write(src, f"b{i}.json", b)
        _run(spark, src, ckpt, sink)

    rows = [r for r in spark.read.parquet(sink).collect() if r["user_id"] <= 5]
    assert len(rows) == len({r["user_id"] for r in rows})  # one row per user
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"]) for r in rows
    }

    all_rows = batch1 + batch2 + batch3
    bdf = spark.createDataFrame(
        [(u, ty, ts) for u, ty, ts in all_rows],
        "user_id long, event_type string, ts timestamp",
    )
    want = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in funnel_stages(bdf).filter("t_view IS NOT NULL").collect()
        if r["user_id"] <= 5
    }
    assert got == want
    # the interesting cases explicitly:
    assert got[2] == (BASE + H, BASE + 2 * H, BASE + 3 * H)  # late-view credit
    assert got[3][1] is None  # click outside horizon never qualifies
    assert 4 not in got  # view-less users emit nothing
    # sub-second ordering: the pre-view click is excluded, the +1 µs one wins
    assert got[5] == (BASE + H, BASE + 2 * H + us, None)
    # tombstone: u1's post-finalization view did not produce a second row
    assert got[1] == (BASE, BASE + 2 * H, BASE + 3 * H)


@pytest.mark.nightly  # restart/multi-batch wait dominates (r9 tier split)
def test_tombstone_survives_straggler_and_self_evicts(spark, tmp_path):
    """The documented GroupState contract resets a pending timeout on
    every invocation for the key, so a straggler delivered to a
    TOMBSTONED user could cancel the TTL timer for good (Spark 4.1's
    Python wrapper happens to preserve it, but that is an implementation
    detail). The TTL deadline therefore lives in the state tuple and
    every tombstone invocation re-arms the timer against it — eviction
    is pinned by reading the state store itself after the TTL passes."""
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    os.makedirs(src)

    batches = (
        # u1 converts; pusher 90 advances the watermark past u1's
        # finalization point (BASE+2d) on the NEXT run
        [(1, "view", BASE), (1, "click", BASE + H), (90, "view", BASE + 3 * D)],
        # u1's timer fires during this run → emits + tombstones
        # (deadline = finalization point + 30 d ≈ BASE+32d)
        [(91, "view", BASE + 10 * D)],
        # on-time straggler for the TOMBSTONED u1 — this invocation clears
        # the pending TTL timer; the fix re-arms it from the stored deadline
        [(1, "view", BASE + 11 * D)],
        # push the watermark past the deadline...
        [(92, "view", BASE + 50 * D)],
        # ...and run once more so the re-armed timer fires → state removed
        [(93, "view", BASE + 51 * D)],
    )
    for i, b in enumerate(batches, 1):
        _write(src, f"b{i}.json", b)
        _run(spark, src, ckpt, sink)

    rows = spark.read.parquet(sink).collect()
    # exactly one output row for u1 (the straggler view never re-opened it)
    assert [r["t_view"] for r in rows if r["user_id"] == 1] == [BASE]

    state = spark.read.format("statestore").load(ckpt)
    state_users = {r["key"]["user_id"] for r in state.collect()}
    assert 1 not in state_users, (
        "tombstone for u1 still in the state store after its TTL passed — "
        "the straggler cancelled the timeout and it was never re-armed"
    )
