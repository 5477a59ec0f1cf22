"""Streaming incremental parse (exactly-once per file), stateful
sessionization, and multimodal binary-column tests."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from bread_spark.extensions import multimodal as MM
from bread_spark.streaming import incremental as INC
from bread_spark.streaming import sessions as S
from tests.fixtures import write_fixture_files
from tests.oracle_utils import duckdb_con, compare
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Incremental (AvailableNow + checkpoint)
# ---------------------------------------------------------------------------

def test_incremental_blocks_exactly_once(spark, tmp_path):
    bdir, tdir, blocks, txs = write_fixture_files(str(tmp_path / "bronze"))
    out = str(tmp_path / "silver_blocks")
    ckpt = str(tmp_path / "ckpt_blocks")

    q = INC.incremental_blocks(spark, bdir, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == len(blocks)

    # re-run with NO new files → checkpoint prevents reprocessing
    q = INC.incremental_blocks(spark, bdir, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1

    # drop one more batch file in → only the new file is processed
    extra_src = os.path.join(bdir, sorted(os.listdir(bdir))[0])
    with open(extra_src) as f:
        content = f.read()
    n_extra = len(content.strip().splitlines())
    with open(os.path.join(bdir, "99999990_99999999.json"), "w") as f:
        f.write(content)
    q = INC.incremental_blocks(spark, bdir, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1 + n_extra


def test_incremental_tx_and_log_attributes(spark, tmp_path):
    bdir, tdir, blocks, txs = write_fixture_files(str(tmp_path / "bronze"))
    out_tx = str(tmp_path / "silver_tx")
    out_la = str(tmp_path / "silver_la")
    INC.incremental_tx_result(spark, tdir, out_tx, str(tmp_path / "c1")).awaitTermination(120)
    INC.incremental_log_attributes(spark, tdir, out_la, str(tmp_path / "c2")).awaitTermination(120)
    assert spark.read.parquet(out_tx).count() == len(txs)
    # batch parse and streaming parse agree
    from bread_spark import parse as P

    batch = P.parse_log_attributes(P.read_raw_txs(spark, tdir))
    assert spark.read.parquet(out_la).count() == batch.count()


# ---------------------------------------------------------------------------
# Sessionization: batch (oracle-checked) + streaming state
# ---------------------------------------------------------------------------

def test_sessionize_batch_vs_oracle(spark):
    from bread_spark.io import load_table

    events = load_table(spark, SF_DIR, "events")
    got = S.session_stats(events)
    con = duckdb_con(SF_DIR)
    sql = f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > {S.SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessioned AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, COUNT(1) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               ROUND(SUM(value), 4) AS session_value
        FROM sessioned GROUP BY user_id, session_id
    """
    ok, msg = compare(got, con, sql)
    assert ok, msg


def test_sessionize_stream_state(spark, tmp_path):
    """Drive the stateful operator with a rate-limited file stream and
    check closed sessions match the batch semantics."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        t = base + datetime.timedelta(minutes=u)
        for s in range(2):  # two sessions per user, 2h apart
            for i in range(4):
                rows.append((u, t, 1.0))
                t += datetime.timedelta(minutes=5)
            t += datetime.timedelta(hours=2)
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    pdf.to_json(src / "events.json", orient="records", lines=True, date_format="iso")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .json(str(src))
    )
    out = S.sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # A stateful query with ProcessingTimeTimeout never self-terminates —
    # pending timeouts keep scheduling "cleaning up state" batches even
    # under availableNow (and processAllAvailable never settles). Poll the
    # sink for the expected closed sessions, then stop explicitly.
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) FROM sessions_out").first()[0] >= 3:
            break
        time.sleep(2)
    q.stop()
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM sessions_out").collect()
    # first session of each user closes when the 2h gap arrives in-batch
    closed = {(r["user_id"], r["session_id"]): r for r in got}
    assert len(closed) >= 3
    for (u, sid), r in closed.items():
        assert r["n_events"] == 4
        assert r["session_value"] == pytest.approx(4.0)


def test_session_func_sorts_across_chunks():
    """applyInPandasWithState may deliver a key's micro-batch rows split
    across multiple Arrow chunks in ANY order; the gap computation must
    see a globally sorted view (regression: per-chunk sorting produced
    negative gaps that split/merged sessions wrongly)."""
    import pandas as pd

    class FakeState:
        exists = False
        hasTimedOut = True  # force emission of the trailing session

        def remove(self):
            pass

    def chunk(minutes):
        return pd.DataFrame(
            {
                "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m) for m in minutes],
                "value": [1.0] * len(minutes),
            }
        )

    # one true session 0-15 min, then a 2h gap, then a session at 135-140;
    # the chunks interleave the two sessions out of order
    chunks = [chunk([135, 5]), chunk([0, 140]), chunk([15, 10])]
    (out,) = list(S._session_func((7,), iter(chunks), FakeState()))
    sessions = out.groupby("session_id").agg(n=("n_events", "first")).reset_index()
    assert len(sessions) == 2
    assert sorted(out["n_events"].tolist()) == [2, 4]  # 4-event + 2-event sessions


# ---------------------------------------------------------------------------
# Multimodal binary columns
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes1", "image/png"),
        (2, "image", b"\x89PNGfakebytes1", "image/png"),  # exact dup of 1
        (3, "video", b"\x00\x00fakevideobytes", "video/mp4"),
        (4, "audio", b"RIFFfakeaudio", "audio/wav"),
    ]
    return spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)


def test_media_features(media):
    feats = {r["media_id"]: r for r in MM.extract_media_features(media).collect()}
    assert len(feats) == 4
    # deterministic fake decode: same payload → same dims & digest
    assert feats[1]["content_sha256"] == feats[2]["content_sha256"]
    assert (feats[1]["width"], feats[1]["height"]) == (feats[2]["width"], feats[2]["height"])
    assert feats[3]["n_frames"] > 1  # video gets frames
    assert feats[4]["n_frames"] == 1
    assert feats[1]["byte_len"] == 14


def test_media_dedup_and_frame_sampling(media):
    dups = {r["content_sha256"]: r for r in MM.media_dedup_exact(media).collect()}
    assert len(dups) == 3
    assert max(r["dup_count"] for r in dups.values()) == 2
    frames = MM.frame_sample_plan(media, every_n=30).collect()
    vid = [r for r in frames if r["media_id"] == 3]
    assert vid and all(r["frame_idx"] % 30 == 0 for r in vid)


def test_custom_decoder_seam(spark, media):
    MM.set_decoder(lambda payload, kind: (640, 480, 7))
    try:
        feats = MM.extract_media_features(media).collect()
        assert all((r["width"], r["height"], r["n_frames"]) == (640, 480, 7) for r in feats)
    finally:
        MM.set_decoder(MM._fake_decode)
