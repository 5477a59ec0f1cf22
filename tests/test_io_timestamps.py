"""Pin the type-adaptive events.ts read (ADVICE r3, all three items).

The driver's testdata has shipped ``events.ts`` as both TIMESTAMP(NANOS)
and TIMESTAMP(MICROS) parquet across generations. `io.load_table` must
(a) return identical epoch values for both encodings of the same
instants, (b) not leave `spark.sql.legacy.parquet.nanosAsLong` set
session-wide, and (c) fail loudly on an encoding it does not recognize.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bread_spark import io

CONF_KEY = "spark.sql.legacy.parquet.nanosAsLong"

# Instants with sub-µs nanos to pin the ns→µs floor-truncation semantics.
_NANOS = [
    1_700_000_000_123_456_789,
    1_700_000_000_999_999_999,
    1_700_086_400_000_000_001,
    1_700_172_800_500_000_500,
]


def _write_events(tmp_path, unit: str) -> str:
    d = tmp_path / f"events_{unit}_dir"
    d.mkdir()
    if unit == "ns":
        ts = pa.array(_NANOS, type=pa.timestamp("ns"))
    else:
        ts = pa.array([n // 1000 for n in _NANOS], type=pa.timestamp("us"))
    t = pa.table({"event_id": pa.array(range(len(_NANOS))), "ts": ts})
    pq.write_table(t, str(d / "events.parquet"), version="2.6")
    return str(d)


def _conf_is_unset(spark) -> bool:
    return spark.conf.get(CONF_KEY, None) in (None, "false")


def test_micros_and_nanos_encodings_agree(spark, tmp_path):
    micros_dir = _write_events(tmp_path, "us")
    nanos_dir = _write_events(tmp_path, "ns")

    df_us = io.load_table(spark, micros_dir, "events")
    df_ns = io.load_table(spark, nanos_dir, "events")

    assert df_us.schema["ts"].dataType.typeName() == "timestamp"
    assert df_ns.schema["ts"].dataType.typeName() == "timestamp"

    vals_us = [r.ts for r in df_us.orderBy("event_id").collect()]
    vals_ns = [r.ts for r in df_ns.orderBy("event_id").collect()]
    assert vals_us == vals_ns
    # ns→µs is floor truncation: ...999_999_999 ns → ...999_999 µs
    assert vals_ns[1].microsecond == 999_999


def test_nanos_read_does_not_leak_session_conf(spark, tmp_path):
    assert _conf_is_unset(spark), "precondition: conf clean before the read"
    nanos_dir = _write_events(tmp_path, "ns")
    df = io.load_table(spark, nanos_dir, "events")
    assert _conf_is_unset(spark), "nanosAsLong leaked into the session"
    # the returned DataFrame still executes after the conf restore
    assert df.count() == len(_NANOS)


def test_micros_read_never_touches_conf(spark, tmp_path, monkeypatch):
    micros_dir = _write_events(tmp_path, "us")

    def _boom(*a, **k):  # pragma: no cover - only fires on regression
        raise AssertionError("conf.set called for a MICROS-generation read")

    monkeypatch.setattr(spark.conf, "set", _boom)
    df = io.load_table(spark, micros_dir, "events")
    assert df.count() == len(_NANOS)


def test_unrecognized_ts_encoding_raises(spark, tmp_path):
    d = tmp_path / "events_bad_dir"
    d.mkdir()
    t = pa.table(
        {"event_id": pa.array(range(3)), "ts": pa.array(["a", "b", "c"])}
    )
    pq.write_table(t, str(d / "events.parquet"))
    with pytest.raises(TypeError, match="unsupported parquet encoding"):
        io.load_table(spark, str(d), "events")
