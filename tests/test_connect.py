"""Spark Connect serving bring-up (SRC17): the one-command endpoint must
come up and listen; the full client round-trip runs only where grpcio is
installed (skip-marked — the container ships the server-side jar but not
the Python client stack)."""

from __future__ import annotations

import importlib.util
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from tests.conftest import SF_DIR


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def connect_server(tmp_path_factory):
    """The real launch command, in its own process (plugins must load at
    JVM start, so it can't share the pytest session's JVM)."""
    port = _free_port()
    ready = str(tmp_path_factory.mktemp("connect") / "ready")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "bread_spark.connect",
            "--port",
            str(port),
            "--sf-dir",
            SF_DIR,
            "--ready-file",
            ready,
        ],
        env={**os.environ, "SPARK_GRAFT_CPUS": "2"},
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    # 300 s: the spawn competes with 4 shard JVMs under the sharded
    # nightly tier, and the contended-host mode (PERF_NOTES) stretches
    # JVM+session startup well past the old 120 s budget
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline and not os.path.exists(ready):
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            pytest.fail(f"connect server exited early:\n{out[-3000:]}")
        time.sleep(0.5)
    if not os.path.exists(ready):
        proc.kill()
        pytest.fail("connect server never became ready")
    yield port
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()


@pytest.mark.nightly  # server-spawn probe; default tier keeps the serve.py registry pins (r9 tier split)
def test_connect_endpoint_listens(connect_server):
    """Test-at-distance without grpcio: the gRPC port accepts TCP."""
    with socket.create_connection(("127.0.0.1", connect_server), timeout=5):
        pass


@pytest.mark.nightly  # spawns the server; pairs with the listen probe (r9 tier split)
@pytest.mark.skipif(
    # skipif BEFORE fixture resolution: the old importorskip inside the
    # body paid the full 10 s server spawn just to skip (r9 finding)
    importlib.util.find_spec("grpc") is None,
    reason="grpcio not installed",
)
def test_connect_client_round_trip(connect_server):
    """Full SQL round-trip over the wire (needs the grpcio client stack)."""
    pytest.importorskip("grpc")
    from bread_spark.connect import connect_client

    remote = connect_client(connect_server)
    rows = remote.sql("SELECT COUNT(1) AS n FROM nation").collect()
    assert rows[0]["n"] > 0
    remote.stop()
