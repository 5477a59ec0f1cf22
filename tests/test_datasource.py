"""tendermint_rpc Python DataSource: partitioned RPC range scan feeding
the parse path (SURVEY.md §4.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bread_spark import parse as P
from bread_spark.schemas import RAW_BLOCK_SCHEMA
from bread_spark.sources.tendermint import register
from tests.fixtures import START_HEIGHT, make_blocks, make_txs

N = 30
END = START_HEIGHT + N - 1
TRANSPORT = "tests.fixtures:canonical_rpc_transport"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark, protocol, chunk=10):
    return (
        spark.read.format("tendermint_rpc")
        .option("url", "http://node")
        .option("protocol", protocol)
        .option("start", START_HEIGHT)
        .option("end", END)
        .option("chunk", chunk)
        .option("per_page", 7)
        .option("transport", TRANSPORT)
        .load()
    )


def test_block_scan_partitioned(spark):
    df = _read(spark, "blocks", chunk=10)
    assert df.rdd.getNumPartitions() == 3  # 30 heights / 10 per chunk
    rows = df.collect()
    assert len(rows) == N
    assert sorted(r["height"] for r in rows) == list(range(START_HEIGHT, END + 1))


def test_tx_scan_matches_fixture(spark):
    blocks = make_blocks(N)
    txs = make_txs(blocks)
    df = _read(spark, "txs", chunk=13)
    assert df.count() == len(txs)


def test_range_pushdown_via_options(spark):
    df = (
        spark.read.format("tendermint_rpc")
        .option("url", "http://node")
        .option("start", START_HEIGHT + 5)
        .option("end", START_HEIGHT + 9)
        .option("chunk", 2)
        .option("transport", TRANSPORT)
        .load()
    )
    assert df.count() == 5


def test_source_feeds_parse_path(spark):
    """RPC source → from_json → parse_blocks equals the landing-zone path."""
    raw = _read(spark, "blocks").select(
        F.from_json("payload", RAW_BLOCK_SCHEMA).alias("doc")
    ).select("doc.*")
    silver = P.parse_blocks(raw)
    got = {r["height"]: r for r in silver.collect()}
    assert len(got) == N
    blocks = make_blocks(N)
    first = blocks[0]["block"]["header"]
    assert got[int(first["height"])]["chain_id"] == first["chain_id"]
    assert got[int(first["height"])]["proposer_address"] == first["proposer_address"]
