"""Driver-catalog registration of the reference's own gold DAG
(dbt/old_models/** — SURVEY §2 rows A1-A3, J2, P9-P16, S-OP1, W1).

The driver's oracle gate only sees tables `region..embeddings`, so the
legacy `indexer` inputs (txs, logs — reference _indexer.yml:5-38) are
DERIVED deterministically from the `events` table, with the identical
derivation spelled out in the DuckDB oracle SQL:

    txhash     = 'TX' || event_id
    msg_index  = event_id % 3
    gas_used   = floor(value * 1000)
    parsed     = JSON of message_module / transfer_amount / packet columns:
        message_module:  purchase → [ibc_channel, ibc_channel]  (inflow)
                         click    → [transfer, ibc_channel]     (outflow)
                         else     → [bank]                      (no match)
        transfer_amount: [ floor(value*100) || denom ] where denom is
            'uakt' (even users) or 'ibc/<d>ABC123' (odd users) — the
            digit-containing voucher denom exercises the leading-digit
            regexp rule (P9/P10) inside the gate.

The Spark side feeds the derivation through the REAL models
(models_ibc.ibc_transfers_in/out/...): the JSON string goes through
from_json (P4/P12), arrays through arrays_zip→explode (P13), the amount
split through the regexes (P9/P10) — so every green row here certifies
the actual model code path, not a shortcut.

The oracle replays the same regexes on the same concatenated strings
(not the algebraic shortcut), so regex semantics are differentially
checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import models_ibc as M
from .io import load_table


def _legacy_from_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(logs, txs) legacy frames derived deterministically from events."""
    txhash = F.concat(F.lit("TX"), F.col("event_id").cast("string"))
    txs = events.select(
        txhash.alias("txhash"),
        F.col("ts").alias("timestamp"),
        F.floor(F.col("value") * 1000).cast("long").alias("gas_used"),
    )
    denom = F.when(F.col("user_id") % 2 == 0, F.lit("uakt")).otherwise(
        F.concat(F.lit("ibc/"), (F.col("user_id") % 10).cast("string"), F.lit("ABC123"))
    )
    amount = F.concat(F.floor(F.col("value") * 100).cast("string"), denom)
    module = (
        F.when(
            F.col("event_type") == "purchase",
            F.array(F.lit("ibc_channel"), F.lit("ibc_channel")),
        )
        .when(
            F.col("event_type") == "click",
            F.array(F.lit("transfer"), F.lit("ibc_channel")),
        )
        .otherwise(F.array(F.lit("bank")))
    )
    chan = F.array(F.concat(F.lit("channel-"), (F.col("user_id") % 5).cast("string")))
    sender = F.array(F.concat(F.lit("addr"), F.col("user_id").cast("string")))
    receiver = F.array(F.concat(F.lit("addr"), (F.col("user_id") + 1).cast("string")))
    port = F.array(F.lit("transfer"))
    parsed = F.to_json(
        F.create_map(
            F.lit("message_module"), module,
            F.lit("transfer_amount"), F.array(amount),
            F.lit("fungible_token_packet_sender"), sender,
            F.lit("fungible_token_packet_receiver"), receiver,
            F.lit("recv_packet_packet_src_port"), port,
            F.lit("recv_packet_packet_src_channel"), chan,
            F.lit("recv_packet_packet_dst_port"), port,
            F.lit("recv_packet_packet_dst_channel"), chan,
            F.lit("ibc_transfer_sender"), sender,
            F.lit("ibc_transfer_receiver"), receiver,
            F.lit("send_packet_packet_src_port"), port,
            F.lit("send_packet_packet_src_channel"), chan,
            F.lit("send_packet_packet_dst_port"), port,
            F.lit("send_packet_packet_dst_channel"), chan,
        )
    )
    logs = events.select(
        txhash.alias("txhash"),
        (F.col("event_id") % 3).alias("msg_index"),
        parsed.alias("parsed"),
    )
    return logs, txs


def _legacy(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    return _legacy_from_events(load_table(spark, sf_dir, "events"))


_AMOUNT_COLS = (
    "transfer_amount",
    "amount_over_direction",
    "total_amount",
    "cum_amount",
    "total_gas_used",
)


def _bigintify(df: DataFrame) -> DataFrame:
    """CATALOG-BOUNDARY ONLY: cast wide-decimal amount columns to BIGINT.

    The real models keep DECIMAL(38,0) (overflow policy documented in
    models_ibc.py). The driver hashes *values by representation*, and
    DuckDB returns wide DECIMAL / HUGEINT sums as float64 while Spark
    renders Decimal('3815') — identical values, divergent hashes
    (diagnosed in VERDICT r2 #1, values verified identical at sf0.01).
    Test-scale amounts fit comfortably in int64; both sides of the
    differential are cast to BIGINT here so the comparison is on value.
    """
    for c in _AMOUNT_COLS:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("long"))
    return df


def ibc_transfers_in_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.ibc_transfers_in(logs, txs))


def ibc_transfers_out_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.ibc_transfers_out(logs, txs))


def ibc_transfers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.ibc_transfers(logs, txs))


def daily_ibc_transfers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.daily_ibc_transfers(logs, txs))


def hourly_ibc_transfers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.hourly_ibc_transfers(logs, txs))


def daily_cum_ibc_transfers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.daily_cum_ibc_transfers(logs, txs))


def hourly_cum_ibc_transfers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs, txs = _legacy(spark, sf_dir)
    return _bigintify(M.hourly_cum_ibc_transfers(logs, txs))


def gas_used_per_day_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, txs = _legacy(spark, sf_dir)
    return _bigintify(M.gas_used_per_day(txs))


QUERIES = {
    "ibc_transfers_in": ibc_transfers_in_q,
    "ibc_transfers_out": ibc_transfers_out_q,
    "ibc_transfers": ibc_transfers_q,
    "daily_ibc_transfers": daily_ibc_transfers_q,
    "hourly_ibc_transfers": hourly_ibc_transfers_q,
    "daily_cum_ibc_transfers": daily_cum_ibc_transfers_q,
    "hourly_cum_ibc_transfers": hourly_cum_ibc_transfers_q,
    "gas_used_per_day": gas_used_per_day_q,
}


# --------------------------------------------------------------------------
# DuckDB oracles: identical derivation + the reference SQL semantics.
# --------------------------------------------------------------------------

_LEGACY_CTE = """
    txs AS (
        SELECT 'TX' || CAST(event_id AS VARCHAR) AS txhash,
               ts AS "timestamp",
               CAST(FLOOR(value * 1000) AS BIGINT) AS gas_used
        FROM events
    ),
    logs AS (
        SELECT 'TX' || CAST(event_id AS VARCHAR) AS txhash,
               event_id % 3 AS msg_index,
               CASE WHEN event_type = 'purchase' THEN ['ibc_channel','ibc_channel']
                    WHEN event_type = 'click' THEN ['transfer','ibc_channel']
                    ELSE ['bank'] END AS message_module,
               CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR) ||
                   CASE WHEN user_id % 2 = 0 THEN 'uakt'
                        ELSE 'ibc/' || CAST(user_id % 10 AS VARCHAR) || 'ABC123'
                   END AS amt_str,
               'addr' || CAST(user_id AS VARCHAR) AS sender0,
               'addr' || CAST(user_id + 1 AS VARCHAR) AS receiver0,
               'channel-' || CAST(user_id % 5 AS VARCHAR) AS chan
        FROM events
    )
"""

_IN_CTE = """
    in_rows AS (
        SELECT l.txhash, l.msg_index,
               CAST(regexp_extract(amt_str, '^([0-9]*)', 1) AS BIGINT) AS transfer_amount,
               regexp_replace(amt_str, '^[0-9]*', '') AS transfer_denom,
               sender0 AS sender, receiver0 AS receiver,
               'transfer' AS src_port, chan AS src_channel,
               'transfer' AS dst_port, chan AS dst_channel,
               t."timestamp"
        FROM logs l LEFT JOIN txs t ON l.txhash = t.txhash
        WHERE message_module = ['ibc_channel','ibc_channel']
    )
"""

_OUT_CTE = """
    out_rows AS (
        SELECT l.txhash, l.msg_index,
               CAST(regexp_extract(amt_str, '^([0-9]*)', 1) AS BIGINT) AS transfer_amount,
               regexp_replace(amt_str, '^[0-9]*', '') AS transfer_denom,
               sender0 AS sender, receiver0 AS receiver,
               'transfer' AS src_port, chan AS src_channel,
               'transfer' AS dst_port, chan AS dst_channel,
               t."timestamp"
        FROM logs l LEFT JOIN txs t ON l.txhash = t.txhash
        WHERE list_contains(message_module, 'transfer')
          AND list_contains(message_module, 'ibc_channel')
    )
"""

_FLOWS_CTE = f"""
    {_IN_CTE},
    {_OUT_CTE},
    flows AS (
        SELECT *, transfer_amount AS amount_over_direction FROM in_rows
        UNION
        SELECT *, CAST(-transfer_amount AS BIGINT) AS amount_over_direction FROM out_rows
    )
"""


def _grain_oracle(grain: str) -> str:
    # CAST(SUM(..) AS BIGINT): DuckDB SUM(BIGINT) widens to HUGEINT, which
    # round-trips to the driver as float64 — same representation bug as
    # wide decimals (VERDICT r2 #1); the Spark wrapper casts to long too.
    return f"""
        WITH {_LEGACY_CTE}, {_FLOWS_CTE}
        SELECT CAST(date_trunc('{grain}', "timestamp") AS TIMESTAMP) AS {grain},
               transfer_denom,
               CAST(SUM(amount_over_direction) AS BIGINT) AS total_amount
        FROM flows GROUP BY 1, 2
    """


def _cum_oracle(grain: str) -> str:
    # MATERIALIZED: DuckDB 1.0 computes the window with an unstable row
    # order when fused directly onto the aggregation subquery (found while
    # differential-testing, tests/test_ibc_models.py); materializing the
    # grain aggregate first behaves.
    return f"""
        WITH {_LEGACY_CTE}, {_FLOWS_CTE},
        grains AS MATERIALIZED (
            SELECT CAST(date_trunc('{grain}', "timestamp") AS TIMESTAMP) AS {grain},
                   transfer_denom,
                   CAST(SUM(amount_over_direction) AS BIGINT) AS total_amount
            FROM flows GROUP BY 1, 2
        )
        SELECT {grain}, transfer_denom, total_amount,
               CAST(SUM(total_amount) OVER (PARTITION BY transfer_denom
                   ORDER BY {grain} ASC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_amount
        FROM grains
    """


ORACLE_SQL = {
    "ibc_transfers_in": f"WITH {_LEGACY_CTE}, {_IN_CTE} SELECT * FROM in_rows",
    "ibc_transfers_out": f"WITH {_LEGACY_CTE}, {_OUT_CTE} SELECT * FROM out_rows",
    "ibc_transfers": f"WITH {_LEGACY_CTE}, {_FLOWS_CTE} SELECT * FROM flows",
    "daily_ibc_transfers": _grain_oracle("day"),
    "hourly_ibc_transfers": _grain_oracle("hour"),
    "daily_cum_ibc_transfers": _cum_oracle("day"),
    "hourly_cum_ibc_transfers": _cum_oracle("hour"),
    "gas_used_per_day": f"""
        WITH {_LEGACY_CTE}
        SELECT CAST(date_trunc('day', "timestamp") AS TIMESTAMP) AS day,
               CAST(SUM(gas_used) AS BIGINT) AS total_gas_used
        FROM txs GROUP BY 1
    """,
}
