"""Bronze→silver blockchain parser — the Spark rebuild of reference
parse.py (DataParser), producing the four silver tables of SURVEY.md §1.2:

  blocks          P1/P6/P8: nested projection, date parts, casts
  tx_result       P2/P3, J1: struct flatten + broadcast block-time join
  log_attributes  R1/P4: safe JSON parse + 3-level explode (long/EAV)
  events (wide)   R5 intent: posexplode → unbase64 → occurrence → pivot

Design decisions (SURVEY.md §4.2):
- `log_attributes` (EAV) is the CANONICAL store; wide `events` is derived.
  The pivot's column set is data-dependent — deriving it per-run from the
  EAV table sidesteps parquet schema drift across batches.
- Ordinals (`msg_index`, `occurrence`) come from posexplode positions, not
  input row order (the reference's cumcount relies on pandas row order —
  non-reproducible; SURVEY R3).
- The reference's misaligned wide-events join (parse.py:173-175) is NOT
  replicated — we implement the intent: one row per (tx, occurrence), one
  column per type_key (SURVEY R5).
- Zero Python UDFs: from_json, unbase64, explode, pivot are all JVM-side.

Scale: every transform is a narrow map until the single pivot/groupBy
shuffle; the blocks-time join broadcasts the (small per-batch) blocks side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import (
    LOG_ATTRIBUTES_COLUMNS,
    LOG_SCHEMA,
    RAW_BLOCK_SCHEMA,
    RAW_TX_SCHEMA,
    TX_RESULT_COLUMNS,
)

__all__ = [
    "read_raw_blocks",
    "read_raw_txs",
    "parse_blocks",
    "parse_tx_result",
    "parse_log_attributes",
    "parse_events_wide",
    "attach_block_time",
    "run",
]


def read_raw_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Bronze block scan with the explicit schema (never infer; SRC10).

    PERMISSIVE mode: a malformed line yields a row of NULLs instead of
    failing the job — the engine-native form of the reference's
    "non-JSON → skip" transport rule (extract.py:361-366). Use
    `read_raw_with_corrupt` when the malformed payloads themselves need
    to be captured for repair.
    """
    return spark.read.schema(RAW_BLOCK_SCHEMA).json(path)


def read_raw_txs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RAW_TX_SCHEMA).json(path)


def read_raw_with_corrupt(
    spark: SparkSession, path: str, schema, corrupt_col: str = "_corrupt_record"
):
    """Bronze scan that dead-letters malformed lines instead of silently
    nulling them: returns (good_rows, corrupt_rows). The corrupt side
    carries the raw line for the repair job — the parse-path analog of
    the ingest client's error_heights ledger (SRC16/S3)."""
    from pyspark.sql.types import StringType, StructType

    with_corrupt = StructType(list(schema.fields)).add(corrupt_col, StringType())
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # capture file origin at scan time (input_file_name is empty once the
    # relation is cached), then cache so filtering on the corrupt column
    # is allowed (Spark forbids it directly on the lazy json relation)
    df = df.withColumn("__src", F.input_file_name()).cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col, "__src")
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col("__src").alias("source_file"), F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def _date_parts(ts_col):
    """day/month/year STRINGS — matches the reference's
    pd.to_period('D'|'M'|'Y').astype(str) semantics (parse.py:136-138)."""
    return [
        F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
        F.date_format(ts_col, "yyyy-MM").alias("month"),
        F.date_format(ts_col, "yyyy").alias("year"),
    ]


def parse_blocks(raw_blocks: DataFrame) -> DataFrame:
    """blocks silver table (reference parse.py:130-139).

    Nested projection (P1) + string→long cast (P8) + ns-RFC3339 timestamp
    parse. Spark TimestampType is µs — the ns tail is truncated, the
    documented divergence (SURVEY §1.5); `time_ns_frac` is NOT kept because
    no downstream model consumes sub-µs precision.
    """
    ts = F.to_timestamp(
        # normalize RFC3339: trim to µs precision, keep the zone designator
        F.regexp_replace("block.header.time", r"(\.\d{6})\d*(Z|[+-]\d{2}:\d{2})$", "$1$2")
    )
    return raw_blocks.select(
        F.col("block.header.height").cast("long").alias("height"),
        F.col("block.header.chain_id").alias("chain_id"),
        ts.alias("time"),
        F.col("block.header.proposer_address").alias("proposer_address"),
        *_date_parts(ts),
    )


def parse_tx_result(raw_txs: DataFrame) -> DataFrame:
    """tx_result silver table *before* the block-time join (reference
    parse.py:141-146): struct flatten (P2) + key columns."""
    return raw_txs.select(
        F.col("hash"),
        F.col("height").cast("long").alias("height"),
        F.col("tx_result.gas_wanted").alias("gas_wanted"),
        F.col("tx_result.gas_used").alias("gas_used"),
        F.col("tx_result.code").alias("code"),
        F.col("tx_result.codespace").alias("codespace"),
        F.col("tx_result.info").alias("info"),
    )


def parse_log_attributes(raw_txs: DataFrame) -> DataFrame:
    """log_attributes silver table — long/EAV (reference parse.py:148-162).

    The `log` string → from_json (P4: malformed → NULL row, the 'safe
    parse' semantics) → explode msgs → explode events → explode attributes
    (R1). Explode preserves sibling columns, so no np.repeat (R2) needed.
    """
    parsed = raw_txs.select(
        "hash",
        F.col("height").cast("long").alias("height"),
        F.from_json("tx_result.log", LOG_SCHEMA).alias("logs"),
    )
    return (
        parsed.select("hash", "height", F.explode("logs").alias("msg"))
        # P17: single-msg logs omit msg_index — fill 0 (the reference's
        # fillna(0) on the normalized logs, parse.py:154)
        .select("hash", "height", F.coalesce(F.col("msg.msg_index"), F.lit(0).cast("long")).alias("msg_index"), F.explode("msg.events").alias("event"))
        .select("hash", "height", "msg_index", F.col("event.type").alias("type"), F.explode("event.attributes").alias("attr"))
        .select("hash", "height", "msg_index", "type", F.col("attr.key").alias("key"), F.col("attr.value").alias("value"))
    )


def parse_events_attrs(raw_txs: DataFrame) -> DataFrame:
    """Typed-events attributes in EAV form with deterministic ordinals
    (the intent of reference parse.py:164-178, without its row
    misalignment — SURVEY R5).

    (event_pos, attr_pos) give a total order per tx; `occurrence` = rank
    of this attr among same-combined_key attrs of the tx, in that order.

    ZERO-SHUFFLE plan: a tx's events live in ONE array cell, so the
    ordinal is computed inside the array (count of earlier elements with
    the same combined_key — O(n²) interpreted-lambda steps on a
    few-element array) before a single explode. The first cut instead
    ran row_number() over Window.partitionBy(hash, height, combined_key)
    AFTER exploding — a full shuffle+sort of the EAV table, the largest
    frame in the pipeline, purely to recover per-tx information the
    pre-explode row still had. At 100 TB that shuffle is the difference
    between a map-only parse and re-clustering the corpus; equality with
    the window plan is pinned in
    tests/test_parse.py::test_events_attrs_matches_window_plan.
    """
    # flattened per-tx attr array: (event_pos, attr_pos, type, key, value)
    # with b64 decode (P5 — reference decode_base64 at parse.py:51-64)
    arr = F.expr(
        """
        flatten(transform(tx_result.events, (e, ep) ->
            transform(e.attributes, (a, ap) -> named_struct(
                'event_pos', ep,
                'attr_pos', ap,
                'type', e.type,
                'key', cast(unbase64(a.key) as string),
                'value', cast(unbase64(a.value) as string)))))
        """
    )
    # occurrence via earlier-same-key count; combined_key compared as the
    # same concat_ws string the output exposes (null key ≡ skipped part)
    occ = F.expr(
        """
        transform(sequence(0, size(arr) - 1), i -> named_struct(
            'event_pos', arr[i].event_pos,
            'attr_pos', arr[i].attr_pos,
            'type', arr[i].type,
            'key', arr[i].key,
            'value', arr[i].value,
            'combined_key', concat_ws('_', arr[i].type, arr[i].key),
            'occurrence', cast(size(filter(slice(arr, 1, i), y ->
                concat_ws('_', y.type, y.key) =
                concat_ws('_', arr[i].type, arr[i].key))) as bigint)))
        """
    )
    return (
        raw_txs.select(
            "hash",
            F.col("height").cast("long").alias("height"),
            arr.alias("arr"),
        )
        .filter(F.size("arr") > 0)
        .select("hash", "height", F.explode(occ).alias("r"))
        .select(
            "hash",
            "height",
            F.col("r.event_pos").alias("event_pos"),
            F.col("r.attr_pos").alias("attr_pos"),
            F.col("r.type").alias("type"),
            F.col("r.key").alias("key"),
            F.col("r.value").alias("value"),
            F.col("r.combined_key").alias("combined_key"),
            F.col("r.occurrence").alias("occurrence"),
        )
    )


def parse_events_wide(raw_txs: DataFrame, key_values: list[str] | None = None) -> DataFrame:
    """events silver table — wide/pivoted (reference parse.py:164-180).

    Dynamic pivot (R4): when `key_values` is None, the distinct key set
    is discovered and passed explicitly; production callers pass the
    known vocabulary to skip even that (SURVEY §4.2 — at 100 TB the
    distinct pass is one cheap column-pruned scan, done once and cached
    in the table's metadata).

    r13-opt: Spark's built-in dynamic pivot discovers values by running
    the pivot CHILD's plan again — here the full EAV build (JSON parse,
    base64 decode of keys AND values, the per-array occurrence ordinal
    lambda). The discovery pass needs none of that: a projection that
    decodes only event types and attribute keys yields the same
    distinct combined_key set, sorted exactly as Spark sorts discovered
    pivot values, with the same driver-side vocabulary-bounded collect
    the built-in path performs. One full EAV pass per build instead of
    two.
    """
    attrs = parse_events_attrs(raw_txs)
    grouped = attrs.groupBy("hash", "height", "occurrence")
    if key_values is None:
        keys_arr = F.expr(
            """
            flatten(transform(tx_result.events, e ->
                transform(e.attributes, a ->
                    concat_ws('_', e.type, cast(unbase64(a.key) as string)))))
            """
        )
        # Mirror the built-in dynamic pivot's spark.sql.pivotMaxValues
        # guard (ADVICE r13 #1): without it a pathological combined_key
        # vocabulary would collect unboundedly to the driver where
        # grouped.pivot(col) would have raised.
        max_values = int(
            raw_txs.sparkSession.conf.get("spark.sql.pivotMaxValues", "10000")
        )
        key_values = [
            r[0]
            for r in raw_txs.select(F.explode(keys_arr).alias("ck"))
            .distinct()
            .sort("ck")
            .limit(max_values + 1)
            .collect()
        ]
        if len(key_values) > max_values:
            raise ValueError(
                f"The pivot column combined_key has more than {max_values} "
                "distinct values; raise spark.sql.pivotMaxValues or pass "
                "key_values explicitly."
            )
    return grouped.pivot("combined_key", key_values).agg(F.first("value"))


def attach_block_time(df: DataFrame, blocks: DataFrame) -> DataFrame:
    """J1: enrich a silver table with blocks.{time,day,month,year} on
    height (reference parse.py:219-221, pd.merge inner). The blocks side
    of one batch is tiny relative to txs → broadcast, zero shuffle."""
    time_cols = blocks.select("height", "time", "day", "month", "year")
    return df.join(F.broadcast(time_cols), "height", "inner")


def run(
    spark: SparkSession,
    blocks_path: str,
    txs_path: str,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Full bronze→silver hop (reference DataParser.run, parse.py:202-226):
    parse all four tables, attach block time columns, optionally write
    each partitioned by year/month/day (SRC12)."""
    from .io import write_partitioned

    raw_blocks = read_raw_blocks(spark, blocks_path)
    raw_txs = read_raw_txs(spark, txs_path)

    blocks = parse_blocks(raw_blocks)
    tx_result = attach_block_time(parse_tx_result(raw_txs), blocks).select(*TX_RESULT_COLUMNS)
    log_attributes = attach_block_time(parse_log_attributes(raw_txs), blocks).select(
        *LOG_ATTRIBUTES_COLUMNS
    )
    events = attach_block_time(parse_events_wide(raw_txs), blocks)

    tables = {
        "blocks": blocks,
        "tx_result": tx_result,
        "log_attributes": log_attributes,
        "events": events,
    }
    if out_dir:
        for name, df in tables.items():
            write_partitioned(df, f"{out_dir}/{name}")
    return tables
