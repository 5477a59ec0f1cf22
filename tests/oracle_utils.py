"""Differential-comparison helpers mirroring the driver's DuckDB oracle:
row count + column names + order-insensitive value comparison over the
**pandas materializations** of both sides — bit-faithful to the driver's
hash protocol, not to the typed values.

The distinction matters (round-5 lesson): the driver materializes DuckDB
results via `.df()` and Spark results via `toPandas()`, then canonicalizes
and hashes the pandas frames. At that layer
  - DuckDB HUGEINT (the result type of SUM(BIGINT)) and DECIMAL become
    **float64**, so an uncast oracle SUM hashes as `4950.0` against
    Spark's int64 `4950` and fails even though the typed values agree;
  - array-typed cells become np.ndarray, which pandas' row-sort
    (factorize) cannot hash → the driver records `err`.
A typed `.fetchall()` comparison (the old gate here) is blind to both
classes. `compare()` therefore canonicalizes pandas frames: columns
sorted by name, rows sorted via `DataFrame.sort_values` over all columns
(reproducing the driver's unhashable-list failure mode), and each cell
rendered to a string that preserves the int/float distinction."""

from __future__ import annotations

import datetime
import math
import os
from typing import Any

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — the
    order-insensitive canonical form the driver hashes."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def _col_strings(ser: pd.Series) -> list[str]:
    """Stringify one column the way pandas does (`astype(str)`), because the
    driver hashes pandas-level string renderings. Key behaviors this keeps:
      - float64 `4950.0` vs int64 `4950` DIFFER (the HUGEINT red-row class);
      - an all-midnight datetime64 column renders date-only ('2024-01-01'),
        so a Spark string `day` column matches a DuckDB DATE_TRUNC column
        (observed driver-green in r5's cum_txs_per_day);
      - null-likes (None / NaN / NaT) all render as one token 'None': a
        CUBE null lands in an object column on the Spark side but as NaT in
        DuckDB's datetime64 materialization, and the driver hashes those
        equal (value_cube_by_type_day was driver-green in r5).
    Object columns get a per-cell str() with a bytes→hex escape (astype(str)
    raises UnicodeDecodeError on non-UTF-8 bytes; both engines materialize
    binary as bytes/bytearray, so hex is engine-symmetric)."""
    if ser.dtype == object:
        out = []
        for v in ser:
            if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                out.append("None")
            elif isinstance(v, (bytes, bytearray)):
                out.append(bytes(v).hex())
            else:
                out.append(str(v))
        return out
    strings = ser.astype(str).tolist()
    mask = ser.isna().tolist()
    return ["None" if m else s for s, m in zip(strings, mask)]


def driver_canon(pdf: pd.DataFrame) -> list[tuple]:
    """The driver's canonical form: columns sorted by name, rows sorted via
    `sort_values` over every column (this is the step that raises
    `TypeError: unhashable type` on array cells, exactly as the driver's
    `_canon` does), then columns stringified pandas-style."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    cols = [_col_strings(pdf[c]) for c in pdf.columns]
    return [tuple(col[i] for col in cols) for i in range(len(pdf))]


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    """The driver-faithful gate: compare the pandas materializations of the
    Spark result (`toPandas`) and the DuckDB oracle (`.df()`)."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, (
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"duckdb={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        return False, f"row count differs: spark={len(s_pdf)} duckdb={len(d_pdf)}"
    try:
        sn = driver_canon(s_pdf)
    except TypeError as e:  # the driver records this as `err`
        return False, f"spark side not canonicalizable (driver would err): {e}"
    try:
        dn = driver_canon(d_pdf)
    except TypeError as e:
        return False, f"oracle side not canonicalizable (driver would err): {e}"
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"


def compare_typed(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """The pre-r6 typed comparison (`collect` vs `fetchall`). Kept as a
    diagnostic: a query that passes here but fails `compare` has a pure
    representation bug (cast the oracle), not a value bug."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
