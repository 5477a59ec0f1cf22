"""Generate CORRECTNESS_FULL_r{N}.json — the whole-catalog sf0.01
differential in the driver's own per-query shape (VERDICT r9 #2: the
50-slot driver window cannot carry certification currency for a
200+-oracle catalog, so each round commits one full sim).

Usage:  python scripts/correctness_full.py 10     # writes CORRECTNESS_FULL_r10
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
            python scripts/correctness_full.py 11 SF01   # CORRECTNESS_SF01_r11
The optional second argument names the artifact (default FULL) — the
SF01 form commits the sf0.1 whole-catalog sweep per VERDICT r10 #4.
Rows-only entries (no declared oracle) record the documented weaker
check: the Spark frame must materialize with a stable schema; the
`err` field carries the by-design note, mirroring the driver.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

ROWS_ONLY_NOTE = "rows-only (no oracle declared; weaker check by design)"


def main() -> None:
    rnd = int(sys.argv[1])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from bread_spark.session import get_spark
    from oracle_utils import duckdb_con, compare

    spark = get_spark(app_name="correctness-full")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf)
    queries = entry.queries()
    oracles = entry.oracle_sql()

    out: dict[str, dict] = {}
    failures = 0
    for name, fn in queries.items():
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf)
            if name in oracles:
                ok, msg = compare(sdf, con, oracles[name])
                # compare() re-runs both sides; recover the counts for
                # the driver-shaped record
                n_spark = sdf.count()
                n_oracle = con.execute(
                    f"SELECT COUNT(*) FROM ({oracles[name]})"
                ).fetchone()[0]
                rec.update(
                    rows_match=n_spark == n_oracle,
                    schema_match=ok or "schema" not in msg,
                    hash_match=ok,
                    spark_rows=n_spark,
                    oracle_rows=n_oracle,
                    err=None if ok else msg[:500],
                )
                if not ok:
                    failures += 1
            else:
                n_spark = sdf.count()
                rec.update(
                    rows_match=True,
                    schema_match=True,
                    hash_match=None,
                    spark_rows=n_spark,
                    err=ROWS_ONLY_NOTE,
                )
        except Exception as ex:  # noqa: BLE001 — record, don't abort the sweep
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
            failures += 1
        out[name] = rec

    label = sys.argv[2] if len(sys.argv) > 2 else "FULL"
    path = os.path.join(ROOT, f"CORRECTNESS_{label}_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{path}: {len(out)} entries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
