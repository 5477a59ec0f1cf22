"""Oracle-verify a named subset of catalog queries (r13 optimization
round tooling): after restructuring a query's plan, prove result
equivalence against its DuckDB oracle at one or more scale factors
before moving on.

Usage:
    python scripts/verify_subset.py name1 name2 ...
    SPARK_GRAFT_SF_DIRS=/root/testdata/sf0.001,/root/testdata/sf0.01 \
        python scripts/verify_subset.py name1 ...

Rows-only entries (no declared oracle) get the weaker materialize
check, mirroring the driver. Exits non-zero on any failure.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    names = sys.argv[1:]
    sf_dirs = os.environ.get(
        "SPARK_GRAFT_SF_DIRS",
        "/root/testdata/sf0.001,/root/testdata/sf0.01",
    ).split(",")

    import __spark_entry__ as entry
    from bread_spark.session import get_spark
    from oracle_utils import duckdb_con, compare

    spark = get_spark(app_name="verify-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    failures = 0
    for sf in sf_dirs:
        con = duckdb_con(sf)
        from bread_spark.plans.materialize import clear_materialized_frames

        clear_materialized_frames()
        for name in names:
            sdf = queries[name](spark, sf)
            if name in oracles:
                ok, msg = compare(sdf, con, oracles[name])
                status = "OK" if ok else f"FAIL: {msg}"
            else:
                n = sdf.count()
                status = f"OK (rows-only, {n} rows)"
                ok = True
            print(f"{os.path.basename(sf)} {name}: {status}")
            if not ok:
                failures += 1
        con.close()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
