"""Shared machinery for the segmented oracle differential (r13,
VERDICT r12 #3): the single parameterized sweep in test_oracle.py had
become the tier's wall floor (~545 s contended — no bin-packing can
beat the largest file), so the 241-oracle catalog is split into four
alphabetically CONTIGUOUS quarters, one shard-addressable file each
(test_oracle_q1..q4.py). Contiguous — not interleaved — because seam
families cluster alphabetically (the curation entries all share the
curation seams, etc.), so quartering by prefix keeps most
materialized-seam reuse inside one segment/shard instead of rebuilding
the same seam in four shard processes.

Each segment builds ONLY its quarter's frames (construction executes
the seam builds and bounded scalar collects) and runs the same
8-thread differential pool the monolithic sweep used (r10 measured 8
workers optimal; the stampede RLock already serializes nested seam
builds). test_plans.py remains the only full-catalog consumer."""

from __future__ import annotations

from bread_spark.queries import ORACLES

N_SEGMENTS = 4
ORACLE_CHECKED = sorted(ORACLES.keys())


def segment(k: int, n: int = N_SEGMENTS) -> list[str]:
    """Alphabetical quarter k (0-based) of the oracle-backed catalog."""
    q = (len(ORACLE_CHECKED) + n - 1) // n
    return ORACLE_CHECKED[k * q : (k + 1) * q]


def run_segment(
    spark, sf_dir: str, names: list[str]
) -> tuple[dict[str, tuple[bool, str]], dict[str, str]]:
    """Compute this segment's differentials with the 8-way pool; returns
    (verdicts, plan_texts). Frame construction stays serial (it nests
    seam builds behind the RLock); Spark actions then overlap across the
    pool's threads, each worker owning a private DuckDB connection.
    Plan texts ride along because the frames are in hand anyway — the
    per-segment no-cartesian sweep reads them, which is what let the
    eager whole-catalog catalog_plans fixture retire (r13)."""
    import concurrent.futures as cf
    import threading

    from bread_spark.queries import QUERIES
    from tests.oracle_utils import compare, duckdb_con

    frames = {name: QUERIES[name](spark, sf_dir) for name in names}
    plans = {
        name: df._jdf.queryExecution().executedPlan().toString()
        for name, df in frames.items()
    }
    local = threading.local()
    cons = []

    def one(name):
        con = getattr(local, "con", None)
        if con is None:
            con = local.con = duckdb_con(sf_dir)
            cons.append(con)
        try:
            return name, compare(frames[name], con, ORACLES[name])
        except Exception as e:  # surface as a red row, not a crashed pool
            return name, (False, f"exception while comparing: {e!r}")

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = dict(ex.map(one, names))
    for c in cons:
        c.close()
    return results, plans
