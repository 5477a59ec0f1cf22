"""Per-query optimization probe (r13; r14: --plans-dir).

Times a chosen subset of catalog queries with the SAME methodology as
bench.py (cold touch, then WARM_PASSES back-to-back count() passes,
median) and writes each query's ``explain("formatted")`` to
``plans/r13/<name>_<tag>.txt`` so plan-shape claims are verifiable
without running Spark.

Usage:
    python scripts/opt_probe.py --tag before name1 name2 ...
    python scripts/opt_probe.py --tag before --top 30     # slowest 30 per BENCH_DETAIL.json
    python scripts/opt_probe.py --no-plans name1          # timing only

Prints one JSON line: {"queries": {name: median_sec}, "probe_1c": ...,
"probe_mc": ..., "tag": ...}.
"""
from __future__ import annotations

import argparse
import gc
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM_PASSES = int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "3"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-dir", default="r14")
    ap.add_argument("--passes", type=int, default=WARM_PASSES)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    names = list(args.names)
    if args.top:
        with open(os.path.join(repo, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)["queries"]
        ranked = sorted(detail.items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    from bench import _host_probes  # noqa: E402
    from bread_spark.queries import QUERIES  # noqa: E402
    from bread_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="bread-spark-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(repo, "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    # cold touch (seam builds, JIT) — untimed for the medians
    for name in names:
        if name == "parse_events_wide":
            continue
        spark.sparkContext.setJobDescription(f"cold: {name}")
        QUERIES[name](spark, sf_dir).count()

    probe_1c, probe_mc = _host_probes()

    timings: dict[str, float] = {}
    for name in names:
        if name == "parse_events_wide":
            continue
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        runs = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"warm{i}: {name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        if not args.no_plans:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())

    probe_1c2, probe_mc2 = _host_probes()
    print(
        json.dumps(
            {
                "tag": args.tag,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
                "probe_1c": probe_1c,
                "probe_mc": probe_mc,
                "probe_1c_after": probe_1c2,
                "probe_mc_after": probe_mc2,
                "passes": args.passes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
