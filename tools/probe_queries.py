"""Clean-window re-probe for bench adjudications: time the named
registry queries (and/or streaming stages) with N warm reps each and
print one JSON line — the evidence a BENCH_ADJUDICATIONS.md entry
cites when deciding drift vs regression for a >25% mover.

Usage:
    python tools/probe_queries.py [--runs 5] [--sf-dir DIR]
        [--streaming] query [query ...]

``--streaming`` additionally runs the bench's streaming stage group
(bench.py streaming_e2e) once per rep and reports per-stage medians,
so the noisiest fifth of the board gets the same repeated-measure
treatment as everything else.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
import bench  # noqa: E402
from smartdatapipeline_spark.cachetrack import release_plan_caches  # noqa: E402
from smartdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # same warm discipline as bench.py: JVM + codegen, Python workers,
    # parquet footers — so rep 1 isn't a cold-start artifact
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for f in sorted(os.listdir(args.sf_dir)):
        if f.endswith(".parquet"):
            spark.read.parquet(os.path.join(args.sf_dir, f)).limit(1).count()

    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"probe: no such query {name!r}", file=sys.stderr)
            continue
        reps: list[float] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            finally:
                release_plan_caches(df)
            reps.append(time.perf_counter() - t0)
        reps.sort()
        out[name] = {
            "median": round(statistics.median(reps), 4),
            "min": round(reps[0], 4),
            "max": round(reps[-1], 4),
            "runs": args.runs,
        }

    if args.streaming:
        stage_reps: dict[str, list[float]] = {}
        for _ in range(args.runs):
            errors: dict[str, str] = {}
            t = bench.streaming_e2e(spark, args.sf_dir, errors)
            for k, v in t.items():
                stage_reps.setdefault(k, []).append(v)
            for k, e in errors.items():
                print(f"probe: {k} FAILED: {e}", file=sys.stderr)
        for k, reps in stage_reps.items():
            reps.sort()
            out[k] = {
                "median": round(statistics.median(reps), 4),
                "min": round(reps[0], 4),
                "max": round(reps[-1], 4),
                "runs": len(reps),
            }

    print(json.dumps({"sf_dir": args.sf_dir, "probes": out}, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
