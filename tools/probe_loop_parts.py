"""Single-session alternating A/B for the r15 loop-partition change:
each rep cycles through SPARK_GRAFT_LOOP_PARTS settings (the env knob
``session.loop_shuffle_partitions`` reads per call), so every setting
sees the same window drift. '32' reproduces the pre-r15 behavior (the
session default on local[32]); 'auto' is the derived value.

Usage:
    python tools/probe_loop_parts.py [--runs 4] [--settings 32,auto,8,4]
        query [query ...]
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
from smartdatapipeline_spark.cachetrack import release_plan_caches  # noqa: E402
from smartdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--settings", default="32,auto")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    settings = args.settings.split(",")

    spark = get_spark("probe-loop-parts")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for f in sorted(os.listdir(args.sf_dir)):
        if f.endswith(".parquet"):
            spark.read.parquet(os.path.join(args.sf_dir, f)).limit(1).count()

    out: dict[str, dict] = {}
    times: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.runs):
        for setting in settings:
            if setting == "auto":
                os.environ.pop("SPARK_GRAFT_LOOP_PARTS", None)
            else:
                os.environ["SPARK_GRAFT_LOOP_PARTS"] = setting
            for name in args.queries:
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf_dir)
                try:
                    df.write.format("noop").mode("overwrite").save()
                finally:
                    release_plan_caches(df)
                times.setdefault((name, setting), []).append(
                    time.perf_counter() - t0
                )
    os.environ.pop("SPARK_GRAFT_LOOP_PARTS", None)
    for (name, setting), reps in times.items():
        out.setdefault(name, {})[setting] = {
            "median": round(statistics.median(reps), 4),
            "min": round(min(reps), 4),
            "reps": [round(r, 3) for r in sorted(reps)],
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
