"""Measure the CDC-driven incremental KPI refresh against a full gold
recompute (r10 VERDICT #1 'bench row showing sublinear cost'):

- bootstrap: silver snapshot table built from CHUNKED day-range appends
  (matching real ingest — every manifest entry keeps its tracked
  partition values, so day reads prune; a single mega-append past
  _MAX_TRACKED_VALUES would degrade pruning and is NOT the steady
  production shape), gold = full refresh (from_version=0 bootstrap).
- steady state, per rep: ONE new synthetic day arrives (the previous
  max day shifted forward), then time
  (a) refresh_gold_from_changes — change-feed scan of just the new
      files + manifest-pruned 1-day re-read + 1-partition overwrite;
  (b) the full-recompute alternative — rescan ALL of silver,
      re-aggregate every day, overwrite every partition.

Prints one JSON line. (a) is O(changed day), (b) is O(table): at 100 TB
the gap is the difference between a refresh that finishes and one that
doesn't. Run with sf0.1 (30 days), .scale_x10 (300), .scale_ev100
(3000) to see (b) grow with the table while (a) stays flat.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from smartdatapipeline_spark.operators.kpi import run_daily_kpis  # noqa: E402
from smartdatapipeline_spark.operators.pipeline import (  # noqa: E402
    refresh_gold_from_changes,
)
from smartdatapipeline_spark.session import get_spark, read_events  # noqa: E402
from smartdatapipeline_spark.sources import snapstore as SS  # noqa: E402

N_CHUNKS = 16


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(os.environ.get("CDC_PROBE_RUNS", "5"))
    spark = get_spark("cdc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ev = (
        read_events(spark, sf_dir)
        .select("ts", F.col("event_type").alias("metric"), "value")
        .withColumn("event_date", F.to_date("ts"))
    )
    days = sorted(
        r[0] for r in ev.select("event_date").distinct().collect()
    )
    max_day = days[-1]
    last_day = ev.filter(F.col("event_date") == F.lit(max_day)).localCheckpoint()
    n_last = last_day.count()
    print(
        f"table days={len(days)}, steady-state batch = 1 day ({n_last} rows)",
        file=sys.stderr,
    )

    work = tempfile.mkdtemp(prefix="cdcprobe-")
    silver = os.path.join(work, "silver")
    gold = os.path.join(work, "gold")
    inc_times, full_times = [], []
    try:
        # bootstrap: chunked appends (tracked partition values per entry)
        step = math.ceil(len(days) / N_CHUNKS)
        # refresh after each chunk so GOLD is also made of bounded
        # batches — a single mega-batch gold past _MAX_TRACKED_VALUES
        # would be rewritten wholesale as residue on every 1-day
        # overwrite, which no production table would do
        for c in range(0, len(days), step):
            lo, hi = days[c], days[min(c + step, len(days)) - 1]
            SS.append(
                ev.filter(F.col("event_date").between(F.lit(lo), F.lit(hi))),
                silver,
                "event_date",
            )
            refresh_gold_from_changes(spark, silver, gold)

        for i in range(reps):
            # a fresh day arrives (yesterday's shape, shifted forward)
            batch = last_day.withColumn(
                "ts", F.col("ts") + F.make_interval(days=F.lit(i + 1))
            ).withColumn("event_date", F.to_date("ts"))
            SS.append(batch, silver, "event_date")

            t0 = time.perf_counter()
            r = refresh_gold_from_changes(spark, silver, gold)
            inc_times.append(time.perf_counter() - t0)
            assert r["refreshed_days"] == 1, r

            t0 = time.perf_counter()
            full_gold = run_daily_kpis(
                SS.read_table(spark, silver).drop("event_date")
            )
            SS.overwrite_partitions(full_gold, gold, "metric_date")
            full_times.append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    inc_times.sort()
    full_times.sort()
    med_inc = inc_times[len(inc_times) // 2]
    med_full = full_times[len(full_times) // 2]
    print(json.dumps({
        "sf_dir": sf_dir,
        "runs": reps,
        "table_days": len(days),
        "incremental_refresh_sec": round(med_inc, 4),
        "full_recompute_sec": round(med_full, 4),
        "speedup": round(med_full / med_inc, 2),
        "incremental_all": [round(x, 3) for x in inc_times],
        "full_all": [round(x, 3) for x in full_times],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
