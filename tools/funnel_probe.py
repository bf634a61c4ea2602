"""Round-10 funnel cache adjudication probe: time the funnel query at
sf0.1 under three cache strategies — all step frames cached (round-9
code), only the step-1 frame cached, and no caching (round-8 code) —
5 warm reps each, medians printed as one JSON line. Evidence for the
BENCH_ADJUDICATIONS.md funnel entry."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from smartdatapipeline_spark.session import get_spark, read_events  # noqa: E402


def funnel_variant(events, mode, steps=("view", "click", "purchase"),
                   horizon_days=7):
    cache_all = mode == "all"
    cache_s1 = mode in ("all", "step1")
    cached = []
    f0 = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t1"))
        .withColumn("_tprev", F.col("_t1"))
    )
    if cache_s1:
        f0 = f0.cache()
        cached.append(f0)
    frames = [f0]
    horizon_end = F.col("_t1") + F.expr(f"INTERVAL {horizon_days} DAYS")
    for s in steps[1:]:
        step_ev = events.filter(F.col("event_type") == s).select(
            "user_id", F.col("ts").alias("_ts")
        )
        nxt = (
            frames[-1]
            .join(step_ev, "user_id")
            .filter((F.col("_ts") > F.col("_tprev")) & (F.col("_ts") <= horizon_end))
            .groupBy("user_id", "_t1")
            .agg(F.min("_ts").alias("_tprev"))
        )
        if cache_all:
            nxt = nxt.cache()
            cached.append(nxt)
        frames.append(nxt)
    labeled = [
        f.select(
            F.lit(i + 1).alias("step_index"),
            F.lit(s).alias("step"),
            F.col("user_id"),
        )
        for i, (s, f) in enumerate(zip(steps, frames))
    ]
    u = labeled[0]
    for l in labeled[1:]:
        u = u.unionByName(l)
    per_step = u.groupBy("step_index", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    if cache_all:
        per_step = per_step.cache()
        cached.append(per_step)
    n1 = per_step.filter(F.col("step_index") == 1).select(
        F.col("n_users").alias("_n1")
    )
    out = (
        per_step.crossJoin(F.broadcast(n1))
        .withColumn("share", F.col("n_users") / F.col("_n1").cast("double"))
        .select("step_index", "step", "n_users", "share")
    )
    return out, cached


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("funnel-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    events = read_events(spark, sf_dir)
    events.limit(1).count()

    out = {}
    for mode in ("all", "step1", "none"):
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            df, cached = funnel_variant(events, mode)
            rows = df.collect()
            reps.append(round(time.perf_counter() - t0, 4))
            for c in cached:
                c.unpersist()
            assert len(rows) == 3
        out[mode] = {
            "median": round(statistics.median(reps), 4),
            "min": min(reps),
            "max": max(reps),
            "runs": reps,
        }
    print(json.dumps({"funnel_variants": out, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
