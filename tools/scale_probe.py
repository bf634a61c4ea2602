"""Scaling probe: time representative operators at 1×/2×/4× the sf
data (self-union with shifted keys/dates and per-replica text/vector
perturbation, so key cardinality scales with volume) and report the
observed scaling exponent log2(t4/t1)/2 — ~1.0 means linear.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import dedup as DD
from smartdatapipeline_spark.functions import similarity as SIM
from smartdatapipeline_spark.operators.kpi import run_daily_kpis
from smartdatapipeline_spark.operators.sessions import sessionize
from smartdatapipeline_spark.session import get_spark, read_events


def scaled_events(spark, sf_dir, n):
    ev = read_events(spark, sf_dir)
    reps = [
        ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {32 * i} DAYS"))
        .withColumn("user_id", F.col("user_id") + 1_000_000 * i)
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism)


def scaled_docs(spark, sf_dir, n):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = [
        d.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i)
        .withColumn("text", F.concat(F.col("text"), F.lit(f" replica{i}")))
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def scaled_emb(spark, sf_dir, n):
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = [
        e.withColumn("vec_id", F.col("vec_id") + 1_000_000 * i).withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x * (1.0 + 0.001 * i)),
        )
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "vec_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    from smartdatapipeline_spark.functions import text as TX
    from smartdatapipeline_spark.operators.forecast import forecast_drift

    def drift_series(n):
        ev = scaled_events(spark, sf_dir, n)
        g = run_daily_kpis(ev, metric_col="event_type", source_col=None)
        return g.select(
            "metric_date", "metric", F.col("value_sum").alias("value")
        )

    ops = {
        "kpi_daily": lambda n: run_daily_kpis(
            scaled_events(spark, sf_dir, n),
            metric_col="event_type",
            distinct_field="user_id",
            source_col=None,
        ),
        "sessionization": lambda n: sessionize(scaled_events(spark, sf_dir, n)),
        "minhash_pairs": lambda n: DD.minhash_candidate_pairs(
            scaled_docs(spark, sf_dir, n)
        ),
        "ann_bucketed_topk": lambda n: SIM.ann_bucketed_topk(
            scaled_emb(spark, sf_dir, n),
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
                F.col("vec_id") % 50 == 0
            ),
            k=10,
            nbits=8,
        ),
        # round-2 additions: scan-speed curation, corpus-bounded shuffle
        # pair, and the grouped-map model path (scales with series count —
        # user_id shifting multiplies metric×replica series via event_type)
        "clean_lines": lambda n: TX.clean_lines(scaled_docs(spark, sf_dir, n)),
        "rare_tokens": lambda n: TX.rare_token_fraction(
            scaled_docs(spark, sf_dir, n)
        ),
        "forecast_drift": lambda n: forecast_drift(drift_series(n)),
    }
    # scales far enough apart that real work dwarfs fixed per-query
    # overhead (~0.5-1s planning/scheduling at this sf); warm each op
    # untimed at 1x first so footer/codegen caches don't bill scale 2.
    lo, hi = 2, 32
    results = {}
    for name, build in ops.items():
        run(build(1))
        t_lo, t_hi = run(build(lo)), run(build(hi))
        exponent = round(math.log(t_hi / t_lo) / math.log(hi / lo), 2)
        results[name] = {f"t{lo}": t_lo, f"t{hi}": t_hi, "exponent": exponent}
        print(json.dumps({"op": name, **results[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
