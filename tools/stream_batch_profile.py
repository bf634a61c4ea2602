"""Per-micro-batch duration breakdown for the bench's streaming stages.

Runs ONE drain of each streaming_e2e stage shape and prints, per
micro-batch, the progress-event `durationMs` components (addBatch,
getBatch, latestOffset, queryPlanning, triggerExecution, walCommit,
commitOffsets) so optimization work targets the real cost (state-store
traffic vs per-batch planning vs WAL fsyncs).

Usage: python tools/stream_batch_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from smartdatapipeline_spark.session import get_spark, read_events  # noqa: E402
from smartdatapipeline_spark.streaming.dedup import stream_dedup  # noqa: E402
from smartdatapipeline_spark.streaming.windows import (  # noqa: E402
    session_window_kpis,
    windowed_kpis,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sdp_sprof_")
    try:
        (
            read_events(spark, sf_dir)
            .select("ts", "user_id", F.col("event_type").alias("metric"), "value")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(f"{work}/events")
        )
        schema = spark.read.parquet(f"{work}/events").schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{work}/events")
            )

        stages = [
            ("windowed_kpis", lambda: windowed_kpis(src(), window="1 hour", watermark="1 hour"), "update"),
            ("dedup_watermark", lambda: stream_dedup(src(), keys=("metric", "ts"), watermark="1 hour"), "append"),
            ("session_windows", lambda: session_window_kpis(src(), gap="30 minutes", watermark="1 hour"), "append"),
        ]
        for name, build, mode in stages:
            t0 = time.perf_counter()
            q = (
                build()
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", f"{work}/ckpt_{name}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            print(f"\n== {name}: wall {wall:.2f}s")
            tot: dict[str, float] = {}
            for p in q.recentProgress or []:
                if not p:
                    continue
                dur = p.get("durationMs") or {}
                row = {k: int(v) for k, v in dur.items()}
                for k, v in row.items():
                    tot[k] = tot.get(k, 0) + v
                print(
                    "  batch", p.get("batchId"), "rows", p.get("numInputRows"),
                    json.dumps(row, sort_keys=True),
                )
            print("  TOTAL", json.dumps({k: round(v / 1000.0, 2) for k, v in sorted(tot.items())}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
