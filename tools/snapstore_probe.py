"""Measure snapshot-store commit-protocol overhead vs table history
(sources/snapstore.py): per-commit latency split into the Spark batch
write vs the manifest work (snapshot replay + claim), at growing
commit counts — demonstrating that checkpoints bound manifest cost by
log-tail length, not history length.

Usage: python tools/snapstore_probe.py [n_commits] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartdatapipeline_spark.session import get_spark
from smartdatapipeline_spark.sources import snapstore as SS


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/snapstore_probe.json"
    spark = get_spark("snap-probe", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snapprobe_")
    try:
        df = spark.createDataFrame(
            [(f"2024-01-{(i % 28) + 1:02d}", f"k{i}", i) for i in range(64)],
            "d string, k string, v long",
        ).localCheckpoint(eager=True)  # exclude input lineage from timing
        lat: list[dict] = []
        for i in range(n):
            t0 = time.perf_counter()
            SS.append(df, os.path.join(root, "t"), "d")
            t1 = time.perf_counter()
            # manifest-only cost: snapshot replay at this history length
            SS._snapshot(os.path.join(root, "t"))
            t2 = time.perf_counter()
            lat.append(
                {
                    "commit": i + 1,
                    "append_s": round(t1 - t0, 4),
                    "snapshot_s": round(t2 - t1, 4),
                }
            )
        def med(xs):
            s = sorted(xs)
            return s[len(s) // 2]

        def window(a, b):
            w = [x for x in lat if a <= x["commit"] <= b]
            return {
                "commits": f"{a}-{b}",
                "append_med_s": med([x["append_s"] for x in w]),
                "snapshot_med_s": med([x["snapshot_s"] for x in w]),
            }

        summary = {
            "n_commits": n,
            "checkpoint_interval": SS._CHECKPOINT_INTERVAL,
            "windows": [
                window(1, 20),
                window(max(1, n // 2 - 10), n // 2 + 10),
                window(max(1, n - 20), n),
            ],
        }
        with open(out, "w") as f:
            json.dump({"summary": summary, "latencies": lat}, f, indent=1)
        print(json.dumps(summary))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
