"""Pin the snapshot store's driver-side manifest ceiling (r10 VERDICT
#5): drive a table to ~10,000 live files and measure, at milestones,

- snapshot replay latency (checkpoint + log tail → live set),
- commit claim latency (one optimistic append commit),
- manifest-pruned read-plan latency (read_table to 1 partition value,
  Spark count on the pruned file list),
- full-scan read latency (all live files listed to Spark),

then OPTIMIZE (compact to 8 batches) and re-measure — the number that
tells you where nightly compaction must kick in.

Batch data dirs are written with pyarrow (tiny files: the probe
measures MANIFEST mechanics, not Spark write throughput); commits go
through the real ``_try_claim`` protocol with tracked partition
values, checkpoints included, so replay cost is the production path.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from smartdatapipeline_spark.session import get_spark  # noqa: E402
from smartdatapipeline_spark.sources import snapstore as SS  # noqa: E402

ADDS_PER_COMMIT = 50
MILESTONES = tuple(
    int(x)
    for x in os.environ.get(
        "SNAPCEIL_MILESTONES", "1000,2000,5000,10000"
    ).split(",")
)
N_DAYS = 365


def _write_tiny_batch(root: str, day: str) -> dict:
    rel = f"{SS._DATA_DIR}/{uuid.uuid4().hex}"
    full = os.path.join(root, rel)
    os.makedirs(full, exist_ok=True)
    t = pa.table({"d": pa.array([day] * 10), "v": pa.array(range(10), pa.int64())})
    pq.write_table(t, os.path.join(full, "part-0.parquet"))
    return {
        "op": "add",
        "path": rel,
        "rows": 10,
        "partition_col": "d",
        "values": [day],
        "stats": None,
    }


def _append_commit(root: str, actions: list[dict]) -> float:
    """One real optimistic commit; returns claim+checkpoint seconds."""
    t0 = time.perf_counter()
    v = SS.table_version(root) + 1
    ok = SS._try_claim(root, v, {
        "version": v,
        "kind": "append",
        "actions": actions,
        "replaced": [],
        "idempotency_key": None,
        "writer": "ceiling-probe",
    })
    assert ok
    SS._maybe_checkpoint(root, v)
    return time.perf_counter() - t0


def _measure(spark, root: str, day: str) -> dict:
    t0 = time.perf_counter()
    _, live, _ = SS._snapshot(root)
    snap_s = time.perf_counter() - t0

    commit_s = _append_commit(root, [_write_tiny_batch(root, day)])

    t0 = time.perf_counter()
    n = SS.read_table(spark, root, partition_values=[day], partition_col="d").count()
    pruned_s = time.perf_counter() - t0
    assert n > 0

    out = {
        "live_files": len(live) + 1,
        "snapshot_sec": round(snap_s, 4),
        "commit_sec": round(commit_s, 4),
        "pruned_read_sec": round(pruned_s, 4),
    }
    if os.environ.get("SNAPCEIL_FULL_READ", "1") != "0":
        t0 = time.perf_counter()
        out["rows"] = SS.read_table(spark, root).count()
        out["full_read_sec"] = round(time.perf_counter() - t0, 4)
    return out


def main() -> int:
    spark = get_spark("ceiling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snapceil-")
    points = []
    live = 0
    try:
        for target in MILESTONES:
            while live < target:
                n = min(ADDS_PER_COMMIT, target - live)
                actions = [
                    _write_tiny_batch(root, f"2024-{(live + i) % N_DAYS // 31 + 1:02d}-{(live + i) % 28 + 1:02d}")
                    for i in range(n)
                ]
                _append_commit(root, actions)
                live += n
            points.append(_measure(spark, root, "2024-01-05"))
            live += 1  # the measurement's own append

        result = {"milestones": points}
        if os.environ.get("SNAPCEIL_COMPACT", "1") != "0":
            t0 = time.perf_counter()
            SS.compact(spark, root, target_batches=8)
            result["compact_sec"] = round(time.perf_counter() - t0, 2)
            result["after_compact"] = _measure(spark, root, "2024-01-05")
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
