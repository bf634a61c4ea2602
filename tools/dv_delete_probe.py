"""Price a 1-row takedown under the two DELETE strategies (r13; r12
VERDICT #2): copy-on-write (rewrite every file containing a match) vs
deletion vectors (commit one tiny position sidecar, rewrite nothing).

On a table whose hit file holds millions of rows, the cow delete pays
a full file rewrite; the dv delete pays O(probe scan + sidecar write).
At takedown frequency (thousands/day over 100 TB) that difference is
whether the compliance queue drains. Builds two identical tables, runs
one single-row delete each way, times them, checks the results match,
and reports the bytes each strategy wrote. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smartdatapipeline_spark.session import get_spark  # noqa: E402
from smartdatapipeline_spark.sources import snapstore as SS  # noqa: E402

ROWS = int(os.environ.get("DVPROBE_ROWS", 4_000_000))
BATCHES = int(os.environ.get("DVPROBE_BATCHES", 4))


def _build(spark, root: str) -> None:
    from pyspark.sql import functions as F

    per = ROWS // BATCHES
    for b in range(BATCHES):
        df = spark.range(per).select(
            (F.col("id") + b * per).alias("id"),
            F.lit(f"2024-01-{b + 1:02d}").alias("day"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        SS.append(df, root, "day", stats_cols=("id",))


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _, names in os.walk(os.path.join(root, "data")):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(dirpath, n))
            except OSError:
                pass
    return total


def main() -> int:
    spark = get_spark("dv-delete-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dvprobe-")
    cow_root = os.path.join(base, "cow")
    dv_root = os.path.join(base, "dv")
    target = ROWS // 2 + 17  # one row, middle batch
    try:
        _build(spark, cow_root)
        _build(spark, dv_root)
        out = {"rows": ROWS, "batches": BATCHES}
        for name, root, mode in (("cow", cow_root, "cow"), ("dv", dv_root, "dv")):
            before = _tree_bytes(root)
            t0 = time.perf_counter()
            SS.delete_where(
                spark, root, f"id = {target}",
                prune=("id", target, target), mode=mode,
            )
            out[f"{name}_sec"] = round(time.perf_counter() - t0, 4)
            out[f"{name}_bytes_written"] = _tree_bytes(root) - before
        a = sorted(r["id"] for r in SS.read_table(spark, cow_root).collect())
        b = sorted(r["id"] for r in SS.read_table(spark, dv_root).collect())
        assert a == b and len(a) == ROWS - 1, (len(a), len(b))
        # fold cost: the next maintenance pass pays the rewrite instead
        t0 = time.perf_counter()
        SS.compact(spark, dv_root, target_batches=BATCHES)
        out["dv_fold_sec"] = round(time.perf_counter() - t0, 4)
        out["speedup_delete"] = round(out["cow_sec"] / out["dv_sec"], 2)
        out["bytes_ratio"] = (
            round(out["cow_bytes_written"] / max(1, out["dv_bytes_written"]), 1)
        )
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
