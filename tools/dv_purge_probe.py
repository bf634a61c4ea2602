"""Price DV-debt maintenance at a 1:50 DV-file ratio (r14; r13 VERDICT
#2 done-criteria): ``purge_deletion_vectors`` rewrites ONLY the files
carrying live sidecars, vs a FULL OPTIMIZE rewriting the whole table.

A 50-batch table takes one 1-row DV delete (one covered file). The
purge should cost ~1/50 of the full compact in bytes written and a
similar fraction in wall-clock — that ratio is the bounded
takedown-to-physical-deletion SLA at 100 TB, where "wait for the next
full OPTIMIZE" means rewriting the table to erase one row's bytes.
Prints one JSON line.
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

ROWS = int(os.environ.get("DVPROBE_ROWS", 5_000_000))
BATCHES = int(os.environ.get("DVPROBE_BATCHES", 50))


def _build(spark, root: str) -> None:
    from pyspark.sql import functions as F

    per = ROWS // BATCHES
    for b in range(BATCHES):
        df = spark.range(per).select(
            (F.col("id") + b * per).alias("id"),
            F.lit(f"2024-{b // 28 + 1:02d}-{b % 28 + 1:02d}").alias("day"),
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
    spark = get_spark("dv-purge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dvpurge-")
    purge_root = os.path.join(base, "purge")
    full_root = os.path.join(base, "full")
    target = ROWS // 2 + 17  # one row ⇒ one covered file of BATCHES
    try:
        out = {"rows": ROWS, "batches": BATCHES}
        for name, root in (("purge", purge_root), ("full", full_root)):
            _build(spark, root)
            SS.delete_where(
                spark, root, f"id = {target}",
                prune=("id", target, target), mode="dv",
            )
            debt = SS.dv_debt(root)
            assert debt == {"positions": 1, "sidecars": 1, "covered_files": 1}, debt
            before = _tree_bytes(root)
            t0 = time.perf_counter()
            if name == "purge":
                SS.purge_deletion_vectors(spark, root)
            else:
                SS.compact(spark, root, target_batches=BATCHES)
            out[f"{name}_sec"] = round(time.perf_counter() - t0, 4)
            out[f"{name}_bytes_written"] = _tree_bytes(root) - before
            assert SS.dv_debt(root)["sidecars"] == 0
        a = sorted(r["id"] for r in SS.read_table(spark, purge_root).collect())
        b = sorted(r["id"] for r in SS.read_table(spark, full_root).collect())
        assert a == b and len(a) == ROWS - 1, (len(a), len(b))
        out["speedup_maintenance"] = round(out["full_sec"] / out["purge_sec"], 2)
        out["bytes_ratio"] = round(
            out["full_bytes_written"] / max(1, out["purge_bytes_written"]), 1
        )
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
