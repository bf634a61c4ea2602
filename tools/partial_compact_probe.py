"""Price the r12 partial (bin-packing) OPTIMIZE against the full
rewrite it replaces: a steady table = one large batch (last night's
compaction output) + N small per-micro-batch appends. Nightly
maintenance should pay for the small files only — the full rewrite
grows with the TABLE, the partial one with the DAY'S INGEST, and at
100 TB that difference is whether maintenance finishes at all.

Builds two identical tables (big batch + N small appends), runs
``compact()`` full on one and ``compact(small_only_rows=...)`` on the
other, times both, and verifies contents are identical afterwards.
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

BIG_ROWS = int(os.environ.get("PCOMPACT_BIG_ROWS", 2_000_000))
SMALL_BATCHES = int(os.environ.get("PCOMPACT_SMALL_BATCHES", 48))
SMALL_ROWS = int(os.environ.get("PCOMPACT_SMALL_ROWS", 10_000))


def _build(spark, root: str) -> None:
    from pyspark.sql import functions as F

    big = spark.range(BIG_ROWS).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 300).cast("int"))
        .cast("string")
        .alias("day"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    SS.append(big, root, "day")
    for b in range(SMALL_BATCHES):
        small = spark.range(SMALL_ROWS).select(
            (F.col("id") + BIG_ROWS + b * SMALL_ROWS).alias("id"),
            F.lit(f"2024-11-{b % 28 + 1:02d}").alias("day"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        SS.append(small, root, "day")


def main() -> int:
    spark = get_spark("partial-compact-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="pcompact-")
    full_root = os.path.join(base, "full")
    part_root = os.path.join(base, "partial")
    try:
        _build(spark, full_root)
        _build(spark, part_root)

        t0 = time.perf_counter()
        SS.compact(spark, full_root, target_batches=4)
        full_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        SS.compact(spark, part_root, target_batches=4, small_only_rows=SMALL_ROWS)
        part_s = time.perf_counter() - t0

        a = SS.read_table(spark, full_root).groupBy().sum("id", "value").first()
        b = SS.read_table(spark, part_root).groupBy().sum("id", "value").first()
        n_a = SS.read_table(spark, full_root).count()
        n_b = SS.read_table(spark, part_root).count()
        assert (tuple(a), n_a) == (tuple(b), n_b), "contents diverged"
        live_full = len(SS._snapshot(full_root)[1])
        live_part = len(SS._snapshot(part_root)[1])
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(
        json.dumps(
            {
                "big_rows": BIG_ROWS,
                "small_batches": SMALL_BATCHES,
                "small_rows": SMALL_ROWS,
                "full_compact_sec": round(full_s, 2),
                "partial_compact_sec": round(part_s, 2),
                "speedup": round(full_s / part_s, 2),
                "live_files_after_full": live_full,
                "live_files_after_partial": live_part,
                "rows": n_a,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
