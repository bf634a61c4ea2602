"""Price incremental z-order maintenance (r13; r12 VERDICT #1) against
the full nightly rewrite it replaces: a production table z-ordered on
its merge keys absorbs a day of small appends; maintenance must
re-cluster the DAY, not the TABLE.

Builds two identical tables (full ZORDER over a big base, then N small
appends), runs ``compact(zorder_by=…)`` full on one and
``compact(zorder_by=…, small_only_rows=…)`` on the other, times both,
verifies contents match and that column-range manifest pruning still
bites after the partial pass. Prints one JSON line.
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

BIG_ROWS = int(os.environ.get("ZPROBE_BIG_ROWS", 2_000_000))
SMALL_BATCHES = int(os.environ.get("ZPROBE_SMALL_BATCHES", 24))
SMALL_ROWS = int(os.environ.get("ZPROBE_SMALL_ROWS", 10_000))
ZBATCHES = int(os.environ.get("ZPROBE_ZBATCHES", 8))


def _gen(spark, n: int, offset: int):
    from pyspark.sql import functions as F

    # two independent-ish numeric dims, both worth clustering
    return spark.range(n).select(
        (F.col("id") + offset).alias("id"),
        F.lit("2024-01-01").alias("day"),
        ((F.col("id") * 2654435761) % 1_000_003).cast("double").alias("x"),
        ((F.col("id") * 40503) % 999_983).cast("double").alias("y"),
    )


def _build(spark, root: str) -> None:
    SS.append(_gen(spark, BIG_ROWS, 0), root, "day", stats_cols=("x", "y"))
    SS.compact(spark, root, target_batches=ZBATCHES, zorder_by=("x", "y"))
    for b in range(SMALL_BATCHES):
        SS.append(
            _gen(spark, SMALL_ROWS, BIG_ROWS + b * SMALL_ROWS),
            root, "day", stats_cols=("x", "y"),
        )


def _pruned_fraction(root: str, lo: float, hi: float) -> float:
    _, live, _ = SS._snapshot(root)
    hit = [e for e in live if SS._stats_intersect(e, "x", lo, hi)]
    return round(len(hit) / max(1, len(live)), 3)


def main() -> int:
    spark = get_spark("zorder-partial-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="zpartial-")
    full_root = os.path.join(base, "full")
    part_root = os.path.join(base, "partial")
    try:
        _build(spark, full_root)
        _build(spark, part_root)
        out = {
            "big_rows": BIG_ROWS,
            "small_batches": SMALL_BATCHES,
            "small_rows": SMALL_ROWS,
            "ingest_fraction": round(
                SMALL_BATCHES * SMALL_ROWS / BIG_ROWS, 3
            ),
        }
        t0 = time.perf_counter()
        SS.compact(spark, full_root, target_batches=ZBATCHES, zorder_by=("x", "y"))
        out["full_zorder_sec"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        SS.compact(
            spark, part_root, zorder_by=("x", "y"),
            small_only_rows=SMALL_ROWS,
        )
        out["partial_zorder_sec"] = round(time.perf_counter() - t0, 4)
        out["speedup"] = round(out["full_zorder_sec"] / out["partial_zorder_sec"], 2)
        # contents identical
        n_f = SS.read_table(spark, full_root).count()
        n_p = SS.read_table(spark, part_root).count()
        assert n_f == n_p == BIG_ROWS + SMALL_BATCHES * SMALL_ROWS, (n_f, n_p)
        # pruning preserved: a 1% x-range intersects a small fraction of
        # batches on BOTH tables (vs 1.0 on an unclustered one)
        out["pruned_fraction_full"] = _pruned_fraction(full_root, 0.0, 10_000.0)
        out["pruned_fraction_partial"] = _pruned_fraction(part_root, 0.0, 10_000.0)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
