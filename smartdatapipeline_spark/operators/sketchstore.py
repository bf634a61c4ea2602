"""Persisted sketch store — daily register partials as a TABLE, the
architecture that makes the round-9 sketch family a pipeline component
rather than query-side math (round 9).

At 100 TB the distinct-count question is never answered by rescanning
events: the nightly job appends one day's HLL register partial
(≤ m·|metrics| rows — a few KB) next to the gold KPIs, and any later
"distinct users for range/metric X" folds stored registers
(scale-probe ``hll_merge``: exponent 0.01). The reference's
COUNT(DISTINCT) endpoint (backend/app/services/kpi.py:40-43,60-61)
recomputes from events on every call; this store is the same answer
with the data touched exactly once per day.

Write discipline: each day is one ``metric_date=…`` partition written
through the SAME crash-consistent, lock-serialized txn sink as gold
(``sources/sinks.py overwrite_gold_partitions``'s internals), so
re-ingesting a day (late events, corrections) idempotently replaces
that day's registers — and ONLY that day's — while readers always see
fully-old or fully-new partitions. Register max-merge makes replays
harmless even if a day is upserted with a superset of its events.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions.sketch import (
    hll_partial,
    hll_raw_estimate,
    hll_reaggregate,
)
from smartdatapipeline_spark.sources.sinks import (
    gold_writer_lock,
    recover_partition_txn,
    _txn_partition_overwrite,
)


def update_register_store(
    events: DataFrame,
    store_path: str,
    key_col: str = "user_id",
    metric_col: str = "metric",
    ts_col: str = "ts",
    p: int = 8,
    only_new_days: bool = True,
) -> int:
    """Upsert per-(metric_date, metric) HLL register partials for the
    days present in ``events``.

    ``only_new_days=True`` (the nightly-increment mode) skips days that
    already have stored registers — the incremental scan touches only
    the new days' events. ``False`` recomputes every day in ``events``
    (the corrections path), idempotently replacing those partitions.

    Returns the number of day-partitions written.
    """
    df = (
        events.filter(F.col(key_col).isNotNull())
        .withColumn("metric_date", F.to_date(F.col(ts_col)))
    )
    # Recovery must precede the stored-days read (round 9, pinned by
    # tests/test_sketchstore.py): a predecessor's interrupted txn may
    # hold a fully-staged day that the store read cannot see yet —
    # rolling it forward FIRST means the incremental scan skips it
    # instead of recomputing it. The day-discovery action therefore
    # runs under the lock, like the write itself.
    with gold_writer_lock(store_path):
        recover_partition_txn(store_path)
        if only_new_days and os.path.isdir(store_path):
            spark = events.sparkSession
            have = (
                spark.read.parquet(store_path).select("metric_date").distinct()
            )
            df = df.join(F.broadcast(have), on="metric_date", how="left_anti")
        days = [r[0] for r in df.select("metric_date").distinct().collect()]
        if not days:
            return 0
        reg = hll_partial(df, key_col, by=["metric_date", metric_col], p=p)
        _txn_partition_overwrite(reg, store_path, "metric_date")
    return len(days)


def distinct_from_store(
    spark: SparkSession,
    store_path: str,
    start: dt.date | str | None = None,
    end: dt.date | str | None = None,
    metric_col: str = "metric",
    by_metric: bool = True,
    p: int = 8,
) -> DataFrame:
    """Distinct-count estimates over ``[start, end]`` (inclusive day
    grain) from STORED registers only — no events scan. Date filters
    prune the store's ``metric_date`` partitions before any fold.

    Output: per metric (or one global row), the hll_raw_estimate
    columns.
    """
    reg = spark.read.parquet(store_path)
    if start is not None:
        reg = reg.filter(F.col("metric_date") >= F.lit(start).cast("date"))
    if end is not None:
        reg = reg.filter(F.col("metric_date") <= F.lit(end).cast("date"))
    keep = [metric_col] if by_metric else []
    folded = hll_reaggregate(
        reg, drop=["metric_date"], by=["metric_date", *keep]
    )
    return hll_raw_estimate(folded, by=keep, p=p)
