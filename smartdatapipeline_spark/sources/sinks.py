"""Parquet staging sinks with upsert discipline (SURVEY §2.1 S7–S11,
§2.4 A4/A5).

Reference upserts are RDBMS ``ON CONFLICT`` statements
(services/kpi.py:143-231, services/ingestion.py:214-227,
services/forecast.py:95-107); on parquet the equivalent is
partition-overwrite: gold is partitioned by ``metric_date`` and writes
replace only the partitions present in the incoming batch (Spark's
*dynamic* partitionOverwriteMode), which reproduces "update the
(date, source, metric) groups we just recomputed, leave the rest".

At 100 TB this is the difference between rewriting a table and
rewriting a day: the KPI recompute for an ingest batch touches only the
dates the batch contained. On Delta/Iceberg the same call sites map to
MERGE; plain parquet keeps this repo dependency-free.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def gold_writer_lock(
    path: str, timeout_sec: float = 120.0, stale_sec: float = 600.0
):
    """Single-writer discipline for path-based partition upserts
    (round-6: the nightly-scheduler vs ingest-triggered recompute
    interleave). Dynamic partition overwrite is delete-matching +
    append with NO transactional commit on bare parquet, so two
    concurrent writers can interleave file sets inside one partition
    directory — half of batch A's files plus half of batch B's. This
    lock serializes writers per table path.

    Mechanism: an empty marker directory ``<path>._LOCK`` created with
    ``os.makedirs`` — directory creation is atomic on POSIX and HDFS
    (one concurrent creator wins, the rest get FileExistsError). A lock
    older than ``stale_sec`` is treated as leaked by a crashed writer
    and broken (rmdir is itself atomic; losers of the break race loop
    and retry). Waiters poll until ``timeout_sec`` then raise
    TimeoutError rather than deadlock a scheduler thread.

    Scope honesty for 100 TB deployments: object stores without atomic
    namespace ops (S3) need an external lock service or a table format
    with transactional commit (Delta/Iceberg MERGE) — this discipline
    covers POSIX/HDFS paths, which is what bare-parquet gold is. The
    scheduler quirk that triggers overlapping recomputes is
    plans/scheduler.py; this makes those recomputes safe rather than
    assuming they never overlap.
    """
    lock_dir = path.rstrip("/") + "._LOCK"
    deadline = time.monotonic() + timeout_sec
    while True:
        try:
            os.makedirs(lock_dir, exist_ok=False)
            break
        except FileExistsError:
            try:
                if time.time() - os.stat(lock_dir).st_mtime > stale_sec:
                    os.rmdir(lock_dir)
                    continue
            except (FileNotFoundError, OSError):
                continue  # holder released (or break race lost) — retry now
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"gold_writer_lock: {lock_dir} held past {timeout_sec}s"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.rmdir(lock_dir)
        except OSError:
            pass


def write_bronze(df: DataFrame, path: str) -> None:
    """S7 — append-only raw staging (reference services/ingestion.py:208-212).
    Bronze is immutable: appends only, no upsert."""
    df.write.mode("append").parquet(path)


def append_silver(df: DataFrame, path: str) -> None:
    """S8 sink half — append the deduplicated rows (the anti-join half
    lives in ingest.upsert_clean_events). Partitioned by event date so
    downstream day-window KPI scans prune."""
    df.write.mode("append").parquet(path)


def overwrite_gold_partitions(
    df: DataFrame, path: str, lock_timeout_sec: float = 120.0
) -> None:
    """A4/A5 — KPI upsert: replace exactly the (metric_date) partitions in
    this batch (reference ON CONFLICT DO UPDATE, services/kpi.py:143-180).

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set
    here per-write via the DataFrameWriter option so the session default
    doesn't matter). Serialized per table path by ``gold_writer_lock``
    so a nightly full recompute and an ingest-triggered incremental one
    can never interleave file sets inside a partition directory.
    """
    with gold_writer_lock(path, timeout_sec=lock_timeout_sec):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("metric_date")
            .parquet(path)
        )


def write_bucketed_gold(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    bucket_cols: tuple[str, ...] = ("metric",),
    sort_cols: tuple[str, ...] = ("metric_date",),
) -> None:
    """Gold as a bucketed+sorted table: repeated aggregations/joins on the
    bucket key read pre-clustered data and plan WITHOUT an Exchange —
    the 100 TB pattern for a hot grouping key (PERF.md "bucketing both
    sides on the key deletes the shuffle"). Requires a metastore-backed
    table (``saveAsTable``), not a bare path."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def overwrite_forecast_horizon(
    df: DataFrame, path: str, spark: SparkSession
) -> None:
    """S10 — forecast upsert per (source, metric) horizon (reference
    services/forecast.py:95-107): partition by (metric) and overwrite
    dynamically — each re-forecast replaces only its own series. Same
    writer-lock discipline as gold (concurrent re-forecast requests for
    overlapping metrics would otherwise interleave)."""
    with gold_writer_lock(path):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("metric")
            .parquet(path)
        )


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S9 — CSV export with the fixed header (reference
    services/metrics_calc.py:61-85). ``single_file`` coalesces to one
    part for API-download parity; leave False for distributed export."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite").option(
        "header", True
    )
    w.csv(path)


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return None


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink (snappy, native writer) — the second
    warehouse-interchange format besides parquet; schema and values
    round-trip losslessly through ``sources.readers.read_orc``."""
    df.write.mode(mode).orc(path)
