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

from pyspark.sql import DataFrame, SparkSession


def write_bronze(df: DataFrame, path: str) -> None:
    """S7 — append-only raw staging (reference services/ingestion.py:208-212).
    Bronze is immutable: appends only, no upsert."""
    df.write.mode("append").parquet(path)


def append_silver(df: DataFrame, path: str) -> None:
    """S8 sink half — append the deduplicated rows (the anti-join half
    lives in ingest.upsert_clean_events). Partitioned by event date so
    downstream day-window KPI scans prune."""
    df.write.mode("append").parquet(path)


def overwrite_gold_partitions(df: DataFrame, path: str) -> None:
    """A4/A5 — KPI upsert: replace exactly the (metric_date) partitions in
    this batch (reference ON CONFLICT DO UPDATE, services/kpi.py:143-180).

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set
    here per-write via the DataFrameWriter option so the session default
    doesn't matter).
    """
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
    dynamically — each re-forecast replaces only its own series."""
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
