"""The reference's ingest request loop as one library call
(SURVEY §3.1: POST /api/ingest → process_rows → run_kpi_for_metric).

``ingest_and_refresh`` chains the already-tested pieces: tolerant clean
(P1–P4) → idempotent silver upsert (S8/J4) → gold recompute for ONLY the
touched day partitions (A1/A4) → the A7 stats dict. A user of the
reference switches by pointing this at their raw frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartdatapipeline_spark.operators.kpi import run_daily_kpis
from smartdatapipeline_spark.sources.ingest import (
    clean_rows,
    ingest_stats_from_clean,
    upsert_clean_events,
)
from smartdatapipeline_spark.sources.sinks import (
    append_silver,
    overwrite_gold_partitions,
    read_parquet_if_exists,
)


def ingest_and_refresh(
    spark: SparkSession,
    raw: DataFrame,
    silver_path: str,
    gold_path: str,
    default_metric: str | None = None,
    source_id: int = 1,
    store: str = "parquet",
) -> dict:
    """Ingest a raw frame and refresh the affected gold slices.

    Returns the reference's stats contract (services/ingestion.py:277-286)
    plus ``duplicate_rows`` (rows dropped by the ON-CONFLICT-DO-NOTHING
    upsert, reference :224-226). Gold recompute touches only the
    (metric_date) partitions present in the inserted batch — the
    reference's "recompute affected metrics" scoped to partitions, which
    is what keeps a 100 TB gold table's refresh proportional to the
    batch, not the history.

    ``store`` picks the sink discipline: ``"parquet"`` (default) is the
    POSIX lock+swap path of sources/sinks.py; ``"snapshot"`` routes
    BOTH tables through the manifest-committed snapshot store
    (sources/snapstore.py) — silver as blind appends, gold as
    partition overwrites — the object-store-legal deployment (no
    renames, no locks, optimistic commits). Results are identical by
    construction; tests pin parquet==snapshot gold equality.
    """
    if store not in ("parquet", "snapshot"):
        raise ValueError(f"store must be 'parquet' or 'snapshot', got {store!r}")
    clean = clean_rows(raw, default_metric=default_metric).withColumn(
        "source_id", F.lit(source_id)
    )
    stats = ingest_stats_from_clean(clean)
    valid = clean.filter(F.col("_warn").isNull()).drop("_warn")

    if store == "snapshot":
        from smartdatapipeline_spark.sources import snapstore as SS

        existing = (
            SS.read_table(spark, silver_path)
            if SS.table_version(silver_path) > 0
            else None
        )
    else:
        existing = read_parquet_if_exists(spark, silver_path)
    to_insert, _ = upsert_clean_events(valid, existing)
    # localCheckpoint, not cache: appending to silver refreshes that
    # path's cache entries (refreshByPath), which would silently
    # recompute the anti-join AGAINST ITS OWN OUTPUT and lose the batch.
    # Checkpointing cuts the lineage so the plan can't re-read silver.
    to_insert = to_insert.localCheckpoint(eager=True)
    inserted = to_insert.count()
    stats["duplicate_rows"] = stats["ingested_rows"] - inserted
    if inserted == 0:
        return stats

    if store == "snapshot":
        SS.append(to_insert, silver_path, partition_col=None)
        silver = SS.read_table(spark, silver_path)
    else:
        append_silver(to_insert, silver_path)
        silver = spark.read.parquet(silver_path)

    touched = to_insert.select(F.to_date("ts").alias("_d")).distinct()
    affected = silver.join(
        F.broadcast(touched), F.to_date(silver["ts"]) == touched["_d"], "left_semi"
    )
    gold = run_daily_kpis(affected)
    if store == "snapshot":
        SS.overwrite_partitions(gold, gold_path, partition_col="metric_date")
    else:
        overwrite_gold_partitions(gold, gold_path)
    return stats
