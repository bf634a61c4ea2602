"""Exactly-once streaming sink into the snapshot-committed table
(round 10 — the streaming half of sources/snapstore.py).

Structured Streaming's own file sink is exactly-once only onto its
private _spark_metadata log; writing through ``foreachBatch`` is
normally at-least-once (a crashed-then-restarted micro-batch re-runs
its batch function against the SAME epoch). The public Delta pattern
(Armbrust et al., VLDB 2020 §4.3 — ``txn`` actions keyed by appId +
batch version) turns that into exactly-once: each micro-batch commits
with an idempotency key ``<app_id>:<batch_id>``; a replayed epoch sees
its key already in the log and becomes a no-op, so the sink table
gets each micro-batch exactly once no matter how many times the
engine retries it.

State: none beyond the snapshot log itself — the key set rides in the
commits and checkpoints (snapstore ``txn_keys``), so a restarted query
resumes exactly-once from a cold start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def snapshot_append_sink(
    root: str,
    app_id: str,
    partition_col: str | None = None,
):
    """Build a ``foreachBatch`` function that appends every micro-batch
    to the snapshot table at ``root`` exactly once.

    Usage::

        q = (df.writeStream
               .foreachBatch(snapshot_append_sink(path, "ingest-1"))
               .option("checkpointLocation", ckpt)
               .start())

    ``app_id`` must be stable across restarts of the SAME logical query
    (the checkpoint's identity); two different queries writing one
    table need distinct app_ids or their batch ids would collide.
    """
    from smartdatapipeline_spark.sources import snapstore as SS

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        SS.append(
            batch_df,
            root,
            partition_col=partition_col,
            idempotency_key=f"{app_id}:{batch_id}",
        )

    return _write


def snapshot_merge_sink(
    root: str,
    app_id: str,
    keys: list[str],
    when_matched: str = "ignore",
    partition_col: str | None = None,
):
    """``foreachBatch`` row-level MERGE: each micro-batch upserts by
    key into the snapshot table exactly once (r12 — the streaming twin
    of ``snapstore.merge``). ``when_matched="ignore"`` is streaming
    ON-CONFLICT-DO-NOTHING: duplicate keys arriving across micro-
    batches (at-least-once upstreams, replayed epochs, overlapping
    backfills) collapse at the STORAGE layer — no watermarked
    dropDuplicates state to size or expire, and the dedup horizon is
    the whole table, not a state-store window. ``"update"`` keeps the
    latest version of each key (CDC upsert ingestion). The engine-side
    epoch retry is a no-op via the ``<app_id>:<batch_id>`` key; a
    WITHIN-batch duplicate key should be pre-collapsed by the caller
    for ``update`` (merge appends source rows verbatim).

    Scale contract (same as batch merge): record ``stats_cols``/z-order
    on the key columns upstream so candidate pruning holds, and keep
    keys partition-aligned with ``partition_col`` so a micro-batch
    conflicts only with writers of its own partitions."""
    from smartdatapipeline_spark.sources import snapstore as SS

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        SS.merge(
            batch_df,
            root,
            keys=keys,
            when_matched=when_matched,
            partition_col=partition_col,
            idempotency_key=f"{app_id}:{batch_id}",
        )

    return _write


def snapshot_upsert_sink(
    root: str,
    app_id: str,
    partition_col: str,
    transform=None,
):
    """``foreachBatch`` partition-upsert: each micro-batch (optionally
    reshaped by ``transform(batch_df)`` — e.g. a per-day KPI aggregate)
    OVERWRITES the partitions it contains, exactly once. The streaming
    twin of the gold refresh: late micro-batches replace only the days
    they touch, and an engine-side epoch retry is a no-op."""
    from smartdatapipeline_spark.sources import snapstore as SS

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        SS.overwrite_partitions(
            out,
            root,
            partition_col=partition_col,
            idempotency_key=f"{app_id}:{batch_id}",
        )

    return _write
