"""Stream-stream event-time join (Structured Streaming extension,
SURVEY §2.8) — enrich an event stream with a stream of dimension
updates without stopping the pipeline for dim reloads.

Spark's stream-stream inner join buffers both sides bounded by their
watermarks plus the join's time-range condition; state for a row is
dropped once the watermark passes the range it could still match
(Spark's own state-eviction rule for interval joins). This replaces the
reference's restart-to-reload-sources pattern with a live join.

Scale posture: both sides hash-partition on the join key; per-executor
state is O(rows inside the horizon), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_enrich(
    events: DataFrame,
    updates: DataFrame,
    key: str = "source_id",
    event_ts: str = "ts",
    update_ts: str = "uts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Join each event to the dim updates for its key published in the
    ``horizon`` BEFORE the event (half-open: update_ts ≤ event_ts).

    The single ``horizon`` string drives BOTH the watermark eviction
    bound and the join's time-range predicate (``INTERVAL <horizon>``) —
    they must agree for state eviction to be sound, so there is one
    knob, not two. The range bound is computed from the events side's
    own column reference, so a shared timestamp column name across the
    two streams stays unambiguous.

    An event matching k in-horizon updates yields k rows — downstream
    pick-latest (max_by over update_ts after the join, or a batch
    as-of join at rest) selects one. Works identically on batch
    frames, which is what the equivalence test pins.
    """
    e = events.withWatermark(event_ts, horizon) if events.isStreaming else events
    u = updates.withWatermark(update_ts, horizon) if updates.isStreaming else updates
    cond = (
        (e[key] == u[key])
        & (u[update_ts] <= e[event_ts])
        & (u[update_ts] >= e[event_ts] - F.expr(f"INTERVAL {horizon}"))
    )
    return e.join(u, cond, "inner").drop(u[key])
