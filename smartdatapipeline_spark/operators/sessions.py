"""Gap-based sessionization — a training-pipeline operator the
reference lacks (BASELINE.json north star; semantics pinned here by the
DuckDB oracle + tests).

A session is a maximal run of a user's events where consecutive gaps are
≤ ``gap``. Two implementations with identical semantics:

- batch (this module): two window functions over (user, ts) — a lag-gap
  flag and its running sum — then one aggregation. Cost: one shuffle on
  ``user_id``, sort within partitions; scales with user cardinality.
- streaming (streaming/sessions.py): ``applyInPandasWithState`` keeping
  one open session per user as state — O(users-in-watermark) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    Output: (user_id, session_id [1-based per user, ordered by start],
    session_start, session_end, n_events). Gap comparison is in exact
    integer microseconds (``unix_micros``) — float seconds would drift
    between engines.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ-safe: parquet scans can surface TIMESTAMP_NTZ (Spark 4 infer),
    # and unix_micros requires TIMESTAMP. Session tz is pinned UTC, so the
    # cast is instant-preserving. (Round-1 driver crash was this exact gap.)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = (prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_us))).cast("int")
    sess_id = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            sess_id.alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def bounce_rate(events, gap_minutes: int = 30):
    """Per-day session bounce rate: share of sessions (gap-based, same
    semantics as ``sessionize``) with exactly one event, keyed by the
    session's START day. Exact integer counts over the session frame;
    one double ratio.

    Output: (day, n_sessions, n_bounces, bounce_rate).
    """
    from pyspark.sql import functions as F

    s = sessionize(events, gap_minutes=gap_minutes)
    return (
        s.select(
            F.to_date("session_start").alias("day"),
            (F.col("n_events") == 1).cast("long").alias("_b"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("_b").alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.col("n_bounces") / F.col("n_sessions").cast("double"),
        )
    )


def session_stats(events, gap_minutes: int = 30):
    """Per-day session statistics from gap sessions: counts, exact mean
    duration (integer-second decimal sum / count) and mean events per
    session — keyed by session START day.

    Output: (day, n_sessions, avg_duration_s, avg_events).
    """
    from pyspark.sql import functions as F

    s = sessionize(events, gap_minutes=gap_minutes)
    per = s.select(
        F.to_date("session_start").alias("day"),
        (
            F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
        ).alias("_dur"),
        F.col("n_events").alias("_ne"),
    )
    return per.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (F.sum("_dur").cast("double") / F.count(F.lit(1))).alias(
            "avg_duration_s"
        ),
        (F.sum("_ne").cast("double") / F.count(F.lit(1))).alias("avg_events"),
    )
