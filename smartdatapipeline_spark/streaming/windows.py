"""Event-time windowed aggregation (Structured Streaming extension,
SURVEY §2.8: "watermarks + windowed aggs for late data").

``windowed_kpis`` is written against the DataFrame API only, so the SAME
function runs in batch (oracle-checkable against DuckDB ``time_bucket``)
and on a ``readStream`` source, where the watermark bounds agg state and
admits late events inside the horizon — Spark's native replacement for
the reference's "re-ingest then recompute affected KPIs" loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_kpis(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs from ``window``)
    event-time KPI aggregation per metric.

    Output: (window_start, window_end, metric, value_sum, value_avg,
    value_count). Decimal-exact sums as in the daily KPI operator
    (operators/kpi.py). In streaming mode pass ``watermark`` to bound
    state; in batch mode leave it None (withWatermark is a no-op on
    batch frames anyway, but explicit is better).
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    sum_dec = F.sum(F.col(value_col).cast("decimal(28,4)")).cast("double")
    return (
        df.groupBy(win.alias("_w"), F.col(metric_col).alias("metric"))
        .agg(
            sum_dec.alias("value_sum"),
            (sum_dec / F.nullif(F.count(F.lit(1)), F.lit(0))).alias("value_avg"),
            F.count(F.lit(1)).alias("value_count"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "metric",
            "value_sum",
            "value_avg",
            "value_count",
        )
    )


def session_window_kpis(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN ``session_window``
    — the declarative twin of the custom stateful operator
    (streaming/sessions.py ``sessionize_stream``). Prefer this one: the
    session merge runs inside the native streaming-aggregation state
    store (no Python in the loop); the applyInPandasWithState variant
    exists for session logic the built-in can't express (per-event
    emission, custom merge rules).

    Semantics match operators/sessions.sessionize for the session
    BOUNDS: window.start = first event, window.end = last event + gap
    (the built-in's convention — half-open to the gap horizon rather
    than the last-event timestamp; subtract the gap from window_end to
    recover last-event time, which the batch-equivalence test does).

    Output: (user_id, session_start, session_end_gap, n_events).
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("_w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end_gap"),
            "n_events",
        )
    )
