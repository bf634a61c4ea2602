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
