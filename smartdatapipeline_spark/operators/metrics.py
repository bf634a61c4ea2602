"""Metrics read path: filtered fetch, normalization, CSV export
(SURVEY §2.2 P5–P8, §2.5 W8, §2.1 S9).

Reference: backend/app/services/metrics_fetch.py:35-141,
backend/app/services/metrics_calc.py:11-85, backend/app/routers/metrics.py.

All of this is declarative DataFrame code — Catalyst pushes the
conjunctive predicates into the parquet scan (check ``PushedFilters`` in
the explain output) and prunes columns down to the select list, so a
fetch of one (source, metric, date-range) slice from a 100 TB gold table
reads only the matching row groups.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed export header — reference services/metrics_calc.py:11-19
EXPORT_COLUMNS = [
    "metric_date",
    "source_id",
    "metric",
    "value",
    "value_count",
    "value_sum",
    "value_avg",
]

#: unified-value fallback chain — reference routers/anomaly_iforest.py:67-72
VALUE_FALLBACK_ORDER = ["value", "value_sum", "value_avg", "value_count", "value_distinct"]


def fetch_metric_daily(
    gold: DataFrame,
    metric: str | None = None,
    source_id: int | None = None,
    source_name: str | None = None,
    sources: DataFrame | None = None,
    start_date: dt.date | str | None = None,
    end_date: dt.date | str | None = None,
    limit: int | None = None,
    descending: bool = False,
) -> DataFrame:
    """Conjunctive-filter fetch of daily metrics
    (reference services/metrics_fetch.py:35-88).

    ``metric_date BETWEEN start AND end`` is inclusive on both ends
    (conds at reference services/metrics_fetch.py:50-63). ``source_name``
    resolves through the tiny ``sources`` dimension — an automatic
    broadcast join (SURVEY J1).
    """
    df = gold
    if source_name is not None and sources is not None:
        dim = F.broadcast(sources.filter(F.col("name") == source_name).select(
            F.col("id").alias("source_id")))
        df = df.join(dim, "source_id", "inner")
    if metric is not None:
        df = df.filter(F.col("metric") == metric)
    if source_id is not None:
        df = df.filter(F.col("source_id") == source_id)
    if start_date is not None:
        df = df.filter(F.col("metric_date") >= F.lit(str(start_date)))
    if end_date is not None:
        df = df.filter(F.col("metric_date") <= F.lit(str(end_date)))
    order = [
        F.col("metric_date").desc() if descending else F.col("metric_date").asc(),
        # secondary keys make limit deterministic under parallel scan
        F.col("source_id").asc(),
        F.col("metric").asc(),
    ]
    df = df.orderBy(*order)
    if limit is not None:
        df = df.limit(limit)
    return df


def normalize_metric_rows(df: DataFrame, agg: str = "sum") -> DataFrame:
    """Output normalization (reference services/metrics_calc.py:28-58):
    recompute ``value_avg = value_sum / NULLIF(value_count, 0)`` and project
    the unified ``value`` column according to the requested aggregate.
    """
    df = df.withColumn(
        "value_avg", F.col("value_sum") / F.nullif(F.col("value_count"), F.lit(0))
    )
    value_expr = {
        "sum": F.col("value_sum"),
        "avg": F.col("value_avg"),
        "count": F.col("value_count").cast("double"),
        "distinct": F.col("value_distinct").cast("double")
        if "value_distinct" in df.columns
        else F.lit(None).cast("double"),
    }[agg]
    return df.withColumn("value", value_expr)


def value_fallback(df: DataFrame) -> DataFrame:
    """``value → value_sum → value_avg → value_count → value_distinct``
    coalesce chain (reference routers/anomaly_iforest.py:67-72,
    services/anomaly.py:29-44)."""
    cols = [F.col(c).cast("double") for c in VALUE_FALLBACK_ORDER if c in df.columns]
    return df.withColumn("value", F.coalesce(*cols))


def export_csv_frame(gold: DataFrame, **fetch_kwargs) -> DataFrame:
    """CSV-export projection with the fixed header order and
    ``value`` mirroring ``value_sum`` (reference services/metrics_calc.py:61-85).

    Returns the DataFrame; callers stream it out with ``df.write.csv`` (a
    distributed sink) — ``toPandas`` only at demo scale.
    """
    df = fetch_metric_daily(gold, **fetch_kwargs)
    df = normalize_metric_rows(df, agg="sum")
    if "value_distinct" not in df.columns:
        df = df.withColumn("value_distinct", F.lit(None).cast("long"))
    return df.select(*EXPORT_COLUMNS)


def wow_change(
    events: DataFrame,
    ts_col: str = "ts",
    metric_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Week-over-week change of daily value sums: each day joined to
    the same series seven days earlier (a date-arithmetic self-join on
    the tiny day-grain frame — no window frame arithmetic, so missing
    days are naturally absent rather than silently shifted).

    The fact-sized work is the one day-grain rollup; decimal sums make
    both operands exact, and the pct change is one double ratio.

    Output: (metric, day, value_sum, prev_week, pct_change) for days
    with a 7-days-earlier observation.
    """
    from smartdatapipeline_spark.functions.numeric import dsum

    daily = (
        events.select(
            F.col(metric_col).alias("metric"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("metric", "day")
        .agg(dsum("_v").alias("value_sum"))
    )
    prev = daily.select(
        "metric",
        F.date_add(F.col("day"), 7).alias("day"),
        F.col("value_sum").alias("prev_week"),
    )
    return daily.join(prev, ["metric", "day"]).select(
        "metric",
        "day",
        "value_sum",
        "prev_week",
        (
            (F.col("value_sum") - F.col("prev_week"))
            / F.nullif(F.col("prev_week"), F.lit(0.0))
        ).alias("pct_change"),
    )


def mix_shift(
    events: DataFrame,
    ts_col: str = "ts",
    metric_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Mix-shift decomposition: week-over-week, each series' exact
    contribution to the TOTAL change — "was the move volume or mix?".
    Because Δtotal = Σ Δseries exactly (decimal sums), the contribution
    shares add to 1 bit-for-bit.

    One weekly rollup (the only fact-sized shuffle), a 7-day
    self-join, and a broadcast total per week-pair.

    Output: (metric, week, value, prev_value, delta, total_delta,
    contribution) for weeks with a prior week.
    """
    from smartdatapipeline_spark.functions.numeric import dsum

    weekly = (
        events.select(
            F.col(metric_col).alias("metric"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("metric", "week")
        .agg(dsum("_v").alias("value"))
    )
    prev = weekly.select(
        "metric",
        F.date_add(F.col("week"), 7).alias("week"),
        F.col("value").alias("prev_value"),
    )
    joined = weekly.join(prev, ["metric", "week"]).withColumn(
        "delta", F.col("value") - F.col("prev_value")
    )
    totals = joined.groupBy("week").agg(
        F.sum(F.col("delta").cast("decimal(28,4)")).cast("double").alias(
            "total_delta"
        )
    )
    return joined.join(F.broadcast(totals), "week").select(
        "metric",
        "week",
        "value",
        "prev_value",
        "delta",
        "total_delta",
        (F.col("delta") / F.nullif(F.col("total_delta"), F.lit(0.0))).alias(
            "contribution"
        ),
    )
