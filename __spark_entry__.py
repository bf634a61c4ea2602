"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship daily-KPI query at sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Numeric discipline: every float aggregate is an exact DECIMAL sum cast to
double, and every ratio is double division of those deterministic doubles
(see smartdatapipeline_spark/functions/numeric.py) — bit-identical between
Spark and DuckDB with no rounding tricks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import numeric as N
from smartdatapipeline_spark.operators import anomaly as A
from smartdatapipeline_spark.operators import kpi as K
from smartdatapipeline_spark.operators import metrics as M
from smartdatapipeline_spark.session import read_events

SF0001 = "/root/testdata/sf0.001"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet mapped to the silver clean_events shape
    (FIXTURES.md F3): event_type → metric, user_id → distinct field."""
    return read_events(spark, sf_dir)


# ---------------------------------------------------------------- queries

def q_kpi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: daily KPI group-by with exact distinct user count."""
    ev = _events(spark, sf_dir)
    return K.run_daily_kpis(
        ev, metric_col="event_type", distinct_field="user_id", source_col=None
    )


def q_kpi_daily_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: half-open UTC event-time window + metric filter, then A1."""
    ev = _events(spark, sf_dir)
    return K.run_daily_kpis(
        ev,
        start_date="2024-01-05",
        end_date="2024-01-20",
        metric_name="purchase",
        metric_col="event_type",
        source_col=None,
    )


def q_metric_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: distinct metric names sorted ascending."""
    return K.metric_names(_events(spark, sf_dir), metric_col="event_type")


def q_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: ingest stats (count, ts min/max, metrics seen)."""
    return K.ingest_stats(_events(spark, sf_dir), metric_col="event_type")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary over lineitem — the relational
    aggregate stress query for bench (scan + filter + 2-key hash agg)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n = F.count(F.lit(1))
    # 2-decimal inputs ⇒ products exact at 4/6 decimals; decimal sums are
    # exact and order-independent (see functions/numeric.py)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            N.dsum("l_quantity", scale=2).alias("sum_qty"),
            N.dsum("l_extendedprice", scale=2).alias("sum_base_price"),
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "sum_disc_price"
            ),
            N.dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            (N.dsum("l_quantity", scale=2) / n).alias("avg_qty"),
            (N.dsum("l_extendedprice", scale=2) / n).alias("avg_price"),
            (N.dsum("l_discount", scale=2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gold series per metric: (metric_date, metric, value) where
    value = daily value_sum — the anomaly/forecast input shape (F4)."""
    ev = _events(spark, sf_dir)
    g = K.run_daily_kpis(ev, metric_col="event_type", source_col=None)
    return g.select("metric_date", "metric", F.col("value_sum").alias("value"))


#: DuckDB CTE mirroring _gold() — prefix for the window-function oracles
_GOLD_CTE = """
    WITH gold AS (
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2
    )
"""

#: shared frame-stat projections (decimal-exact, mirrors anomaly._frame_stats)
def _stats_cte(preceding: int, following: str = "1 PRECEDING") -> str:
    return f"""
    , stats AS (
        SELECT metric, metric_date, value,
               (ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date) - 1) AS pos,
               COUNT(value) OVER f AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER f AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(38,4))) OVER f AS DOUBLE) AS sq
        FROM gold
        WINDOW f AS (PARTITION BY metric ORDER BY metric_date
                     ROWS BETWEEN {preceding} PRECEDING AND {following})
    )
    """


def q_rolling_zscore_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: strict prior-window z-score (window=7, pstdev, all-present gate)."""
    return A.rolling_zscore_strict(_gold(spark, sf_dir), window=7, z_thresh=3.0)


def q_rolling_zscore_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: public-API rolling z-score (window=7, ddof=1, flat-window 1e9)."""
    return A.rolling_zscore_api(_gold(spark, sf_dir), window=7, z_thresh=3.0)


def q_iforest_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: rolling 7-day mean/std(ddof=0)/diff feature block."""
    return A.iforest_features(_gold(spark, sf_dir))


def q_anomaly_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: IsolationForest ladder — with sklearn absent (this container),
    the reference-specified rolling-z proxy is the live path."""
    return A.anomaly_iforest(_gold(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kpi_daily": q_kpi_daily,
        "kpi_daily_window": q_kpi_daily_window,
        "metric_names": q_metric_names,
        "ingest_stats": q_ingest_stats,
        "pricing_summary": q_pricing_summary,
        "rolling_zscore_strict": q_rolling_zscore_strict,
        "rolling_zscore_api": q_rolling_zscore_api,
        "iforest_features": q_iforest_features,
        "anomaly_iforest": q_anomaly_iforest,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kpi_daily": """
            SELECT CAST(ts AS DATE) AS metric_date,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg,
                   COUNT(*) AS value_count,
                   COUNT(DISTINCT user_id) AS value_distinct
            FROM events
            GROUP BY 1, 2
        """,
        "kpi_daily_window": """
            SELECT CAST(ts AS DATE) AS metric_date,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg,
                   COUNT(*) AS value_count
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts < TIMESTAMP '2024-01-21 00:00:00'
              AND event_type = 'purchase'
            GROUP BY 1, 2
        """,
        "metric_names": """
            SELECT DISTINCT event_type AS metric FROM events ORDER BY metric
        """,
        "ingest_stats": """
            SELECT COUNT(*) AS ingested,
                   MIN(ts) AS min_ts,
                   MAX(ts) AS max_ts,
                   COUNT(DISTINCT event_type) AS metrics_seen,
                   MIN(event_type) AS first_metric
            FROM events
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "rolling_zscore_strict": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, pos, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / n > 0
                            THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS sigma
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN pos >= 7 AND n = 7 AND sigma > 0
                        THEN (value - mu) / sigma END AS z,
                   COALESCE(ABS(CASE WHEN pos >= 7 AND n = 7 AND sigma > 0
                                     THEN (value - mu) / sigma END) >= 3.0,
                            FALSE) AS is_anomaly
            FROM derived
        """,
        "rolling_zscore_api": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / (n - 1) > 0
                            THEN SQRT((sq - (s * s) / n) / (n - 1)) ELSE 0.0 END AS sigma
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 AND value != mu THEN 1e9
                        WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN 0.0
                        WHEN value IS NOT NULL AND n >= 2 THEN (value - mu) / sigma
                   END AS z,
                   CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN value != mu
                        WHEN value IS NOT NULL AND n >= 2
                             THEN ABS((value - mu) / sigma) >= 3.0
                        ELSE FALSE
                   END AS is_outlier
            FROM derived
        """,
        "iforest_features": _GOLD_CTE + _stats_cte(6, "CURRENT ROW") + """
            SELECT metric, metric_date, value,
                   s / n AS roll_mean_7,
                   CASE WHEN (sq - (s * s) / n) / n > 0
                        THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS roll_std_7,
                   COALESCE(value - LAG(value, 1) OVER
                            (PARTITION BY metric ORDER BY metric_date), 0.0) AS diff_1
            FROM stats
        """,
        "anomaly_iforest": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / n > 0
                            THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS sd
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN n >= 7 AND sd = 0 THEN 0.0
                        WHEN n >= 7 THEN (value - mu) / sd
                   END AS score,
                   CASE WHEN n >= 7 AND sd = 0 THEN value != mu
                        WHEN n >= 7 THEN ABS((value - mu) / sd) >= 3.0
                        ELSE FALSE
                   END AS is_outlier
            FROM derived
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_kpi_daily(spark, SF0001)
