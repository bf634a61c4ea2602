"""Explicit StructTypes for the engine's staging tables.

Mirrors the reference's relational data model (SURVEY.md §1.1):

- bronze  ``raw_events``      — reference backend/app/models/raw_event.py:9-35
- silver  ``clean_events``    — reference backend/app/models/clean_event.py:7-23
- gold    ``metric_daily``    — reference backend/app/models/metric_daily.py:6-26
- ``sources`` dimension       — reference backend/app/models/source.py:5-10
- ``forecast_results``        — reference backend/app/models/forecast_results.py:4-14
- ``forecast_reliability``    — reference backend/app/models/forecast_reliability.py:6-25

Scale note: silver/gold are written partitioned by ``metric_date`` (and
bucketable by ``source_id, metric``) so per-(source,metric) recomputes
touch only the affected partitions at 100 TB — the Spark analog of the
reference's per-(source,metric) upsert discipline.
"""

from __future__ import annotations

from pyspark.sql import types as T

SOURCES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

RAW_EVENTS = T.StructType(
    [
        T.StructField("source_id", T.LongType(), True),
        T.StructField("received_at", T.TimestampType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        # JSON string; parse on demand with from_json/get_json_object.
        T.StructField("payload", T.StringType(), True),
    ]
)

CLEAN_EVENTS = T.StructType(
    [
        T.StructField("source_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

METRIC_DAILY = T.StructType(
    [
        T.StructField("metric_date", T.DateType(), True),
        T.StructField("source_id", T.LongType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("value_sum", T.DoubleType(), True),
        T.StructField("value_avg", T.DoubleType(), True),
        T.StructField("value_count", T.LongType(), True),
        T.StructField("value_distinct", T.LongType(), True),
    ]
)

FORECAST_RESULTS = T.StructType(
    [
        T.StructField("source_id", T.LongType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("target_date", T.DateType(), True),
        T.StructField("yhat", T.DoubleType(), True),
        T.StructField("yhat_lower", T.DoubleType(), True),
        T.StructField("yhat_upper", T.DoubleType(), True),
        T.StructField("model_version", T.StringType(), True),
    ]
)

#: model registry (reference backend/app/models/forecast_model.py:11-27);
#: model_params JSON/JSONB → MapType(string, string)
FORECAST_MODELS = T.StructType(
    [
        T.StructField("source_id", T.LongType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("model_name", T.StringType(), True),
        T.StructField("model_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("window_n", T.IntegerType(), True),
        T.StructField("horizon_n", T.IntegerType(), True),
        T.StructField("trained_at", T.TimestampType(), True),
        T.StructField("train_start", T.DateType(), True),
        T.StructField("train_end", T.DateType(), True),
        T.StructField("mape", T.DoubleType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

FORECAST_RELIABILITY = T.StructType(
    [
        T.StructField("source_name", T.StringType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("as_of_date", T.DateType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("mape", T.DoubleType(), True),
        T.StructField("rmse", T.DoubleType(), True),
        T.StructField("smape", T.DoubleType(), True),
    ]
)

FORECAST_RELIABILITY_FOLD = T.StructType(
    [
        T.StructField("source_name", T.StringType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("fold_index", T.IntegerType(), True),
        T.StructField("mae", T.DoubleType(), True),
        T.StructField("rmse", T.DoubleType(), True),
        T.StructField("mape", T.DoubleType(), True),
        T.StructField("bias", T.DoubleType(), True),
    ]
)
