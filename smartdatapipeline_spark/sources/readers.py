"""Tolerant CSV/JSON sources (SURVEY §2.1 S1–S6).

Reference: backend/app/services/ingestion.py:53-99 (byte-stream parsers),
backend/app/routers/ingest.py:46-88 (header validation, strict preflight).

Spark mapping: the reference parses request bodies row-by-row; here every
format lands in ``spark.read`` so parsing is distributed and Catalyst
sees a schema. Bad NDJSON lines surface through PERMISSIVE mode's
``_corrupt_record`` column, mirroring the reference's ``__parse_error__``
sentinel rows — no row is silently dropped.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

#: synonym pools — reference services/ingestion.py:106-108
TS_KEYS = {"timestamp", "time", "date", "datetime"}
VAL_KEYS = {"value", "amount", "count", "qty", "quantity"}
METRIC_KEYS = {"metric", "name", "metric_name"}
SOURCE_KEYS = {"source"}


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — CSV source, BOM/blank-line tolerant (reference
    services/ingestion.py:53-62). All columns as strings; coercion is a
    separate, testable step (P2/P3)."""
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        # blank-line skip is the CSV reader default; utf-8-sig BOM is
        # stripped by the parser when it prefixes the header
        .csv(path)
    )


def csv_header_ok(spark: SparkSession, path: str) -> tuple[bool, str | None]:
    """S3 — header validation: require ``timestamp`` and ``value``
    case-insensitively (reference routers/ingest.py:55-77). Returns
    (ok, error_code) with codes EMPTY_FILE / MISSING_COLUMNS."""
    df = read_csv(spark, path)
    cols = {c.lower().lstrip("﻿") for c in df.columns}
    if not cols or cols == {"_c0"}:
        return False, "EMPTY_FILE"
    if not ({"timestamp"} & cols & TS_KEYS and cols & {"value"}):
        missing = [k for k in ("timestamp", "value") if k not in cols]
        if missing:
            return False, "MISSING_COLUMNS"
    return True, None


def read_json_auto(spark: SparkSession, path: str) -> DataFrame:
    """S2 — JSON source: array, single object, or NDJSON fallback
    (reference services/ingestion.py:65-99).

    A cheap head-sniff picks array (``multiLine``) vs NDJSON; corrupt
    NDJSON lines come back with ``_corrupt_record`` set (the Spark
    analog of the reference's ``__parse_error__`` rows).
    """
    head = _head_bytes(spark, path).lstrip("﻿ \t\r\n")
    if head.startswith("["):
        return spark.read.option("multiLine", True).json(path)
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def _head_bytes(spark: SparkSession, path: str, n: int = 64) -> str:
    # local-path fast path; for object stores the sniff falls back to NDJSON,
    # which still parses arrays wrapped one-per-line
    try:
        with open(path, "rb") as f:
            return f.read(n).decode("utf-8", errors="replace")
    except OSError:
        return ""


def strict_csv_has_bad_rows(clean: DataFrame) -> bool:
    """S4 — strict multipart preflight: ANY invalid row rejects the whole
    file (reference routers/ingest.py:80-86). ``clean`` is the output of
    ingest.clean_rows; the limit(1) keeps this a cheap probe — Spark
    stops the scan at the first offending row."""
    return clean.filter(F.col("_warn").isNotNull()).limit(1).count() > 0


def infer_source_name(df: DataFrame, param_source: str | None) -> DataFrame:
    """S5 — source-name inference: a ``source`` field in the data wins,
    else the query param, else 'default' (reference routers/ingest.py:224-246).
    """
    src_col = next((c for c in df.columns if c.lower() in SOURCE_KEYS), None)
    fallback = F.lit(param_source if param_source else "default")
    expr = F.coalesce(F.col(src_col).cast("string"), fallback) if src_col else fallback
    return df.withColumn("source_name", expr)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC source — native Spark reader, same pushdown/pruning
    behavior as parquet (PushedFilters + ReadSchema reach the scan).
    Round-trips with ``sources.sinks.write_orc``."""
    return spark.read.orc(path)
