"""Data-quality expectation checking (Deequ/Great-Expectations shape,
implemented as one Spark aggregation) and SCD2 dimension building.

Beyond-reference surface: the reference validates rows imperatively at
ingest (P4's per-row warnings); a pipeline engine at 100 TB ALSO needs
declarative table-level contracts ("null fraction ≤ x", "values in
range", "key unique") evaluated in one pass, and slowly-changing
dimension history for its dimension tables.

Every metric is an exact integer count or a ratio of exact integers —
deterministic cross-engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One table contract: ``name`` labels the check, ``predicate`` is a
    row-level boolean Column (NULL counts as a violation), ``max_violation_frac``
    is the tolerated violating-row share (0.0 = hard constraint)."""

    name: str
    predicate: Column
    max_violation_frac: float = 0.0


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col},{lo},{hi})", F.col(col).between(F.lit(lo), F.lit(hi))
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"matches({col})", F.col(col).rlike(pattern))


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation pass over the table
    (each check is a conditional count — map-side combine, no per-check
    scans, no driver loop over data). Uniqueness-style checks need a
    grouped pass; see ``check_unique``.

    Output: (check, n_rows, n_violations, violation_frac, passed).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, e in enumerate(expectations):
        aggs.append(
            F.sum(
                F.when(F.coalesce(e.predicate, F.lit(False)), 0).otherwise(1)
            ).cast("bigint").alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    checks = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("check"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") / F.col("_n").cast("double")).alias(
                    "violation_frac"
                ),
                (
                    F.col(f"_v{i}") <= F.col("_n") * F.lit(e.max_violation_frac)
                ).alias("passed"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return row.select(F.explode(checks).alias("c")).select("c.*")


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness contract: one grouped aggregate; a key with
    count > 1 contributes (count − 1) violating rows.

    Output: one row (check, n_rows, n_violations, violation_frac, passed).
    """
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    return per_key.agg(
        F.lit(f"unique({','.join(cols)})").alias("check"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.sum(F.col("_c") - 1).cast("bigint").alias("n_violations"),
        (F.sum(F.col("_c") - 1) / F.sum("_c").cast("double")).alias(
            "violation_frac"
        ),
        (F.sum(F.col("_c") - 1) == 0).alias("passed"),
    )


def scd2_build(
    updates: DataFrame,
    key_cols: tuple[str, ...] = ("source_id",),
    ts_col: str = "uts",
    open_end=None,
) -> DataFrame:
    """Type-2 slowly-changing dimension from an update log: each
    (key, attribute-version) becomes a row with
    ``effective_from`` = its update time, ``effective_to`` = the NEXT
    update's time for that key (half-open interval), and
    ``is_current`` for the latest version. One window over the key —
    the standard CDC-compaction shape; an as-of join against the result
    (operators/temporal.py) reconstructs any point-in-time snapshot.

    ``open_end`` fills ``effective_to`` for current rows (default NULL).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    return (
        updates.withColumn("effective_from", F.col(ts_col))
        .withColumn(
            "effective_to",
            F.coalesce(nxt, F.lit(open_end).cast("timestamp")),
        )
        .withColumn("is_current", nxt.isNull())
    )
