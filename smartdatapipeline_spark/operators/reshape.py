"""Reshape operators — pivot (long→wide) and unpivot (wide→long).

Beyond the reference surface (its gold table is always long-form;
the frontend pivots client-side for display only). Standard analytics
reshaping, done with explicit column lists so the output schema is
static — the Spark `pivot(col)` two-pass value discovery is avoided,
which matters at scale (no extra job over 100 TB just to learn the
column set) and keeps plans deterministic.

Pivot = one hash aggregate with conditional sums (same shuffle as the
plain groupBy); unpivot = `DataFrame.unpivot` (Expand node — a
narrow, no-shuffle operator emitting one row per value column).
A pivot→unpivot round trip is lossless up to dropped all-null cells,
which the round-trip query's oracle checks end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    long: DataFrame,
    index: list[str],
    on: str,
    values: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Long → wide: one row per `index`, one column per entry of
    `values` (the fixed domain of `on`), cells = exact decimal sum of
    `value_col` (order-independent; functions/numeric.py).

    Implemented as conditional aggregation — `sum(when(on==v, x))` per
    v — rather than `groupBy().pivot()`, so no value-discovery pass
    and the same single shuffle as an ordinary groupBy. Cells with no
    input rows are NULL (SQL convention).
    """
    from smartdatapipeline_spark.functions import numeric as N

    def cell(v: str) -> Column:
        return N.dsum(F.when(F.col(on) == v, F.col(value_col))).alias(v)

    return long.groupBy(*[F.col(c) for c in index]).agg(*[cell(v) for v in values])


def unpivot_long(
    wide: DataFrame,
    index: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
    drop_nulls: bool = True,
) -> DataFrame:
    """Wide → long: one output row per (input row × value column).

    Narrow operation (Expand), no shuffle. `drop_nulls` mirrors the
    SQL UNPIVOT default of omitting NULL cells.
    """
    out = wide.unpivot(
        [F.col(c) for c in index],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
    if drop_nulls:
        out = out.filter(F.col(value_name).isNotNull())
    return out


def topn_with_other(
    df: DataFrame,
    key_col: str,
    measure_col,
    n: int = 3,
) -> DataFrame:
    """Reporting rollup: the top-``n`` keys by an exact decimal measure
    keep their own row; everything else collapses into one ``OTHER``
    row — so the table is always n+1 rows no matter the cardinality.

    Rank by (measure desc, key asc) — deterministic under ties — via
    one window over the key-grain aggregate (key-cardinality rows, not
    the fact), then re-aggregate. Output: (key, measure, n_keys).
    """
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.numeric import dsum

    per = df.groupBy(F.col(key_col).alias("key")).agg(
        dsum(measure_col).alias("_m")
    )
    w = Window.orderBy(F.col("_m").desc(), F.col("key").asc())
    ranked = per.withColumn("_rk", F.row_number().over(w))
    labeled = ranked.select(
        F.when(F.col("_rk") <= n, F.col("key")).otherwise(F.lit("OTHER")).alias(
            "key"
        ),
        F.col("_m").cast("decimal(28,4)").alias("_md"),
    )
    return (
        labeled.groupBy("key")
        .agg(
            F.sum("_md").cast("double").alias("measure"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )
