"""Mergeable moments sketch — distribution statistics in one pass.

A "sketch" in the streaming/OLAP sense: a tiny, mergeable summary from
which statistics are derived after aggregation (cf. the moments sketch
of Gan et al., VLDB'18 — power sums as the summary). The reference
computes distribution stats in pandas on collected rows; at 100 TB the
summary must be mergeable so Spark's partial (map-side) aggregation and
any later re-aggregation (daily → monthly, per-partition → global) stay
exact.

The sketch per group is the power sums (n, Σx, Σx², Σx³, Σx⁴): the
powers are IEEE double products (bit-identical on any engine) cast to
DECIMAL per row, then summed exactly — order-independent and
associative, so merging two sketches is element-wise addition and
partial aggregation is lossless (unlike, say, exact percentiles, which
need a full sort). Moments (mean, variance, skewness, kurtosis) are
derived afterwards as double arithmetic on those deterministic sums —
the repo's cross-engine numeric discipline (functions/numeric.py).

Exact when x⁴ is representable at ``4·scale`` decimals (true for
integer-grained measures) and Σx⁴ fits DECIMAL(38, 4·scale) headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sketch column names, in merge order
SKETCH_COLS = ["n", "s1", "s2", "s3", "s4"]


def moments_sketch(
    df: DataFrame, value_col: str, by: list[str] | None = None, scale: int = 2
) -> DataFrame:
    """One-pass exact power-sum sketch per `by` group.

    Returns `by + [n, s1..s4]` with Σxᵏ as DECIMAL(38, k·scale) — keep
    them decimal until after any re-aggregation/merge. Power k is built
    as double products (x², x³ = x²·x, x⁴ = x²·x²) so an oracle engine
    reproduces the same per-row doubles before the decimal cast.
    """
    by = by or []
    x = F.col(value_col).cast("double")
    x2 = x * x
    pows = {1: x, 2: x2, 3: x2 * x, 4: x2 * x2}
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(pows[k].cast(f"decimal(38,{k * scale})")).cast(
                f"decimal(38,{k * scale})"
            ).alias(f"s{k}")
            for k in (1, 2, 3, 4)
        ],
    )


def merge_sketches(a: DataFrame, b: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge two sketches (element-wise sum per group) — the property
    that makes the sketch safe under partial aggregation and cascaded
    rollups."""
    by = by or []
    return (
        a.unionByName(b)
        .groupBy(*by)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"s{k}").alias(f"s{k}") for k in (1, 2, 3, 4)],
        )
    )


def moments_stats(sketch: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Derive mean / population variance / std / skewness / excess
    kurtosis from a power-sum sketch, as deterministic doubles.

    Standard raw→central moment identities:
      m2 = s2/n − μ²
      m3 = s3/n − 3μ·s2/n + 2μ³
      m4 = s4/n − 4μ·s3/n + 6μ²·s2/n − 3μ⁴
      skew = m3 / (m2·√m2),  kurt_excess = m4 / m2² − 3
    (√ via `sqrt`, not `pow(x,1.5)`: IEEE sqrt is correctly rounded on
    every engine; libm/JVM `pow` is not.)
    """
    by = by or []
    n = F.col("n").cast("double")
    s = {k: F.col(f"s{k}").cast("double") for k in (1, 2, 3, 4)}
    mu = s[1] / n
    m2 = s[2] / n - mu * mu
    m3 = s[3] / n - F.lit(3.0) * mu * (s[2] / n) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s[4] / n
        - F.lit(4.0) * mu * (s[3] / n)
        + F.lit(6.0) * mu * mu * (s[2] / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    safe_m2 = F.when(m2 > 0, m2)
    return sketch.select(
        *by,
        F.col("n"),
        mu.alias("mean"),
        m2.alias("var_pop"),
        F.sqrt(safe_m2).alias("std_pop"),
        (m3 / (safe_m2 * F.sqrt(safe_m2))).alias("skewness"),
        (m4 / (safe_m2 * safe_m2) - F.lit(3.0)).alias("kurtosis_excess"),
    )
