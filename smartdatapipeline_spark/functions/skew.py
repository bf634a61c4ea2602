"""Skew-mitigation utilities for 100 TB joins (PERF.md).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); explicit
salting remains necessary when ONE side must be aggregated or joined on
a key whose hot values overwhelm single tasks even after AQE splits —
e.g. joining events to a per-key dimension where key="" (empty doc,
boilerplate fingerprint) holds 10% of all rows.

``salted_join`` implements the classic replicate-small-side pattern:

    large: key → (key, salt = hash(row) % S)
    small: key → exploded to (key, salt ∈ [0, S))
    join on (key, salt)

Each hot key's rows spread over S tasks; the small side grows ×S, which
is the price — use only for genuinely skewed keys (the ``hot_keys``
parameter restricts salting to those, keeping the rest a plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on ``key`` with salt-spread hot keys.

    When ``hot_keys`` is given, only those keys are salted (the rest join
    with salt 0 and one small-side copy); when None, every key is salted
    — correct but multiplies the whole small side by ``salt``.
    """
    if hot_keys is not None:
        is_hot = F.col(key).isin(hot_keys)
        l_salt = F.when(is_hot, F.pmod(F.xxhash64(*large.columns), salt)).otherwise(0)
        s_salts = F.when(is_hot, F.sequence(F.lit(0), F.lit(salt - 1))).otherwise(
            F.array(F.lit(0))
        )
    else:
        l_salt = F.pmod(F.xxhash64(*large.columns), salt)
        s_salts = F.sequence(F.lit(0), F.lit(salt - 1))
    lg = large.withColumn("_salt", l_salt.cast("int"))
    sm = (
        small.withColumn("_salts", s_salts)
        .withColumn("_salt", F.explode("_salts"))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_salts")
    )
    return lg.join(sm, [key, "_salt"], how).drop("_salt")


def layout_salt(
    top1_share: float,
    num_partitions: int,
    factor: float = 4.0,
    salt: int = 8,
) -> int:
    """Decide the LAYOUT salt for a hash repartition from a
    ``key_skew_report`` row (r15; guide §2.5 skew): with a near-uniform
    key the largest partition holds ~1/num_partitions of the rows; when
    the hottest single key's share (``top1_share``) alone exceeds
    ``factor``× that, one reducer owns the whole hot key — every
    downstream per-task cost rides that straggler. Returns 0 (plain
    hash layout) or ``salt``. The report is an offline pre-flight
    diagnostic, so the decision costs no query-path pass."""
    return salt if top1_share * num_partitions > factor else 0


def salted_layout(
    df: DataFrame,
    num_partitions: int,
    key: str,
    salt: int,
    salt_from: str,
) -> DataFrame:
    """Hash layout on ``key`` with a deterministic secondary salt
    (r15; guide §2.5): ``repartition(N, key, pmod(xxhash64(salt_from),
    salt))`` splits each hot key's rows over up to ``salt`` partitions
    while keeping the layout retry-deterministic (the salt derives from
    a row column, never ``rand()`` — SPARK-38388). ``salt <= 1`` is the
    plain single-key hash layout. Trade-off: key-grain consumers lose
    the exchange-reuse the plain layout gives them — use only when
    ``layout_salt`` says the key is genuinely hot."""
    if salt <= 1:
        return df.repartition(num_partitions, key)
    return df.repartition(
        num_partitions,
        F.col(key),
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt)),
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """The pre-flight skew diagnostic for a join/agg key: row count,
    key cardinality, share held by the hottest 1 and 10 keys, and the
    Gini coefficient of the key-frequency distribution — the numbers
    that decide between a plain shuffle, AQE skew-split, bucketing, or
    an explicit salt (``salted_join``).

    Exact arithmetic end-to-end: counts are BIGINT, the Gini rank-sum
    Σ(i·cᵢ) stays integer until one final double division
    (G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n, ranks ascending with key
    tiebreak). One groupBy(key) plus one tiny ordered window over the
    key-frequency table — the window runs on |keys| rows, not |rows|.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_rank = Window.orderBy(F.col("_c").asc(), F.col("_k").asc())
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.withColumn("_i", F.row_number().over(w_rank)).withColumn(
        "_n", F.count(F.lit(1)).over(w_all)
    )
    return ranked.agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias("top1_share"),
        (
            F.coalesce(
                F.sum(F.when(F.col("_i") > F.col("_n") - 10, F.col("_c"))), F.lit(0)
            ).cast("double")
            / F.sum("_c").cast("double")
        ).alias("top10_share"),
        (
            F.lit(2.0) * F.sum(F.col("_i") * F.col("_c")).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.sum("_c").cast("double"))
            - (F.count(F.lit(1)) + 1).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("gini"),
    )
