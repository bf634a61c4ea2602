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
