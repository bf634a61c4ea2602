"""Skew-aware relational primitives.

``key_skew_report`` (operators/maintenance.py) DETECTS hot join keys;
``salted_join`` here is the standard mitigation when the dimension side
is too big to broadcast but a handful of fact keys would otherwise pin
single reducers: spread each hot key over ``n_salts`` reducers by
salting the fact side and replicating the dimension side.

AQE's skew-join splitting covers sort-merge joins automatically; manual
salting remains the tool for aggregations-after-join pipelines, for
stream-static joins (no AQE), and for engines/pins where AQE is off —
and it is the canonical interview answer made executable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    row_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the pair space spread over ``n_salts`` reducers
    per key: the (big, possibly skewed) ``left`` side gets a
    deterministic per-row salt — ``xxhash64(row_col) mod n_salts``, so
    one hot key's rows scatter uniformly — and the ``right`` side
    replicates ``n_salts``× carrying every salt value. The join key
    becomes (key, salt); every original (left row, right row) pair
    still meets on exactly one salt, so the OUTPUT IS IDENTICAL to the
    plain join (the correctness oracle runs the plain join).

    Cost model: right-side shuffle volume × n_salts buys per-key
    parallelism × n_salts — worth it exactly when a hot key's reducer
    is the stage's critical path. ``row_col`` is any per-row column
    with good hash spread (a primary key; it need not be unique, only
    well-distributed).

    Supported ``how``: inner / left (semantics preserved because right
    replication never duplicates matches per salt — each left row holds
    ONE salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    sl = left.withColumn(
        "_saltl",
        F.pmod(F.xxhash64(F.col(row_col)), F.lit(n_salts)).cast("int"),
    )
    sr = right.withColumn(
        "_saltr", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_saltr", F.col("_saltr").cast("int"))
    cond = (F.col(left_key) == F.col(right_key)) & (
        F.col("_saltl") == F.col("_saltr")
    )
    return sl.join(sr, on=cond, how=how).drop("_saltl", "_saltr")
