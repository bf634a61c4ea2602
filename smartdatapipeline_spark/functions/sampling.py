"""Deterministic dataset splitting & ordering for training pipelines
(BASELINE.json north star; no reference equivalent — semantics pinned by
the DuckDB oracle + tests).

Both operators are pure column expressions keyed on a salted md5 of the
id, so they are: reproducible across runs/engines/cluster sizes,
stable under appends (a doc's split never changes when other docs
arrive — the property random splits lack), and shuffle-free at scan
time (the split is a projection; the shuffle order is one global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(id_col: Column, salt: str, buckets: int = 100) -> Column:
    """salted md5 → stable bucket in [0, buckets)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a split label by hash bucket.

    ``weights`` maps split name → percentage (must sum to 100); buckets
    are allocated in dict order, so {"train": 98, "val": 1, "test": 1}
    gives buckets 0-97 / 98 / 99. Output: input + (bucket, split).
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    assert sum(weights.values()) == 100, "weights must sum to 100"
    b = _bucket(F.col(id_col), salt)
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (b >= lo) & (b < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("bucket", b).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic N-per-group sample: rank rows within each stratum
    by salted id hash and keep the first N — a reproducible balanced
    subset (per-lang / per-domain caps in corpus building). One shuffle
    on the stratum key. Output: input + sample_rank."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(id_col), salt, buckets=2_147_483_647), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str = "doc_id", salt: str = "shuffle-v1"
) -> DataFrame:
    """Reproducible global 'shuffle': order by the salted id hash
    (ties broken by id). One sort; change ``salt`` for a fresh epoch
    order. At 100 TB prefer writing with this as the sort key so
    training readers stream in shuffled order with zero extra passes."""
    return df.orderBy(
        _bucket(F.col(id_col), salt, buckets=2_147_483_647), F.col(id_col)
    )
