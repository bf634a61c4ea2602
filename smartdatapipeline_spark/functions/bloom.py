"""Bloom-filter semi-join: prune a fact scan with a broadcast bitmap
before the exact join.

The pattern behind Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) made explicit as an
operator, so a pipeline can apply it where the optimizer's heuristics
don't fire (e.g. the build side is an arbitrary pre-aggregated frame).
Semantics are EXACT: the bloom pass may leak false positives, so the
real semi-join runs after it — the bitmap only shrinks the rows that
reach the exchange. At 100 TB that is the difference between shuffling
the whole fact and shuffling the ~matching slice; with a selective
build side the post-filter fact often fits AQE's broadcast threshold
and the "join" collapses to a second map-side test.

Filter construction is pure DataFrame code: k = ``n_hashes`` positions
per key via seeded ``xxhash64``, OR-folded into 64-bit words with a
``bit_or`` aggregate (one tiny shuffle on word index), collected as ONE
array literal (m/64 longs — a few KiB) that whole-stage codegen indexes
with ``element_at``. The probe is k fused JVM expressions per row; no
UDF, no Python, nothing row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, n_hashes: int, seed: int) -> list[Column]:
    """k hash positions in [0, m_bits) — seeded xxhash64, JVM-side."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def build_bloom_words(
    small: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    n_hashes: int = 5,
    seed: int = 71,
) -> tuple[list[int], int]:
    """Build the bitmap for the small side's keys.

    Returns (words, m_bits): ``words`` is the dense little-endian list
    of m_bits/64 longs. Default sizing is ~10 bits/key rounded up to a
    power of two (<1% false positives at k=5), min 4096 bits.
    """
    if m_bits is None:
        n = small.select(key_col).distinct().count()
        m_bits = 4096
        while m_bits < 10 * max(n, 1):
            m_bits *= 2
    assert m_bits % 64 == 0
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, n_hashes, seed))).alias("p")
    word_rows = (
        small.select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # shiftleft's Column form only takes a literal shift count;
            # the SQL function accepts a column expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in word_rows:
        words[r["w"]] = r["bits"]
    return words, m_bits


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int | None = None,
    n_hashes: int = 5,
    seed: int = 71,
) -> DataFrame:
    """Exact ``big SEMI JOIN small`` with a bloom pre-filter on the
    probe side. Output rows are identical to the plain semi-join (the
    oracle IS the plain semi-join); only the shuffled volume differs.
    """
    words, m = build_bloom_words(small, small_key, m_bits, n_hashes, seed)
    arr = F.lit(words)
    key = F.col(big_key)
    staged = big
    test = F.lit(True)
    for i, p in enumerate(_positions(key, m, n_hashes, seed)):
        staged = staged.withColumn(f"_bp{i}", p)
        word = F.get(arr, (F.col(f"_bp{i}") / 64).cast("int"))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT))")
        test = test & (word.bitwiseAND(bit) != F.lit(0).cast("long"))
    pruned = staged.filter(test).drop(
        *[f"_bp{i}" for i in range(n_hashes)]
    )
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        big_key,
        "left_semi",
    )
