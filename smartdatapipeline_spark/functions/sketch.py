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

from typing import Iterator

import pandas as pd

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


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters: one streaming pass + exact candidate recount.
#
# The reference counts frequencies by materializing the full group-by
# (e.g. vocabulary counts in pandas); at 100 TB the full key space of a
# token/URL/user column can itself be too large to shuffle comfortably.
# The classic answer (Misra & Gries 1982; merge rule from Agarwal et al.,
# PODS'12 "Mergeable Summaries") keeps only k counters per partition:
#
#   * each executor summarizes its partition into <= k (key, est) rows —
#     O(k) state, no shuffle of the raw key space;
#   * partial sketches MERGE by summing counters and subtracting the
#     (k+1)-th largest value — the same rule used within a partition —
#     so map-side combine / tree aggregation stays valid;
#   * ANY key with true frequency > n/(k+1) is guaranteed to survive in
#     at least one partition sketch (if a key is absent from partition
#     p's sketch its count there is <= n_p/(k+1); summing over
#     partitions bounds its total by n/(k+1)) — the candidate union is a
#     SUPERSET of the true heavy hitters;
#   * a second, cheap pass recounts ONLY the <= partitions*k candidate
#     keys exactly (broadcast semi-join reaches the scan as a pushed
#     filter; the group-by shuffles <= P*k keys, not the vocabulary).
#
# Result: EXACT heavy-hitter output (keys with n*(k+1) > total, integer
# comparison — no float threshold) at a fraction of the full group-by
# shuffle, and an oracle can verify it with a plain SQL HAVING clause.
# ---------------------------------------------------------------------------


def _mg_fold(counters: dict, add: "pd.Series", k: int) -> dict:
    """Merge a batch's value counts into an MG counter dict, keeping at
    most k counters (subtract the (k+1)-th largest, drop <= 0)."""
    for key, v in add.items():
        counters[key] = counters.get(key, 0) + int(v)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {key: v - cut for key, v in counters.items() if v > cut}
    return counters


def misra_gries_partial(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Per-partition Misra–Gries sketch: <= k rows ``(key, est)`` per
    input partition (Arrow-batched; the raw column never leaves the
    executor). ``est`` is the residual counter — a lower bound on the
    key's in-partition frequency with error <= n_partition/(k+1)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_fold(counters, pdf[key_col].value_counts(), k)
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "est": list(counters.values())}
        )

    field = df.schema[key_col]
    return df.select(key_col).mapInPandas(
        gen, schema=f"`{key_col}` {field.dataType.simpleString()}, est long"
    )


def merge_mg(sketch: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Merge partial MG sketches into one global <= k-row sketch using
    the mergeable-summaries rule (sum, subtract (k+1)-th largest, drop
    <= 0). The input is already tiny (<= partitions*k rows) so this is a
    single small-shuffle aggregation + one ordered trim; the global sort
    is safe because it runs on the sketch, never the data."""
    from pyspark.sql.window import Window

    summed = sketch.groupBy(key_col).agg(F.sum("est").alias("est"))
    ranked = summed.withColumn(
        "_rk",
        F.row_number().over(Window.orderBy(F.col("est").desc(), F.col(key_col))),
    )
    # (k+1)-th largest counter, 0 when the sketch already fits in k keys
    cut = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_rk") == k + 1, F.col("est"))), F.lit(0)
        ).alias("_cut")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .withColumn("est", F.col("est") - F.col("_cut"))
        .filter(F.col("est") > 0)
        .select(key_col, "est")
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """EXACT keys with frequency > total/(k+1), via MG candidates + an
    exact recount of only the candidate keys.

    Returns ``(key_col, n)``. The threshold test is the integer
    comparison ``n * (k+1) > total`` so the result is bit-exact on any
    engine. Reference behavior anchor: the full-vocabulary counting the
    reference does in pandas (SURVEY §2 text-analysis family); this is
    the 100 TB-safe route to the same heavy tail.
    """
    total = df.count()
    cands = misra_gries_partial(df, key_col, k).select(key_col).distinct()
    exact = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.filter(F.col("n") * (k + 1) > F.lit(total))


def exact_quantile_two_pass(
    df: DataFrame,
    value_col: str,
    q: float,
    accuracy: int = 10000,
    pad: float | None = None,
):
    """EXACT global quantile (discrete convention: the element at
    1-based rank max(1, ceil(q·n)) — DuckDB's ``quantile_disc``)
    without ever sorting the full column — the 100 TB replacement for
    ``ORDER BY value`` quantiles.

    Pass 1: ``percentile_approx`` (GK sketch, rank error ≤ n/accuracy)
    brackets the answer with [q−pad, q+pad] approximations; since
    pad > 1/accuracy the true rank-k element provably lies inside the
    bracket. Pass 2 counts rows strictly below the bracket and sorts
    ONLY the bracket slice (≈ 2·pad·n rows — thousandths of the data)
    to pick the (k − n_below)-th smallest. Falls back to the exact
    global sort if the bracket ever misses (degenerate distributions).

    Returns the quantile as a Python scalar (two actions + one
    slice-sort job).
    """
    import math

    n = df.count()
    if n == 0:
        return None
    k = max(1, int(math.ceil(q * n)))
    pad = pad if pad is not None else max(4.0 / accuracy, 1e-4)
    qlo, qhi = max(0.0, q - pad), min(1.0, q + pad)
    lo, hi = df.agg(
        F.percentile_approx(value_col, [qlo, qhi], accuracy).alias("b")
    ).head()["b"]
    n_below = df.filter(F.col(value_col) < F.lit(lo)).count()
    m = k - n_below
    sliced = df.filter(
        (F.col(value_col) >= F.lit(lo)) & (F.col(value_col) <= F.lit(hi))
    )
    if 0 < m:
        row = (
            sliced.orderBy(F.col(value_col).asc())
            .limit(m)
            .agg(F.max(value_col).alias("v"))
            .head()
        )
        if row is not None and row["v"] is not None and m <= sliced.count():
            return row["v"]
    # bracket missed (can only happen on adversarial/degenerate ties):
    # exact fallback, still TakeOrdered(k) rather than a full sort
    row = (
        df.orderBy(F.col(value_col).asc())
        .limit(k)
        .agg(F.max(value_col).alias("v"))
        .head()
    )
    return row["v"]


def values_at_ranks(df, col: str, ranks: list[int], n: int) -> list:
    """Exact order statistics at several 1-based ranks of one column —
    see ``values_at_ranks_cols``, which this wraps (one column)."""
    return values_at_ranks_cols(df, {col: ranks}, n)[col]


def values_at_ranks_cols(
    df, ranks_by_col: dict[str, list[int]], n: int
) -> dict[str, list]:
    """Exact order statistics at several 1-based ranks of SEVERAL
    columns of the same frame in 2 + #cols bounded jobs total (vs 3-4
    jobs per rank through repeated ``exact_quantile_two_pass`` calls —
    the r11 bench showed the 9-probe RFM bounds path spending its time
    on job-count, not data; r14 additionally batched the per-rank
    slice sorts into one ranking job per column and shared the bracket
    jobs across columns):

    1. one GK sketch pass bracketing ALL (col, rank) pairs
       ([q−pad, q+pad] each; pad > rank error, so every true rank-k
       element provably lies in its bracket),
    2. one aggregate counting rows strictly below every lower bracket
       (and each bracket slice's size),
    3. per column, ONE ranking job over the union of its bracket
       slices (each slice ≈ 2·pad·n rows — thousandths of the data, the
       same bound the former per-rank TakeOrdered paid; a row landing
       in overlapping brackets is exploded into each): row_number
       within the slice ordered by value picks the (k − n_below)-th
       smallest, whose VALUE is tie-independent. Kept per column so
       each column's native type never passes through a lossy cast.

    DuckDB quantile_disc convention throughout: element at rank
    max(1, ceil(q·n)). Degenerate bracket misses fall back to a
    per-rank TakeOrdered(k), as before."""
    from pyspark.sql.window import Window

    accuracy = 10_000
    pad = max(4.0 / accuracy, 1e-4)
    cols = list(ranks_by_col)
    flat_by_col: dict[str, list[float]] = {}
    for col in cols:
        qs: list[float] = []
        for k in ranks_by_col[col]:
            q = (k - 0.5) / n
            qs.extend((max(0.0, q - pad), min(1.0, q + pad)))
        flat_by_col[col] = qs
    bracket_row = df.agg(
        *[
            F.percentile_approx(col, flat_by_col[col], accuracy).alias(
                f"_q_{ci}"
            )
            for ci, col in enumerate(cols)
        ]
    ).head()
    lows: dict[tuple[str, int], object] = {}
    highs: dict[tuple[str, int], object] = {}
    for ci, col in enumerate(cols):
        b = bracket_row[f"_q_{ci}"]
        for i in range(len(ranks_by_col[col])):
            lows[(col, i)] = b[2 * i]
            highs[(col, i)] = b[2 * i + 1]
    below = df.agg(
        *[
            F.sum((F.col(col) < F.lit(lows[(col, i)])).cast("long")).alias(
                f"_b_{ci}_{i}"
            )
            for ci, col in enumerate(cols)
            for i in range(len(ranks_by_col[col]))
        ],
        *[
            F.sum(
                (
                    (F.col(col) >= F.lit(lows[(col, i)]))
                    & (F.col(col) <= F.lit(highs[(col, i)]))
                ).cast("long")
            ).alias(f"_s_{ci}_{i}")
            for ci, col in enumerate(cols)
            for i in range(len(ranks_by_col[col]))
        ],
    ).head()
    out: dict[str, list] = {}
    for ci, col in enumerate(cols):
        ranks = ranks_by_col[col]
        ms: dict[int, int] = {}
        for i, k in enumerate(ranks):
            m = k - (below[f"_b_{ci}_{i}"] or 0)
            slice_n = below[f"_s_{ci}_{i}"] or 0
            if 0 < m <= slice_n:
                ms[i] = m
        found: dict[int, object] = {}
        if ms:
            # one job: every bracket's m-th smallest via row_number
            # within the exploded slice membership
            membership = F.array_compact(
                F.array(
                    *[
                        F.when(
                            (F.col(col) >= F.lit(lows[(col, i)]))
                            & (F.col(col) <= F.lit(highs[(col, i)])),
                            F.lit(i),
                        )
                        for i in ms
                    ]
                )
            )
            sl = df.select(
                F.col(col).alias("_v"), F.explode(membership).alias("_bid")
            )
            target = None
            for i, m in ms.items():
                target = (
                    F.when(F.col("_bid") == F.lit(i), F.lit(m))
                    if target is None
                    else target.when(F.col("_bid") == F.lit(i), F.lit(m))
                )
            w = Window.partitionBy("_bid").orderBy(F.col("_v").asc())
            rows = (
                sl.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == target)
                .collect()
            )
            for r in rows:
                found[r["_bid"]] = r["_v"]
        vals = []
        for i, k in enumerate(ranks):
            v = found.get(i)
            if v is None:
                # bracket missed (degenerate ties): exact fallback,
                # TakeOrdered(k) rather than a full sort
                row = (
                    df.orderBy(F.col(col).asc())
                    .limit(k)
                    .agg(F.max(col).alias("v"))
                    .head()
                )
                v = row["v"]
            vals.append(v)
        out[col] = vals
    return out



def equi_width_histogram(
    df: DataFrame, value_col: str, n_buckets: int = 20
) -> DataFrame:
    """Equi-width histogram: one min/max scan, then one grouped count —
    never a sort. Bucket edges derive from the broadcast (min, max)
    scalar pair; ``least(floor((v−min)/w), n−1)`` claps the max row
    into the last bucket. Every per-row op is a single IEEE double
    operation on identical operands, so bucket assignment (and the
    decimal value sums) are bit-identical cross-engine.

    Output: (bucket, lo, hi, n, sum_value) for non-empty buckets.
    """
    from smartdatapipeline_spark.functions.numeric import dsum

    v = F.col(value_col)
    stats = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    bucketed = df.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((v - F.col("_lo")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
        .alias("bucket"),
        v.alias("_v"),
        F.col("_lo"),
        F.col("_hi"),
    )
    w2 = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    return (
        bucketed.groupBy("bucket", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n"), dsum("_v").alias("sum_value"))
        .select(
            "bucket",
            (F.col("_lo") + F.col("bucket") * w2).alias("lo"),
            (F.col("_lo") + (F.col("bucket") + 1) * w2).alias("hi"),
            "n",
            "sum_value",
        )
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Winsorization summary: clip the column at its exact [p_lo, p_hi]
    quantiles (discrete/lower convention via ``exact_quantile_two_pass``
    — sort-free even at 100 TB) and report how the clip moved the mass.

    The quantile bounds are actual data values, so the clipped decimal
    sum stays exact; every ratio divides deterministic values.

    Output one row: (n, lo_bound, hi_bound, n_clipped_lo, n_clipped_hi,
    sum_raw, sum_winsorized, mean_winsorized).
    """
    import math

    from smartdatapipeline_spark.functions.numeric import dsum

    # r14 opt: ONE batched probe for both bounds (count + 3 bounded
    # jobs) instead of two exact_quantile_two_pass calls (~5 jobs
    # each, including a redundant second count) — identical order
    # statistics by construction (same rank max(1, ceil(q·n)), same
    # GK bracket + slice-rank discipline).
    n_rows = df.count()
    if n_rows == 0:
        lo = hi = None
    else:
        ranks = [
            max(1, int(math.ceil(p_lo * n_rows))),
            max(1, int(math.ceil(p_hi * n_rows))),
        ]
        lo, hi = values_at_ranks(df, value_col, ranks, n_rows)
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.lit(lo)), F.lit(hi))
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(lo).alias("lo_bound"),
        F.lit(hi).alias("hi_bound"),
        F.sum((v < F.lit(lo)).cast("long")).alias("n_clipped_lo"),
        F.sum((v > F.lit(hi)).cast("long")).alias("n_clipped_hi"),
        dsum(v).alias("sum_raw"),
        dsum(clipped).alias("sum_winsorized"),
        (dsum(clipped) / F.count(F.lit(1))).alias("mean_winsorized"),
    )


def grouped_quantiles_exact(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group quantiles (discrete convention — 1-based rank
    max(1, ceil(q·n))) via one rank window per group: the sort happens
    inside each group's partition (the same single shuffle a grouped
    agg needs), never globally. Each quantile is then a rank-equality
    filter on that one windowed frame.

    For groups too large to sort in one task, fall back to the global
    two-pass ``exact_quantile_two_pass`` per group, or pre-aggregate
    to (group, value, count) first.

    Output: (series, q, value) — one row per group × quantile.
    """
    from pyspark.sql.window import Window

    base = (
        df.select(F.col(group_col).alias("series"), F.col(value_col).alias("_v"))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("series").orderBy(F.col("_v").asc())
        ))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("series")))
    )
    # one pass for ALL quantiles: explode the q list AFTER the window
    # (no extra scan/sort — a per-q union re-derived the windowed frame
    # per quantile: 3 scans / 6 shuffles before, 1 scan / 2 after)
    return (
        base.select(
            "series",
            "_v",
            "_rn",
            "_n",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .filter(
            F.col("_rn")
            == F.greatest(F.ceil(F.col("q") * F.col("_n")), F.lit(1))
        )
        .select("series", "q", F.col("_v").alias("value"))
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group WEIGHTED (lower) median: the smallest value whose
    cumulative weight reaches half the group's total — e.g. the
    quantity-weighted median unit price, where a plain median would
    count a 1-unit line and a 50-unit line equally.

    One in-partition sort window builds the running weight (ties broken
    by value then a total order on weight so the cumulative is
    deterministic); the pick is `2·cum ≥ total` on exact integers —
    no doubles anywhere until the value itself.

    Output: (series, total_w, wmedian).
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("series"),
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    )
    w = (
        Window.partitionBy("series")
        .orderBy(F.col("_v").asc(), F.col("_w").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("series")
    cum = base.withColumn("_cw", F.sum("_w").over(w)).withColumn(
        "_tot", F.sum("_w").over(wt)
    )
    hit = cum.filter(F.lit(2) * F.col("_cw") >= F.col("_tot"))
    return (
        hit.groupBy("series")
        .agg(
            F.min("_tot").alias("total_w"),
            F.min("_v").alias("wmedian"),
        )
    )


# ── HyperLogLog — mergeable distinct-count sketch ────────────────────
#
# Flajolet et al. 2007. The summary per group is the register table
# (bucket → max rho), built from a PORTABLE 60-bit md5 hash (same
# discipline as functions/dedup.h60) so Spark and any SQL oracle derive
# identical registers: bucket = top p hash bits, rho = leading-zero
# count of the remaining 60-p bits + 1, computed with pure integer/
# string ops (base-2 string length — no floats, no platform popcount).
#
# Registers are the 100-TB primitive: per-day/per-partition partials
# merge by bucket-wise MAX without rescanning data (daily → monthly
# distinct users is a 4 KB-per-group merge instead of a 100 TB scan),
# and map-side combine collapses each scan task to ≤ m rows before the
# shuffle.
#
# The estimator is split deliberately:
#   hll_raw_estimate — the harmonic-mean formula only, computed as ONE
#     double division of exact integers (a Python-precomputed constant
#     over Σ2^(K−rho)), so it is bit-identical on every engine and can
#     sit behind a hash-compare oracle. Emits `small_range` so callers
#     know when the raw figure is biased.
#   hll_estimate — adds the standard linear-counting small-range
#     correction m·ln(m/V). ln is NOT cross-engine bit-stable (JVM
#     Math.log is within-1-ulp, not correctly rounded — measured ~6%
#     last-ulp disagreement vs C libm in the BM25 work), so this is the
#     production estimator but not the oracle surface.

HLL_SALT = "hll-v1:"


def _h60_of(col: "F.Column"):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_partial(
    df: DataFrame, key_col: str, by: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Register table (by…, bucket, rho) for the distinct count of
    ``key_col`` per ``by`` group. Mergeable: `hll_merge`. p ∈ [4, 16]."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_partial: p must be in [4,16], got {p}")
    by = list(by or [])
    wbits = 60 - p
    h = _h60_of(F.concat(F.lit(HLL_SALT), F.col(key_col).cast("string")))
    bucket = F.shiftrightunsigned(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    # rho = wbits - bit_length(w) + 1; bit_length via the base-2 string
    # (exact integer op on both engines; w = 0 has no leading 1 at all)
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.conv(w.cast("string"), 10, 2)))
        .cast("int")
    )
    return (
        df.select(*by, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Merge two register tables: bucket-wise max. Associative and
    idempotent — daily partials fold into monthly/united sketches in
    any order, including re-merging overlapping windows."""
    by = list(by or [])
    return (
        a.unionByName(b)
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_reaggregate(
    reg: DataFrame, drop: list[str], by: list[str] | None = None
) -> DataFrame:
    """Coarsen a register table by folding out grouping columns (e.g.
    per-day → per-metric): bucket-wise max over the surviving keys."""
    by = [c for c in (by or []) if c not in set(drop)]
    return reg.groupBy(*by, "bucket").agg(F.max("rho").alias("rho"))


def hll_raw_estimate(
    reg: DataFrame, by: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Cross-engine-exact raw HLL estimate per group.

    Z's reciprocal sum is kept as an exact integer over the common
    denominator 2^K (K = max rho = 61−p): Σ2^(K−rho) ≤ m·2^K = 2^61
    fits a BIGINT, so the only float op is the final single division
    raw_est = C / z_num with C = alpha·m²·2^K precomputed in Python and
    embedded as the same double literal in Spark and oracle SQL.

    Output: (by…, buckets_used, v_empty, z_num, raw_est, small_range).
    """
    by = list(by or [])
    m = 1 << p
    k = 61 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    c_num = alpha * m * m * float(1 << k)
    # SQL-form shiftleft: the Python F.shiftleft requires a literal int
    # shift amount (PySparkTypeError on a Column), the SQL function
    # accepts any integral expression.
    agg = reg.groupBy(*by).agg(
        F.count("*").cast("long").alias("buckets_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rho)"))
        .cast("long")
        .alias("_z_present"),
    )
    v_empty = (F.lit(m).cast("long") - F.col("buckets_used")).alias("v_empty")
    z_num = (
        F.col("_z_present") + (F.lit(m) - F.col("buckets_used")) * F.lit(1 << k)
    ).cast("long")
    out = agg.select(
        *by,
        F.col("buckets_used"),
        v_empty,
        z_num.alias("z_num"),
        (F.lit(c_num) / z_num.cast("double")).alias("raw_est"),
    )
    return out.withColumn(
        "small_range",
        (F.col("v_empty") > 0) & (F.col("raw_est") <= F.lit(2.5 * m)),
    )


def hll_estimate(
    reg: DataFrame, by: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Production estimator: raw harmonic-mean figure with the standard
    linear-counting correction on the small range (E ≤ 2.5m and empty
    buckets present ⇒ E := m·ln(m/V)). Uses ln — accurate, mergeable,
    but not cross-engine bit-stable; the oracle surface is
    `hll_raw_estimate`."""
    m = 1 << p
    raw = hll_raw_estimate(reg, by=by, p=p)
    corrected = F.when(
        F.col("small_range"),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty").cast("double")),
    ).otherwise(F.col("raw_est"))
    return raw.withColumn("estimate", corrected)


# ── Count–Min sketch — mergeable frequency summary ───────────────────
#
# Cormode & Muthukrishnan 2005. depth×width counter grid; row i uses an
# independent salted md5 hash. Partials are (row, cell, n) counts that
# merge by SUM (map-side combine collapses each task to ≤ depth·width
# rows), and a point lookup is min over rows — always ≥ the true count,
# overestimating by at most ε·N with prob 1−δ (ε = e/width,
# δ = e^−depth). Everything is integer arithmetic on portable hashes,
# so build, merge, and lookup are all bit-exact across engines.
#
# vs misra_gries/heavy_hitters above: MG keeps the top-k candidates
# (biased down, small fixed state), CMS answers ANY point query
# (biased up) and supports deletes/joins of sketches; a 100-TB corpus
# health job typically wants both.

CMS_SALT = "cms-v1:"


def cms_partial(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Counter cells (row, cell, n) for the multiset of ``key_col``
    (optionally weighted). Mergeable by SUM (`cms_merge`)."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms_partial: bad dims depth={depth} width={width}")
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    keyed = df.select(
        F.col(key_col).cast("string").alias("_k"),
        (F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")).alias(
            "_w"
        ),
    ).select("_k", "_w", rows)
    cell = (
        _h60_of(
            F.concat(
                F.lit(CMS_SALT),
                F.col("row").cast("string"),
                F.lit(":"),
                F.col("_k"),
            )
        )
        % width
    ).alias("cell")
    return (
        keyed.select("row", cell, "_w")
        .groupBy("row", "cell")
        .agg(F.sum("_w").alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge counter grids: cell-wise sum (associative, commutative)."""
    return (
        a.unionByName(b).groupBy("row", "cell").agg(F.sum("n").alias("n"))
    )


def cms_lookup(
    cms: DataFrame, probes: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for every probe key: est = min over rows
    of the addressed cells (absent cell ⇒ 0). Broadcast the sketch —
    it is ≤ depth·width rows by construction — so the probe side
    never shuffles. Output: (key_col, est)."""
    from pyspark.sql.functions import broadcast

    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    addressed = probes.select(F.col(key_col).cast("string").alias(key_col)).select(
        key_col, rows
    )
    cell = (
        _h60_of(
            F.concat(
                F.lit(CMS_SALT),
                F.col("row").cast("string"),
                F.lit(":"),
                F.col(key_col),
            )
        )
        % width
    ).alias("cell")
    joined = addressed.select(key_col, "row", cell).join(
        broadcast(cms), on=["row", "cell"], how="left"
    )
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).alias("est"))
    )


# ── K-Minimum-Values — mergeable distinct sketch WITH set algebra ────
#
# Bar-Yossef et al. 2002 (the KMV / bottom-k estimator; the Theta
# sketch of Apache DataSketches is its productionized form). The
# summary per group is the k SMALLEST distinct portable-md5 h60 values
# of the keys — a uniform sample of the key space's order statistics.
#
# Why keep this next to HLL: HLL registers merge by max and estimate
# cardinality, but two HLL sketches cannot be INTERSECTED. KMV
# sketches can — the k smallest of A ∪ B is computable from the two
# sketches alone, and membership of those values in A's/B's sketch
# estimates Jaccard, hence |A ∩ B| (the distinct-audience-overlap
# question: "how many users did BOTH purchase and click this month"
# without rescanning either side). Everything is exact integer order
# statistics on the shared h60 hash, so Spark and any SQL oracle agree
# bit-for-bit on the SKETCH; the estimators are one double division of
# exact integers (cross-engine bit-stable, same discipline as
# hll_raw_estimate).
#
# Scale shape: the build is distinct(hash) → per-group rank ≤ k — the
# same one shuffle an exact COUNT(DISTINCT) pays, but the OUTPUT is
# ≤ k rows per group, so downstream merges/intersections never touch
# the data again (the same daily→period amortization as the HLL
# registers; see scale_probe hll_merge). The rank is a window over the
# group's distinct hashes — spillable sort, no collect_list buffering
# of unbounded groups on any executor.

KMV_SALT = "kmv-v1:"
_KMV_DOMAIN = float(1 << 60)  # h60 values are uniform on [0, 2^60)


def _bottom_k(
    hashed: DataFrame, by: list[str], k: int, extra: list[str] | None = None
) -> DataFrame:
    """Exact per-group bottom-k of a distinct ``h`` column, two-level:
    bottom-k within 256 hash-derived sub-buckets of each group (256
    parallel spillable sorts), then bottom-k of the ≤ 256·k survivors.
    Identical result to a single group-wide rank — the global k
    smallest are each among their own bucket's k smallest — but no
    group (and in the global by=[] case, no single task) ever sorts
    more than its bucket's share. Same two-level discipline as the
    PageRank hub fold (functions/graph.py). ``extra`` columns ride
    through as payload (r14: the set-algebra membership flags)."""
    from pyspark.sql.window import Window

    bucket = F.shiftrightunsigned(F.col("h"), 52)  # top 8 of 60 bits
    w1 = Window.partitionBy(*[F.col(c) for c in by], bucket).orderBy("h")
    pruned = (
        hashed.withColumn("_bpos", F.row_number().over(w1))
        .filter(F.col("_bpos") <= k)
        .drop("_bpos")
    )
    w2 = Window.partitionBy(*[F.col(c) for c in by] or [F.lit(1)]).orderBy("h")
    return (
        pruned.withColumn("pos", F.row_number().over(w2))
        .filter(F.col("pos") <= k)
        .select(*by, "pos", "h", *(extra or []))
    )


def kmv_partial(
    df: DataFrame, key_col: str, by: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Bottom-k sketch (by…, pos, h): the ``k`` smallest distinct h60
    hashes of ``key_col`` per group, pos = 1-based rank. Mergeable:
    `kmv_merge`."""
    if k < 2:
        raise ValueError(f"kmv_partial: k must be >= 2, got {k}")
    by = list(by or [])
    h = _h60_of(F.concat(F.lit(KMV_SALT), F.col(key_col).cast("string")))
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*by, h.alias("h"))
        .distinct()
    )
    return _bottom_k(hashed, by, k)


def kmv_merge(
    a: DataFrame, b: DataFrame, by: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Merge two bottom-k sketches: the k smallest of the DISTINCT
    union of their hash sets — associative, commutative, idempotent
    (safe for overlapping/at-least-once daily partials). Inputs are
    ≤ k rows per group, so this never touches data volume."""
    by = list(by or [])
    u = a.select(*by, "h").unionByName(b.select(*by, "h")).distinct()
    return _bottom_k(u, by, k)


def kmv_fold(
    parts: DataFrame, by: list[str] | None = None, k: int = 64
) -> DataFrame:
    """n-ary `kmv_merge`: fold MANY stacked bottom-k partials (e.g. a
    date range of daily sketches read from a store) into one sketch per
    group — the k smallest of the distinct union of their hash sets.
    Input is ≤ k rows per (group, partial); volume-independent."""
    by = list(by or [])
    u = parts.select(*by, "h").distinct()
    return _bottom_k(u, by, k)


def kmv_distinct(
    sketch: DataFrame, by: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch.

    If the group holds fewer than k hashes the sketch IS the distinct
    hash set and the answer is exact (``est = n_vals``, exact=true).
    Otherwise the classic unbiased bottom-k estimator
    ``(k−1) / U_(k)`` with U_(k) = h_k / 2^60: computed as ONE double
    division of exact integers — the Python-precomputed constant
    (k−1)·2^60 over the exact kth hash — so it is bit-identical on any
    engine (rel. std. err ≈ 1/sqrt(k−2)).

    Output: (by…, n_vals, kth_h, est, exact).
    """
    by = list(by or [])
    c_num = float(k - 1) * _KMV_DOMAIN
    agg = sketch.groupBy(*by).agg(
        F.count("*").cast("long").alias("n_vals"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("kth_h"),
    )
    exact = F.col("n_vals") < k
    return agg.select(
        *by,
        "n_vals",
        "kth_h",
        F.when(exact, F.col("n_vals").cast("double"))
        .otherwise(F.lit(c_num) / F.col("kth_h").cast("double"))
        .alias("est"),
        exact.alias("exact"),
    )


def _flagged_union_bottom_k(
    a: DataFrame, b: DataFrame, by: list[str], k: int
) -> DataFrame:
    """The k smallest of the distinct A ∪ B hash set, each row carrying
    exact membership flags (_in_a, _in_b).

    r14 (optimization guide §2.3 "aggregate before you shuffle" /
    §2.4): the former combined-sketch shape built the union bottom-k
    and then SEMI/ANTI-JOINED it back against each input sketch to
    test membership — consuming each (often events-scan-derived)
    sketch subtree two or three times and paying two join shuffles.
    Tagging origin flags before the union and max-folding them in the
    same aggregation that dedups the union gives the identical
    distinct set and identical membership booleans (max over {0,1}
    origin markers per (group, h) == "h present in that sketch") with
    each input consumed exactly ONCE and no joins. Downstream counts /
    estimator arithmetic are unchanged, so every output is
    bit-identical."""
    sa = a.select(
        *by, "h", F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b")
    )
    sb = b.select(
        *by, "h", F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b")
    )
    flagged = (
        sa.unionByName(sb)
        .groupBy(*by, "h")
        .agg(
            F.max("_in_a").alias("_in_a"),
            F.max("_in_b").alias("_in_b"),
        )
    )
    return _bottom_k(flagged, by, k, extra=["_in_a", "_in_b"])


def kmv_intersect(
    a: DataFrame,
    b: DataFrame,
    by: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Distinct-intersection estimate of two keyed populations from
    their bottom-k sketches alone — the set operation HLL cannot do.

    Combined-sketch rule (DataSketches' a-priori Theta intersection):
    S = the k smallest of A ∪ B (from the sketches — no data rescan);
    every member of S carries exact membership flags for BOTH input
    sketches (origin markers max-folded in the union dedup — r14, see
    ``_flagged_union_bottom_k``). With θ = kth smallest of the
    union, ``match_frac = |S ∩ A ∩ B| / |S|`` estimates
    |A ∩ B| / |A ∪ B| (Jaccard), and ``inter_est = match_frac ·
    union_est``. All counts are exact integers; the two divisions are
    IEEE-exact on both engines.

    Output: (by…, union_n_vals, union_kth_h, union_est, n_match,
    jaccard_est, inter_est).
    """
    by = list(by or [])
    u = _flagged_union_bottom_k(a, b, by, k)
    # single aggregation over the flagged bottom-k: the union estimate's
    # inputs (count, kth hash — kmv_distinct's exact expressions) and
    # the match count fold in ONE pass, so the union subtree has one
    # consumer and the former u_est ⋈ m join disappears (r14). n_match
    # as a conditional sum equals the former filtered count exactly
    # (coalesce(missing-group, 0) == sum of zeros).
    c_num = float(k - 1) * _KMV_DOMAIN
    agg = u.groupBy(*by).agg(
        F.count("*").cast("long").alias("union_n_vals"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("union_kth_h"),
        F.sum(
            F.when(
                (F.col("_in_a") == 1) & (F.col("_in_b") == 1), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_match"),
    )
    union_est = (
        F.when(
            F.col("union_n_vals") < k, F.col("union_n_vals").cast("double")
        )
        .otherwise(F.lit(c_num) / F.col("union_kth_h").cast("double"))
        .alias("union_est")
    )
    jac = F.col("n_match").cast("double") / F.col("union_n_vals").cast(
        "double"
    )
    return agg.select(
        *by,
        "union_n_vals",
        "union_kth_h",
        union_est,
        "n_match",
    ).select(
        *by,
        "union_n_vals",
        "union_kth_h",
        "union_est",
        "n_match",
        jac.alias("jaccard_est"),
        (jac * F.col("union_est")).alias("inter_est"),
    )


def kmv_difference(
    a: DataFrame,
    b: DataFrame,
    by: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Distinct-difference estimate |A \\ B| from bottom-k sketches
    alone (round 10) — "how many of this week's actives were NOT active
    last week", answered from stored daily partials with no rescan.

    Same combined-sketch rule as `kmv_intersect`: S = the k smallest of
    A ∪ B; members of S that are in A but NOT in B (exact membership
    flags from the union dedup — r14) give ``diff_frac = |S ∩ (A \\ B)| / |S|``,
    and ``diff_est = diff_frac · union_est``. All counts exact
    integers; the two divisions are IEEE-exact on both engines.

    Output: (by…, union_n_vals, union_kth_h, union_est, n_only_a,
    only_a_frac, diff_est).
    """
    by = list(by or [])
    u = _flagged_union_bottom_k(a, b, by, k)
    # single-pass fold, same shape as kmv_intersect (r14): union
    # estimate inputs and the only-in-A count from one aggregation of
    # the flagged bottom-k — no join-back.
    c_num = float(k - 1) * _KMV_DOMAIN
    agg = u.groupBy(*by).agg(
        F.count("*").cast("long").alias("union_n_vals"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("union_kth_h"),
        F.sum(
            F.when(
                (F.col("_in_a") == 1) & (F.col("_in_b") == 0), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_only_a"),
    )
    union_est = (
        F.when(
            F.col("union_n_vals") < k, F.col("union_n_vals").cast("double")
        )
        .otherwise(F.lit(c_num) / F.col("union_kth_h").cast("double"))
        .alias("union_est")
    )
    frac = F.col("n_only_a").cast("double") / F.col("union_n_vals").cast(
        "double"
    )
    return agg.select(
        *by,
        "union_n_vals",
        "union_kth_h",
        union_est,
        "n_only_a",
    ).select(
        *by,
        "union_n_vals",
        "union_kth_h",
        "union_est",
        "n_only_a",
        frac.alias("only_a_frac"),
        (frac * F.col("union_est")).alias("diff_est"),
    )


# ── Bloom filter — mergeable membership sketch ───────────────────────
#
# Bloom 1970. Rounds out the mergeable-summary suite: distinct count
# (HLL registers), set algebra on distincts (KMV), point frequency
# (Count-Min), and now MEMBERSHIP — "was this user/url/doc-id present
# in partition X" — with no false negatives and a tunable
# false-positive rate (1−e^{−kn/m})^k.
#
# Unlike bloom.py's bloom_semi_join (a broadcast bitmap literal built
# with Spark-private xxhash64 for plan-local row pruning), this family
# is a PERSISTED TABLE of words built from the portable md5-h60 hash:
# daily bloom words OR-merge into weekly/monthly filters without
# rescans, and a SQL oracle rebuilds every word bit-for-bit. Words are
# 60 bits wide (not 64): the largest mask is 1<<59, positive in a
# signed BIGINT on every engine (DuckDB overflow-checks 1<<63;
# Java/Spark silently wraps negative — 60 sidesteps both).
#
# Scale shape: the build is scan + one groupBy(word) bit_or with
# map-side combine (each task emits ≤ m/60 words); merge is bit_or on
# word tables (≤ m/60 rows per group, volume-independent — same 0.01
# exponent class as hll_merge); probes broadcast the words.

BLOOM_SALT = "bloom-v1:"
_BLOOM_WORD = 60  # bits per word — max mask 1<<59 stays positive


def bloom_partial(
    df: DataFrame,
    key_col: str,
    by: list[str] | None = None,
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom word table (by…, word, bits) for the key set per group.
    Mergeable: `bloom_merge` (bit_or). ``m_bits`` should be sized at
    ~10 bits/key for ~1% FPR at k=4."""
    if m_bits < _BLOOM_WORD or n_hashes < 1:
        raise ValueError(f"bloom_partial: bad dims m={m_bits} k={n_hashes}")
    by = list(by or [])
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        *by, F.col(key_col).cast("string").alias("_k")
    )
    i = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("_i")
    exploded = keyed.select(*by, "_k", i).select(
        *by,
        F.expr(
            f"CAST(({_pos_sql(m_bits)}) DIV {_BLOOM_WORD} AS BIGINT)"
        ).alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(({_pos_sql(m_bits)}) % {_BLOOM_WORD} AS INT))"
        ).alias("_mask"),
    )
    return (
        exploded.groupBy(*by, "word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def _pos_sql(m_bits: int) -> str:
    """SQL expression for the bit position of hash round `_i` of key
    `_k` — shared verbatim between build and probe so the two sides
    address identical bits."""
    return (
        "conv(substring(md5(concat('bloom-v1:', CAST(_i AS STRING), ':', _k)),"
        f" 1, 15), 16, 10) % {m_bits}"
    )


def bloom_merge(
    a: DataFrame, b: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Merge word tables: word-wise bit_or — associative, commutative,
    idempotent (at-least-once-safe, like the HLL/KMV merges)."""
    by = list(by or [])
    return (
        a.unionByName(b).groupBy(*by, "word").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_fold(parts: DataFrame, by: list[str] | None = None) -> DataFrame:
    """n-ary `bloom_merge`: fold stacked word tables (e.g. a date range
    of daily filters from a store) into one per group — word-wise
    bit_or. Input is ≤ m/60 rows per (group, partial)."""
    by = list(by or [])
    return (
        parts.groupBy(*by, "word").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Membership test for every probe key: true iff ALL k addressed
    bits are set — NO false negatives; false positives at the designed
    rate. The word table is broadcast (≤ m/60 rows by construction);
    the probe side never shuffles. Output: (key_col, might_contain)."""
    from pyspark.sql.functions import broadcast

    i = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("_i")
    addressed = (
        probes.select(F.col(key_col).cast("string").alias(key_col))
        .withColumn("_k", F.col(key_col))
        .select(key_col, "_k", i)
        .select(
            key_col,
            F.expr(
                f"CAST(({_pos_sql(m_bits)}) DIV {_BLOOM_WORD} AS BIGINT)"
            ).alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(({_pos_sql(m_bits)}) % {_BLOOM_WORD} AS INT))"
            ).alias("_mask"),
        )
    )
    hit = addressed.join(broadcast(bloom), on="word", how="left").select(
        key_col,
        ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask"))) != 0)
        .cast("int")
        .alias("_hit"),
    )
    return hit.groupBy(key_col).agg(
        (F.min("_hit") == 1).alias("might_contain")
    )


def hll_rollup(
    df: DataFrame,
    key_col: str,
    dims: list[str],
    p: int = 8,
) -> DataFrame:
    """Hierarchical distinct estimates — leaf, every prefix, grand
    total — from ONE data scan (round 9).

    The ROLLUP-shaped alternative (`GROUP BY ROLLUP(dims, bucket)`)
    pushes every hashed row through Catalyst's Expand ×(levels) before
    the shuffle; this instead builds the LEAF register table once and
    derives each coarser grain by `hll_reaggregate` — the fold inputs
    are ≤ days×m register rows (volume-independent, scale-probe
    exponent 0.01), so the cascade is ~free while the scan happens
    once. Register algebra (bucket-max) makes the cascade EXACT: the
    folded registers equal what sketching the coarser grain directly
    would produce — same identity the `kpi_monthly_distinct` oracle
    pins.

    ``gid`` follows `operators/kpi.kpi_rollup`'s grouping_id
    convention over ``dims`` (bit i set = dims[i] folded): 0 = leaf,
    then 1, 3, 7… as the rightmost dims fold away; folded dims are
    NULL in the output.

    Output: (dims…, gid, buckets_used, v_empty, z_num, raw_est,
    small_range).
    """
    if not dims:
        raise ValueError("hll_rollup: dims must be non-empty")
    # UNCACHED leaf (r14, measured twice): caching the leaf register
    # table looked right (each cascade level consumes its register
    # frame twice) but a clean-window alternating A/B ran the cached
    # shape consistently SLOWER (1.8-2.4 s vs 1.3-1.5 s warm at
    # sf0.1) — the leaf is |dims-cartesian| × 2^p rows (~600k here,
    # not small), and the materialization barrier + cache read beats
    # recompute-with-AQE-reuse. Same funnel()/cooccurrence lesson.
    leaf = hll_partial(df, key_col, by=dims, p=p)
    out = None
    reg = leaf
    kept = list(dims)
    gid = 0
    while True:
        est = hll_raw_estimate(reg, by=kept, p=p)
        for d in dims:
            if d not in kept:
                est = est.withColumn(d, F.lit(None).cast(leaf.schema[d].dataType))
        est = est.select(
            *dims,
            F.lit(gid).cast("long").alias("gid"),
            "buckets_used",
            "v_empty",
            "z_num",
            "raw_est",
            "small_range",
        )
        out = est if out is None else out.unionByName(est)
        if not kept:
            break
        folded = kept.pop()  # fold rightmost dim, like ROLLUP
        gid = gid * 2 + 1
        reg = hll_reaggregate(reg, drop=[folded], by=kept + [folded])
    return out


# ── Dyadic-CMS quantile sketch — mergeable quantiles ─────────────────
#
# Cormode & Muthukrishnan 2005 §4 (range sums via dyadic decomposition
# over Count-Min): completes the mergeable-summary suite — distinct
# (HLL), set algebra (KMV), frequency (CMS), membership (Bloom), and
# now QUANTILES. The engine's exact quantile paths
# (exact_quantile_two_pass, grouped_quantiles_exact) rescan/sort the
# data per question; this sketch is built once per partition/day,
# merges by SUM, and answers any quantile from the summary alone.
#
# Construction: values are mapped to an integer domain [0, 2^L) (the
# caller supplies the scale — e.g. cents for currency), and every
# value increments ONE counter per dyadic level l: key = v >> l,
# hashed into that level's own CMS row-grid. A rank query walks the
# dyadic tree top-down, at each level asking "how much mass sits in
# the left child's range" (one CMS point lookup, overestimate ≤ ε·n)
# and descending until the leaf = the quantile value. Rank error is
# ≤ L·ε·n with prob 1−δ per level — width 2048, depth 4, L=20 gives
# ~2.7% worst-case rank error per level sum at δ = e⁻⁴.
#
# Scale shape: the build explodes ×L levels but every level collapses
# map-side to ≤ depth·width cells (same combine as cms_partial), so
# the shuffle carries ≤ L·depth·width rows per task regardless of
# volume; merge is cell-wise SUM on bounded tables; the quantile walk
# runs on a COLLECTED sketch (≤ L·depth·width cells — bounded by
# construction, the same justified-collect class as the bloom bitmap).

DYADIC_SALT = "dcms-v1:"


def dyadic_cms_partial(
    df: DataFrame,
    value_col: str,
    levels: int = 20,
    depth: int = 4,
    width: int = 2048,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-level CMS grids for the dyadic decomposition of an integer
    column (caller pre-scales floats; values clamp into [0, 2^levels)).
    ``by`` (round 10) keys every grid cell by the group — one
    independent dyadic sketch per (source, metric, …), the grouped
    analog of the reference's per-series distribution math
    (backend/app/services/anomaly.py consumes per-series
    distributions). Output: (by…, level, row, cell, n) — mergeable by
    SUM within the same group."""
    if depth < 1 or width < 2 or not 1 <= levels <= 62:
        raise ValueError(
            f"dyadic_cms_partial: bad dims levels={levels} depth={depth} width={width}"
        )
    by = list(by or [])
    cap = (1 << levels) - 1
    v = F.col(value_col).cast("long")
    v = F.when(v < 0, F.lit(0)).when(v > cap, F.lit(cap)).otherwise(v)
    lv = F.explode(F.sequence(F.lit(0), F.lit(levels - 1))).alias("level")
    rw = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    keyed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*by, v.alias("_v"))
        .select(*by, "_v", lv)
        .select(*by, "_v", "level", rw)
        .withColumn(
            "_key", F.expr("shiftrightunsigned(_v, level)")
        )
    )
    cell = (
        _h60_of(
            F.concat(
                F.lit(DYADIC_SALT),
                F.col("level").cast("string"),
                F.lit(":"),
                F.col("row").cast("string"),
                F.lit(":"),
                F.col("_key").cast("string"),
            )
        )
        % width
    ).alias("cell")
    return (
        keyed.select(*by, "level", "row", cell)
        .groupBy(*by, "level", "row", "cell")
        .agg(F.count("*").cast("long").alias("n"))
    )


def dyadic_cms_merge(
    a: DataFrame, b: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Merge dyadic grids: cell-wise sum per (group, level) —
    associative. ``by`` must match the grids' grouping columns."""
    by = list(by or [])
    return (
        a.unionByName(b)
        .groupBy(*by, "level", "row", "cell")
        .agg(F.sum("n").alias("n"))
    )


def _dyadic_walk(
    cells: dict[tuple[int, int, int], int],
    qs: list[float],
    total_n: int,
    levels: int,
    depth: int,
    width: int,
) -> list[int]:
    """Quantile walk over one group's collected cell map: for each q,
    descend the dyadic tree top-down — take the left child if its
    (overestimated) mass covers the remaining target rank, else
    subtract and go right. Returns one integer per q."""
    import hashlib

    def lookup(level: int, key: int) -> int:
        est = None
        for row in range(depth):
            h = int(
                hashlib.md5(
                    f"{DYADIC_SALT}{level}:{row}:{key}".encode()
                ).hexdigest()[:15],
                16,
            )
            n = cells.get((level, row, h % width), 0)
            est = n if est is None else min(est, n)
        return est or 0

    out = []
    for q in qs:
        target = max(1, int(q * total_n))
        prefix = 0  # the root: key 0 at (virtual) level `levels`
        for level in range(levels - 1, -1, -1):
            left = prefix << 1  # left child's key at this level
            mass = lookup(level, left)
            if mass >= target:
                prefix = left
            else:
                target -= mass
                prefix = left + 1
        out.append(prefix)
    return out


def dyadic_cms_quantiles(
    sketch: DataFrame,
    qs: list[float],
    total_n: int,
    levels: int = 20,
    depth: int = 4,
    width: int = 2048,
) -> list[int]:
    """Answer quantiles from the collected sketch alone (bounded:
    ≤ levels·depth·width cells — the same justified-collect class as
    the bloom bitmap). Returns one integer (pre-scaled domain) per q."""
    cells: dict[tuple[int, int, int], int] = {}
    for r in sketch.collect():
        cells[(r["level"], r["row"], r["cell"])] = r["n"]
    return _dyadic_walk(cells, qs, total_n, levels, depth, width)


def dyadic_cms_quantiles_grouped(
    sketch: DataFrame,
    qs: list[float],
    totals: dict[tuple, int],
    by: list[str],
    levels: int = 20,
    depth: int = 4,
    width: int = 2048,
) -> dict[tuple, list[int]]:
    """Per-group quantiles from a GROUPED dyadic sketch (round 10) —
    mergeable per-(source, metric) quantiles, the grouped analog the
    reference's per-series distribution math implies.

    ``totals`` maps each group key tuple (values of ``by``, in order)
    to its row count — the caller already has these from the same scan
    that built the sketch (a groupBy count) or from stored partials.
    The collected summary is ≤ |groups|·levels·depth·width cells;
    |groups| is dimension-bounded (sources × metrics), the same
    justified-collect class as the global walk. Groups present in
    ``totals`` but absent from the sketch get empty-data quantiles
    (all zeros) only if asked — they are simply omitted here.

    Returns {group_key_tuple: [quantile_per_q]}."""
    by_cells: dict[tuple, dict[tuple[int, int, int], int]] = {}
    for r in sketch.collect():
        g = tuple(r[c] for c in by)
        by_cells.setdefault(g, {})[(r["level"], r["row"], r["cell"])] = r["n"]
    out: dict[tuple, list[int]] = {}
    for g, cells in by_cells.items():
        if g not in totals:
            raise ValueError(
                f"dyadic_cms_quantiles_grouped: no total for group {g!r}"
            )
        out[g] = _dyadic_walk(cells, qs, totals[g], levels, depth, width)
    return out
