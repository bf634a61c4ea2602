"""Z-order (Morton curve) data layout for multi-dimensional pruning.

The reference serves point/range lookups from SQLite b-trees (one
clustered order). A 100 TB parquet lake gets its "index" from file- and
row-group-level min/max statistics: a scan skips any file whose
[min,max] envelope misses the predicate. Sorting by a single column
makes those envelopes tight in ONE dimension only; interleaving the bits
of two (or more) scaled columns — the Morton / Z-order curve, the same
layout Delta/Iceberg expose as ``OPTIMIZE ZORDER BY`` — keeps envelopes
tight in EVERY interleaved dimension at once, so a query filtering on
either (or both) columns prunes most files before reading a byte.

Everything here is deterministic integer/double arithmetic expressible
in ANSI SQL, so the curve itself is oracle-checkable bit-for-bit:

  scaled_i = least(floor((x_i - min_i) * 2^bits / (max_i - min_i)),
                   2^bits - 1)              -- rank-free min/max scaling
  z        = Σ_b Σ_i ((scaled_i >> b) & 1) << (b*ncols + i)

The write path is one range-repartition on ``z`` (a single shuffle —
the same cost as any global sort) + an in-partition sort; at cluster
scale the range partitioner's sampling handles skew and AQE coalesces
small output files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) using global
    min/max. Pure double arithmetic in a fixed operation order so an
    oracle engine reproduces the exact same lattice cell per row."""
    span = cmax.cast("double") - cmin.cast("double")
    b = F.lit(float(1 << bits))
    scaled = F.floor((col.cast("double") - cmin.cast("double")) * b / span)
    return (
        F.when(span <= 0, F.lit(0))
        .otherwise(F.least(scaled, F.lit((1 << bits) - 1)))
        .cast("long")
    )


def interleave2(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit ``i``
    of ``a`` lands at position ``2i``, of ``b`` at ``2i+1``. Built from
    shift/and/add terms — all whole-stage-codegen JVM expressions, no
    UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def interleave_k(cols: list[Column], bits: int) -> Column:
    """Morton-interleave k ``bits``-wide non-negative ints (r11 — the
    Delta OPTIMIZE ZORDER shape supports N columns): bit ``i`` of
    column ``j`` lands at position ``i·k + j``. k·bits shift/and/add
    terms — all whole-stage-codegen JVM expressions, no UDF. Total key
    width k·bits must stay ≤ 62 (long)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"interleave_k: {k} cols × {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append ``_z``: the Morton key over k ≥ 2 numeric columns, scaled
    by the frame's global min/max (one tiny agg, broadcast to every
    row). Two columns keep the original ``interleave2`` bit order
    (stable with pre-r11 layouts); k > 2 uses ``interleave_k``.
    """
    if len(cols) < 2:
        raise ValueError("zorder_key interleaves at least two columns")
    uniq = list(dict.fromkeys(cols))
    aggs = []
    for c in uniq:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    scaled = [
        minmax_scale(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits)
        for c in cols
    ]
    if len(cols) == 2:
        key = interleave2(scaled[0], scaled[1], bits)
    else:
        key = interleave_k(scaled, bits)
    drop = [f"_min_{c}" for c in uniq] + [f"_max_{c}" for c in uniq]
    return out.withColumn("_z", key).drop(*drop)


def zorder_key_with_domain(
    df: DataFrame, cols: list[str], domain: dict, bits: int = 8
) -> DataFrame:
    """Append ``_z`` scaled by an EXPLICIT per-column domain
    ``{col: (min, max)}`` instead of the frame's own min/max — the
    incremental-maintenance form (r12 VERDICT #1): today's small
    batches must land on the SAME lattice the existing z-batches were
    keyed on, or their Morton keys aren't comparable to the recorded
    z-extents. Values outside the domain clamp to the edge cells
    (greatest/least), so drift in new data degrades envelope tightness
    gracefully instead of corrupting the curve."""
    if len(cols) < 2:
        raise ValueError("zorder_key_with_domain interleaves at least two columns")
    scaled = []
    for c in cols:
        lo, hi = domain[c]
        s = minmax_scale(F.col(c), F.lit(lo), F.lit(hi), bits)
        scaled.append(F.greatest(F.lit(0), F.least(s, F.lit((1 << bits) - 1))))
    key = interleave2(scaled[0], scaled[1], bits) if len(cols) == 2 else interleave_k(scaled, bits)
    return df.withColumn("_z", key)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-repartition on the Morton key (one shuffle; range boundaries
    come from Spark's reservoir sampling, so skewed curves still split
    evenly) then sort within each file so row-group stats are tight too.
    """
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_report(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file [min,max] envelopes for ``cols`` from parquet footers —
    the same statistics a cluster-scale scan consults to skip files.
    Driver-side (footers only, no data read); used by tests and PERF
    audits to quantify clustering quality."""
    import pyarrow.parquet as pq
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        env: dict = {"file": name, "rows": md.num_rows}
        schema_names = md.schema.to_arrow_schema().names
        for col in cols:
            idx = schema_names.index(col)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            env[f"{col}_min"], env[f"{col}_max"] = lo, hi
        out.append(env)
    return out


def files_overlapping(report: list[dict], col: str, lo, hi) -> int:
    """How many files a range predicate ``col BETWEEN lo AND hi`` must
    read, given a footer report — the pruning metric."""
    n = 0
    for env in report:
        fmin, fmax = env.get(f"{col}_min"), env.get(f"{col}_max")
        if fmin is None or (fmax >= lo and fmin <= hi):
            n += 1
    return n


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    group_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    size_col: str = "n_bytes",
) -> DataFrame:
    """Small-file compaction planner — the table-maintenance pass that
    turns N tiny files into ⌈Σbytes/target⌉ right-sized ones (the
    small-files problem: at 100 TB a scan's task count and footer reads
    are file-count-bound, so compaction IS a scale operator).

    Strategy: within each group (partition of the table), order files
    by (size desc, id) and assign bin = floor(running-bytes-before /
    target) — the ordered cumulative-fill every distributed compactor
    uses (Spark's own file coalescing included): single window pass, no
    driver-side bin packing, deterministic. Size-desc order keeps big
    files from straddling bins (first-fit-decreasing flavor); bins can
    overflow target by at most one file — by design, a file is never
    split.

    Output: one row per planned bin — (group_cols…, bin, n_files,
    total_bytes, avg_file_bytes).
    """
    from pyspark.sql.window import Window

    g = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*g)
        .orderBy(F.col(size_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = files.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum(F.col(size_col)).over(w), F.lit(0))
            / F.lit(int(target_bytes))
        ),
    )
    return assigned.groupBy(*g, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).alias("total_bytes"),
        (F.sum(size_col) / F.count(F.lit(1))).alias("avg_file_bytes"),
    )
