"""Temporal join operators — as-of join and interval/range join.

The reference has no as-of or range joins (SURVEY §2.3: equi joins only);
these are the canonical "operator Spark lacks" extensions named in the
build brief, implemented as compositions of built-in DataFrame ops so
Catalyst/Tungsten keep the whole plan JVM-side.

## As-of join (`asof_join`)

For each left row, attach the most recent right row at-or-before its
timestamp (direction="backward"; "forward" = earliest at-or-after),
optionally within a tolerance. pandas calls this ``merge_asof``; DuckDB
has native ``ASOF JOIN`` (the correctness oracle).

Scale design: the naive formulation is an inequality join — a
nested-loop O(|L|·|R|) disaster. Instead both sides are UNIONed into one
frame tagged by side and the match is a running ``last(right_value)
IGNORE NULLS`` over a window partitioned by the equi keys and ordered by
(ts, side). That is ONE shuffle on the equi keys — the same exchange a
sort-merge equi join would do — and the pair space is never formed.
Right rows sort before left rows at equal ts, making the match
at-or-before-INCLUSIVE (ASOF JOIN's convention). Skewed keys are split
by AQE like any other exchange; without equi keys the window degrades to
a single partition, so keyless as-of joins should bucket time first
(see `range_join_bucketed` for the pattern).

## Range/interval join (`range_join_bucketed`)

Join fact rows to (possibly overlapping) [start, end) intervals. Naive
Spark plans a BroadcastNestedLoopJoin (O(|L|·|I|)). The scale path:
explode each interval into its covered coarse buckets (days), equi-join
on bucket — each fact row lands in exactly one bucket so no dedup is
needed — then apply the exact half-open bound as a post-filter. Cost is
O(|L| + |I|·span/bucket) shuffled rows, all hash-join co-located.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Attach to each left row the nearest right row per `by` group.

    direction="backward": most recent right with right_ts <= left_ts
    (inclusive, DuckDB ASOF JOIN semantics); "forward": earliest right
    with right_ts >= left_ts. `right_cols` are the payload columns to
    carry (default: all non-key, non-ts columns). `how` is "inner"
    (drop unmatched, ASOF JOIN default) or "left" (keep with nulls).
    `tolerance_seconds` nulls/drops matches farther than the bound.

    Output: every left column, plus `right_ts` and each right payload
    column (names must not collide with left's).
    """
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {right_ts}]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    left_payload = [c for c in left.columns if c not in set(by) | {left_ts}]
    ts_t = dict(left.dtypes)[left_ts]

    # one unioned frame: _ts axis, _side tag, left payload ∪ right payload
    lhs = left.select(
        *by,
        F.col(left_ts).cast(ts_t).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
    )
    rhs = right.select(
        *by,
        F.col(right_ts).cast(ts_t).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    u = lhs.unionByName(rhs)

    # right rows first at equal _ts in match order ⇒ inclusive match
    order = (
        [F.col("_ts").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_side").asc()]
    )
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in ["_rts", *right_cols]]
    matched = u.select(*by, "_ts", "_side", *left_payload, *carried).filter(
        F.col("_side") == 1
    )

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - F.col("_rts").cast("double")
        )
        ok = gap <= F.lit(float(tolerance_seconds))
        matched = matched.select(
            *by,
            "_ts",
            *left_payload,
            *[F.when(ok, F.col(c)).alias(c) for c in ["_rts", *right_cols]],
        )

    out = matched.select(
        *by,
        F.col("_ts").alias(left_ts),
        *left_payload,
        F.col("_rts").alias(right_ts),
        *right_cols,
    )
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out


def range_join_bucketed(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    bucket: str = "day",
) -> DataFrame:
    """Half-open interval join: left rows where `start <= left_ts < end`
    per matching `by` keys, via bucket-explode + equi-join (no
    nested-loop pair space). Intervals may overlap; a left row matching
    k intervals yields k rows. `bucket` is any `date_trunc` unit that
    is NOT finer than the interval grid (day for date-grained
    intervals).

    Output: all interval columns + all left columns.
    """
    by = by or []
    # degenerate intervals (end <= start) match nothing under half-open
    # semantics — drop them BEFORE the bucket explode; otherwise sequence()
    # sees stop < start with a positive step and raises at execution
    # (round-3 ADVICE). The last covered bucket is clamped to >= the first
    # so sub-bucket intervals (e.g. a 0.5 s interval starting exactly on a
    # bucket boundary) still emit their single bucket instead of raising.
    live = intervals.filter(F.col(end) > F.col(start))
    first_bucket = F.date_trunc(bucket, F.col(start))
    # end is exclusive: last covered instant is strictly before end (1 µs
    # is timestamp precision), clamped to first_bucket for short intervals
    last_bucket = F.greatest(
        first_bucket,
        F.date_trunc(bucket, F.col(end) - F.expr("INTERVAL 1 MICROSECOND")),
    )
    binned = live.withColumn(
        "_bucket",
        F.explode(
            F.sequence(first_bucket, last_bucket, F.expr(f"INTERVAL 1 {bucket}"))
        ),
    )
    tagged = left.withColumn("_bucket", F.date_trunc(bucket, F.col(left_ts)))
    joined = tagged.join(binned, on=[*by, "_bucket"], how="inner").filter(
        (F.col(left_ts) >= F.col(start)) & (F.col(left_ts) < F.col(end))
    )
    return joined.drop("_bucket")


def concurrency_profile(
    events: DataFrame,
    duration_minutes: int = 15,
    by: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Peak concurrency per (group, day) by sweep line: each event opens
    a half-open interval [ts, ts + duration); +1/−1 deltas are sorted
    within a (group, day) partition and a running sum's max is the peak
    number of simultaneously-open intervals.

    The window is PARTITIONED by (group, day) — never global — so state
    per task is one group-day's endpoints; at 100 TB the partition key
    can be narrowed further (hour) without changing the algebra. Ends
    sort before starts at the same instant (half-open semantics) via
    the delta ascending tiebreak; runs of equal keys don't affect the
    running max. Intervals are clipped to the opening day (the per-day
    sweep restarts at midnight — documented simplification, mirrored in
    the oracle).

    Output: (*by, day, peak_concurrency).
    """
    from pyspark.sql.window import Window

    start = events.select(
        *by, F.col(ts_col).alias("_t"), F.lit(1).alias("_d")
    )
    end = events.select(
        *by,
        (F.col(ts_col) + F.expr(f"INTERVAL {duration_minutes} MINUTES")).alias("_t"),
        F.lit(-1).alias("_d"),
    )
    # both endpoints belong to the OPENING event's day
    day = F.to_date(
        F.col("_t") - F.when(F.col("_d") == -1,
                             F.expr(f"INTERVAL {duration_minutes} MINUTES"))
        .otherwise(F.expr("INTERVAL 0 MINUTES"))
    ).alias("day")
    deltas = start.unionByName(end).select(*by, day, "_t", "_d")
    w = (
        Window.partitionBy(*by, "day")
        .orderBy(F.col("_t").asc(), F.col("_d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("_open", F.sum("_d").over(w))
    return running.groupBy(*by, "day").agg(
        F.max("_open").alias("peak_concurrency")
    )


def seasonal_profile(
    events,
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Day-of-week seasonal decomposition of daily event volume: per
    (series, weekday), the mean daily count and its seasonal index
    (weekday mean ÷ overall daily mean).

    Weekday is computed arithmetically — ``datediff(day, 1970-01-05) %
    7`` (1970-01-05 is a Monday, so 0=Mon..6=Sun) — identical integer
    math on any engine, no locale/convention trap. Counts are exact
    integers; the two means divide deterministic values, so the index
    is bit-stable. Two grouped aggregates plus one broadcast join —
    daily frames are tiny regardless of fact size, so the only
    fact-sized work is the first day-grain rollup.

    Output: (series, dow, n_days, dow_avg, seasonal_index).
    """
    from pyspark.sql import functions as F

    daily = (
        events.select(
            F.col(type_col).alias("series"), F.to_date(ts_col).alias("_d")
        )
        .groupBy("series", "_d")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "dow", F.datediff(F.col("_d"), F.lit("1970-01-05").cast("date")) % 7
        )
    )
    by_dow = daily.groupBy("series", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_n").alias("_tot"),
    )
    overall = daily.groupBy("series").agg(
        (F.sum("_n").cast("double") / F.count(F.lit(1))).alias("_overall_avg")
    )
    return (
        by_dow.join(F.broadcast(overall), "series")
        .select(
            "series",
            "dow",
            "n_days",
            (F.col("_tot").cast("double") / F.col("n_days")).alias("dow_avg"),
            (
                (F.col("_tot").cast("double") / F.col("n_days"))
                / F.col("_overall_avg")
            ).alias("seasonal_index"),
        )
    )


def sliding_distinct_users(
    events,
    window_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Rolling N-day distinct users per day — the classic "7-day active
    users" metric, which NO window function can express (COUNT(DISTINCT)
    over a sliding frame isn't supported anywhere).

    Scale shape: dedup the fact to (user, day) first (one shuffle —
    day-grain, so the frame is users×days at most), then fan each
    user-day out to the ≤N report days it supports via a range join
    against the tiny day spine (broadcast — the spine is data-span
    days), and count distinct users per report day. The fan-out is
    bounded by ``window_days``, never data-sized.

    Output: (day, n_active_users, window_days).
    """
    from pyspark.sql import functions as F

    user_days = events.select(
        F.col(user_col).alias("_u"), F.to_date(ts_col).alias("_d")
    ).distinct()
    spine = user_days.select(F.col("_d").alias("day")).distinct()
    fanned = user_days.join(
        F.broadcast(spine),
        (F.col("day") >= F.col("_d"))
        & (F.datediff(F.col("day"), F.col("_d")) < window_days),
    )
    return (
        fanned.groupBy("day")
        .agg(F.countDistinct("_u").alias("n_active_users"))
        .withColumn("window_days", F.lit(window_days))
    )


def running_balance(
    events,
    delta_col,
    floor_value: float = 0.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Floored running balance per key: bal ← max(floor, bal + Δ) over
    the key's time-ordered deltas — inventory/credit semantics where
    the balance can't go below zero. The clamp makes each step depend
    on the previous result, so no window SUM can express it; it IS
    expressible as one ordered fold per key (collect_list sorted by
    (ts, id) → ``aggregate`` with a [balance, n_clamped] accumulator) —
    declarative, JVM-side, one shuffle on the key.

    State per key is its own event list — fine when per-key history
    fits an executor (the same bound every stateful per-key operator
    has); for million-event keys, pre-aggregate to a coarser grain
    first.

    Deterministic bit-for-bit: fixed fold order, IEEE adds, and the
    clamp compares the same doubles on any engine.

    Output: (user_id, n_events, final_balance, n_clamped).
    """
    from pyspark.sql import Column, functions as F

    d = delta_col if isinstance(delta_col, Column) else F.col(delta_col)
    rows = events.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), d.alias("delta")
        ).alias("_r"),
    )
    floor_lit = F.lit(float(floor_value))
    folded = rows.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.aggregate(
            F.sort_array(F.collect_list("_r")),
            F.array(F.lit(0.0), F.lit(0.0)),
            lambda acc, x: F.array(
                F.greatest(floor_lit, acc[0] + x["delta"]),
                acc[1]
                + F.when(acc[0] + x["delta"] < floor_lit, F.lit(1.0)).otherwise(
                    F.lit(0.0)
                ),
            ),
        ).alias("_acc"),
    )
    return folded.select(
        user_col,
        "n_events",
        F.col("_acc")[0].alias("final_balance"),
        F.col("_acc")[1].cast("long").alias("n_clamped"),
    )


def time_weighted_avg(
    events,
    value_col: str = "value",
    series_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Per (series, day) time-weighted average: each value holds from
    its (whole-second) timestamp until the next event in the same
    series-day, the last until midnight — TWAP semantics for irregular
    samples, where a plain AVG over-weights bursts.

    One (series, day)-partitioned window (lead) in one shuffle; weights
    are exact integer seconds, value×weight aggregates in DECIMAL, and
    the final division is the only double op — bit-stable cross-engine.

    Output: (series, day, n_events, total_s, twap).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = events.select(
        F.col(series_col).alias("series"),
        F.to_date(ts_col).alias("day"),
        F.unix_timestamp(ts_col).alias("_sec"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("decimal(18,4)").alias("_v"),
    )
    w = Window.partitionBy("series", "day").orderBy(
        F.col("_sec").asc(), F.col("_id").asc()
    )
    day_end = F.unix_timestamp(F.col("day").cast("timestamp")) + F.lit(86400)
    weighted = base.withColumn(
        "_w",
        F.coalesce(F.lead("_sec").over(w), day_end) - F.col("_sec"),
    )
    return weighted.groupBy("series", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_w").alias("total_s"),
        (
            F.sum(F.col("_v") * F.col("_w").cast("decimal(10,0)")).cast("double")
            / F.sum("_w").cast("double")
        ).alias("twap"),
    )


def rolling_correlation(
    events,
    type_a: str = "view",
    type_b: str = "purchase",
    window_days: int = 14,
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Rolling Pearson correlation between two series' daily counts
    over a trailing ``window_days`` row window.

    A naive ``corr()`` window is a double-sum accumulation (engine- and
    order-dependent); here every windowed sum is an exact INTEGER (n,
    Σx, Σy, Σx², Σy², Σxy of daily counts), and the correlation is
    derived from those deterministic values with one sqrt per variance
    (IEEE sqrt is correctly rounded everywhere). The window runs on the
    day-grain frame — data-span days, thousands of rows at most — the
    fact is touched only by the one day rollup.

    Output: (day, n_days, corr) — corr NULL when either variance is 0.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    daily = (
        events.select(F.to_date(ts_col).alias("day"), F.col(type_col).alias("_t"))
        .groupBy("day")
        .agg(
            F.sum((F.col("_t") == type_a).cast("long")).alias("_x"),
            F.sum((F.col("_t") == type_b).cast("long")).alias("_y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    s = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("_n"),
        F.sum("_x").over(w).alias("_sx"),
        F.sum("_y").over(w).alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).over(w).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).over(w).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).over(w).alias("_sxy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    dy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    den = F.sqrt(dx) * F.sqrt(dy)
    return s.select(
        "day",
        F.col("_n").alias("n_days"),
        (num / F.nullif(den, F.lit(0.0))).alias("corr"),
    )


def forward_fill_daily(
    events,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
):
    """Day-grain forward-fill imputation: build each series' full
    calendar spine (min..max day), then carry the last OBSERVED daily
    sum forward over gaps — ``last(_, ignorenulls=True)`` over one
    series-partitioned window; leading gaps stay NULL (nothing to
    carry). The standard time-series repair where zero-fill would lie.

    Output: (series, day, observed, value_filled, is_imputed).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.numeric import dsum

    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series", "day")
        .agg(dsum("_v").alias("observed"))
    )
    bounds = daily.groupBy("series").agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    spine = bounds.select(
        "series",
        F.explode(F.sequence("_d0", "_d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    joined = spine.join(daily, ["series", "day"], "left")
    w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last("observed", ignorenulls=True).over(w)
    return joined.select(
        "series",
        "day",
        "observed",
        filled.alias("value_filled"),
        F.col("observed").isNull().alias("is_imputed"),
    )


def max_drawdown(
    events,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
):
    """Max drawdown per series over the cumulative daily value curve:
    the largest drop from a running peak — the risk metric for any
    monotone-ish KPI ("how far below the high-water mark did we get").

    All decimal-exact: cumulative sum and running max both window over
    the day-grain frame in DECIMAL (order-free), drawdown = peak − cum,
    one grouped max at the end. Output: (series, n_days, final_value,
    peak_value, max_drawdown).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).cast("decimal(18,4)").alias("_v"),
        )
        .groupBy("series", "day")
        .agg(F.sum("_v").alias("_dv"))
    )
    w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.withColumn("_cum", F.sum("_dv").over(w))
    curve = cum.withColumn("_peak", F.max("_cum").over(w))
    return curve.groupBy("series").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("_cum").cast("double").alias("final_value"),
        F.max("_peak").cast("double").alias("peak_value"),
        F.max(F.col("_peak") - F.col("_cum")).cast("double").alias(
            "max_drawdown"
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    by: list[str] | None = None,
    bucket: str = "day",
) -> DataFrame:
    """Interval×interval OVERLAP join: pairs where
    ``[l_start, l_end) ∩ [r_start, r_end) ≠ ∅`` (half-open:
    ``l_start < r_end AND r_start < l_end``), optionally per ``by``
    keys.

    Scale shape: the naive inequality join plans a nested-loop pair
    space (|L|·|R|). Here BOTH sides bucket-explode on ``bucket``
    (``date_trunc`` grid), pair via equi-join on (keys, bucket), dedupe
    the (multi-bucket) pairs, and post-filter the exact overlap
    predicate — pair work is proportional to co-bucketed intervals
    only, and the bucket join shuffles hash-partitioned like any
    equi-join. Pick ``bucket`` no finer than typical interval length
    (day for day-grained campaign/incident windows).

    Degenerate intervals (end <= start) on either side match nothing
    (same guard as ``range_join_bucketed``).

    Column names must be disjoint between the two sides (alias before
    calling) — the output carries both schemas flat.

    MULTIPLICITY PRECONDITION: rows must be distinct WITHIN each side.
    The bucket-explode pairs a matching (l, r) once per shared bucket,
    and the whole-row ``.distinct()`` that collapses those bucket
    repeats cannot tell them apart from genuinely duplicate input rows
    — so duplicate left (or right) rows yield ONE output pair, not N.
    If duplicate rows are meaningful, attach a unique key column to
    each side first (e.g. ``monotonically_increasing_id`` at the
    source, or a row_number over a stable key) and the distinct then
    preserves them (round-4 ADVICE #4).

    Output: all left columns + all right columns + ``overlap_start`` /
    ``overlap_end`` (the clipped intersection).
    """
    by = by or []

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        live = df.filter(F.col(end) > F.col(start))
        first_b = F.date_trunc(bucket, F.col(start))
        last_b = F.greatest(
            first_b,
            F.date_trunc(bucket, F.col(end) - F.expr("INTERVAL 1 MICROSECOND")),
        )
        return live.withColumn(
            "_bucket",
            F.explode(F.sequence(first_b, last_b, F.expr(f"INTERVAL 1 {bucket}"))),
        )

    lb = binned(left, left_start, left_end)
    rb = binned(right, right_start, right_end)
    joined = (
        lb.join(rb, on=[*by, "_bucket"], how="inner")
        .drop("_bucket")
        # an overlapping pair co-occupies every shared bucket — dedupe
        .distinct()
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
    )
    return joined.withColumn(
        "overlap_start", F.greatest(F.col(left_start), F.col(right_start))
    ).withColumn("overlap_end", F.least(F.col(left_end), F.col(right_end)))


def rolling_median_daily(
    events,
    window_days: int = 7,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
):
    """Exact rolling MEDIAN of daily value sums over the trailing
    ``window_days`` OBSERVED days (ROWS frame on the day-grain series;
    one row per (series, day) makes the frame deterministic) — the
    robust smoother where a rolling mean chases spikes
    (``rolling_mad_zscore`` is the outlier-flagging cousin).

    Exactness: the window holds ≤ ``window_days`` doubles; the median
    is `percentile(_, 0.5)` over that tiny frame — even-count frames
    average the two middle values, the same (a+b)/2 both engines
    compute. Fact-sized work is the one day-grain rollup; the window
    sort is per series over its day count.

    Output: (series, day, value_sum, n_window, rolling_median).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.numeric import dsum

    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series", "day")
        .agg(dsum("_v").alias("value_sum"))
    )
    w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "series",
        "day",
        "value_sum",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.expr("percentile(value_sum, 0.5)")
        .over(w)
        .alias("rolling_median"),
    )


def interpolate_linear_daily(
    events,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
):
    """Day-grain LINEAR interpolation over gaps — the repair step when
    forward-fill's step function lies (a metric that trends through an
    outage should trend through the gap too): per series, each missing
    day takes y_prev + (y_next − y_prev) · (d − d_prev)/(d_next −
    d_prev) between its nearest observed neighbors; leading/trailing
    gaps (one-sided) stay NULL — interpolation, not extrapolation.

    Same single-shuffle shape as ``forward_fill_daily``: spine join,
    then TWO frame-bounded windows (last-observed backward,
    first-observed forward) — no self-join, no per-gap pass. The
    arithmetic is one fixed IEEE expression, so the DuckDB oracle is
    bit-exact.

    Output: (series, day, observed, value_interp, is_imputed).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.numeric import dsum

    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series", "day")
        .agg(dsum("_v").alias("observed"))
    )
    bounds = daily.groupBy("series").agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    spine = bounds.select(
        "series",
        F.explode(F.sequence("_d0", "_d1", F.expr("interval 1 day"))).alias(
            "day"
        ),
    )
    joined = spine.join(daily, ["series", "day"], "left")
    wb = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("observed").isNotNull(), F.col("day"))
    prev_v = F.last("observed", ignorenulls=True).over(wb)
    prev_d = F.last(obs_day, ignorenulls=True).over(wb)
    next_v = F.first("observed", ignorenulls=True).over(wf)
    next_d = F.first(obs_day, ignorenulls=True).over(wf)
    interp = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
        prev_v
        + (next_v - prev_v)
        * (
            F.datediff(F.col("day"), prev_d).cast("double")
            / F.datediff(next_d, prev_d).cast("double")
        )
    )
    return joined.select(
        "series",
        "day",
        "observed",
        interp.alias("value_interp"),
        F.col("observed").isNull().alias("is_imputed"),
    )


def debounce_exact_dedup(
    events,
    tolerance_sec: int = 5,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id", "event_type", "value"),
):
    """Tolerance-window duplicate suppression — the double-fire repair
    for at-least-once producers whose retries carry a FRESH timestamp
    (so exact (key, ts) dedup misses them): within each key, events
    closer than ``tolerance_sec`` to their predecessor chain into one
    island (gaps-and-islands over a lag diff) and only the island's
    FIRST event survives. Differs from event_debounce (per-user rate
    limiting) by keying on the full payload identity: two different
    values 1 s apart both survive here.

    One shuffle on the key; the island id is a running sum — the same
    cumulative-flag pattern as sessionize, bit-reproducible.

    Output: the surviving events (event_id, ts, user_id, event_type,
    value) plus n_suppressed — how many duplicates the island absorbed.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    kcols = [F.col(k) for k in keys]
    w = Window.partitionBy(*kcols).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    marked = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > tolerance_sec), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    wi = Window.partitionBy(*kcols, F.col("_island")).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    return (
        marked.withColumn("_rn", F.row_number().over(wi))
        .withColumn(
            "n_suppressed",
            F.count(F.lit(1)).over(
                Window.partitionBy(*kcols, F.col("_island"))
            )
            - 1,
        )
        .filter(F.col("_rn") == 1)
        .select("event_id", ts_col, *keys, "n_suppressed")
    )
