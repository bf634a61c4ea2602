"""Streaming twins of the day-grain fold/lag operators
(``operators/temporal.forward_fill_daily``,
``operators/metrics.wow_change``) via ``applyInPandasWithState`` —
round-3 VERDICT #9.

Both consume a CLOSED day-grain stream: (series, day, value) rows where
each day is final when it arrives (the upstream shape is a watermarked
daily aggregation — ``streaming/windows.py`` — whose append-mode output
emits a day exactly once, after the watermark passes). State is O(1)
per series — a carried scalar for forward-fill, a ≤7-slot day ring for
week-over-week — independent of stream length.

Ordering caveat (same as ``streaming/balance.py``): days are folded in
order; a day arriving after a later day has been folded cannot
retroactively re-fill. The watermarked upstream guarantees that
ordering; the equivalence tests pin ordered delivery ==
batch-bit-identical output.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EPOCH = dt.date(1970, 1, 1)

FF_OUT_SCHEMA = (
    "series string, day date, observed double, value_filled double, "
    "is_imputed boolean"
)
FF_STATE_SCHEMA = "last_day int, last_value double"


def forward_fill_stream(
    daily: DataFrame,
    series_col: str = "series",
    day_col: str = "day",
    value_col: str = "observed",
) -> DataFrame:
    """Streaming forward-fill: for each finalized (series, day, value)
    row, emit the observed row plus one imputed row per calendar day in
    the gap since the series' previous observation, carrying the last
    observed value — the streaming half of ``forward_fill_daily``'s
    spine+``last(ignorenulls)`` window (leading gaps never appear: the
    spine starts at each series' first observed day in both shapes).

    Output (append mode): (series, day, observed, value_filled,
    is_imputed)."""

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter)).sort_values(day_col)
        last_day, last_val = state.get if state.exists else (None, None)
        out: list[tuple] = []
        for day, val in zip(pdf[day_col], pdf[value_col].astype("float64")):
            d_ord = (day - _EPOCH).days if hasattr(day, "toordinal") else int(day)
            if last_day is not None:
                for gap in range(last_day + 1, d_ord):
                    out.append(
                        (key[0], _EPOCH + dt.timedelta(days=gap), None, last_val, True)
                    )
            out.append((key[0], _EPOCH + dt.timedelta(days=d_ord), val, val, False))
            last_day, last_val = d_ord, float(val)
        state.update((last_day, last_val))
        yield pd.DataFrame(
            out,
            columns=["series", "day", "observed", "value_filled", "is_imputed"],
        )

    return daily.groupBy(series_col).applyInPandasWithState(
        fn,
        outputStructType=FF_OUT_SCHEMA,
        stateStructType=FF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


WOW_OUT_SCHEMA = (
    "metric string, day date, value_sum double, prev_week double, "
    "pct_change double"
)
WOW_STATE_SCHEMA = "days array<int>, sums array<double>"


def wow_change_stream(
    daily: DataFrame,
    metric_col: str = "metric",
    day_col: str = "day",
    value_col: str = "value_sum",
) -> DataFrame:
    """Streaming week-over-week change: per series, a ≤7-slot ring of
    (day, sum) state answers "what was this series 7 days ago" at O(1);
    a finalized day emits a row iff the day exactly 7 days earlier was
    observed — the streaming half of ``wow_change``'s day-grain
    self-join (inner-join semantics: missing prior weeks emit nothing).

    Output (append mode): (metric, day, value_sum, prev_week,
    pct_change)."""

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter)).sort_values(day_col)
        days, sums = state.get if state.exists else ([], [])
        ring = dict(zip(list(days), list(sums)))
        out: list[tuple] = []
        for day, val in zip(pdf[day_col], pdf[value_col].astype("float64")):
            d_ord = (day - _EPOCH).days if hasattr(day, "toordinal") else int(day)
            prev = ring.get(d_ord - 7)
            if prev is not None:
                pct = (val - prev) / prev if prev != 0.0 else None
                out.append(
                    (key[0], _EPOCH + dt.timedelta(days=d_ord), val, prev, pct)
                )
            ring[d_ord] = float(val)
            # retire slots older than 7 days before this one
            ring = {d: v for d, v in ring.items() if d >= d_ord - 6}
        state.update((list(ring.keys()), list(ring.values())))
        yield pd.DataFrame(
            out,
            columns=["metric", "day", "value_sum", "prev_week", "pct_change"],
        )

    return daily.groupBy(metric_col).applyInPandasWithState(
        fn,
        outputStructType=WOW_OUT_SCHEMA,
        stateStructType=WOW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
