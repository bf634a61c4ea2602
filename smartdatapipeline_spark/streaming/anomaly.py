"""Streaming rolling z-score anomaly detection via
``applyInPandasWithState`` — the second custom stateful operator
(SURVEY §2.8), companion to ``sessions.sessionize_stream``.

Semantics mirror the batch W2 operator (operators/anomaly.py
``rolling_zscore_api``, reference routers/metrics.py:228-256): each
value is scored against the non-null values among the previous
``window`` ROWS of its series (nulls occupy frame slots, exactly like
the batch ``rowsBetween(-window, -1)`` frame) — needs ≥ 2, sample
stddev (ddof=1), flat window ⇒ outlier iff v ≠ μ with the +1e9
sentinel. State is the last ``window`` row values per series
(≤ ``window`` doubles — O(active series), independent of stream
length), so a million live metrics hold a few MB of state per executor.

Ordering contract: scores equal the batch operator when events are
processed in event-time order per series (each micro-batch is sorted
internally; cross-batch reordering is bounded by the watermark — replay
an out-of-order backlog through one availableNow batch to get
bit-identical batch semantics, which is what the equivalence test pins).

Numeric note: the streaming path accumulates plain float sums (state
lives as doubles); the batch twin is the decimal-exact oracle-checked
path. On 2-decimal money inputs the divergence is ≤ 1 ulp per window —
score-rank stable, flag-identical for any realistic threshold.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smartdatapipeline_spark.operators.anomaly import Z_CLAMP

OUT_SCHEMA = (
    "metric string, ts timestamp, value double, z double, is_outlier boolean"
)
STATE_SCHEMA = "vals array<double>"


def rolling_zscore_stream(
    events: DataFrame,
    window: int = 7,
    z_thresh: float = 3.0,
    watermark: str = "1 day",
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Score a (metric, ts, value) stream; returns the append-mode
    (metric, ts, value, z, is_outlier) stream."""

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        metric = key[0]
        pdf = pd.concat(list(pdf_iter)).sort_values(ts_col)
        vals: list[float] = list(state.get[0]) if state.exists else []
        zs: list[float | None] = []
        flags: list[bool] = []
        for v in pdf[value_col]:
            v = None if pd.isna(v) else float(v)
            frame = [x for x in vals if x is not None and not pd.isna(x)]
            n = len(frame)
            if v is None or n < 2:
                zs.append(None)
                flags.append(False)
            else:
                s = 0.0
                sq = 0.0
                for x in frame:
                    s += x
                    sq += x * x
                mu = s / n
                var = (sq - (s * s) / n) / (n - 1)
                sigma = math.sqrt(var) if var > 0 else 0.0
                if sigma == 0.0:
                    zs.append(Z_CLAMP if v != mu else 0.0)
                    flags.append(v != mu)
                else:
                    z = (v - mu) / sigma
                    if z == float("inf"):
                        z = Z_CLAMP
                    elif z == float("-inf"):
                        z = -Z_CLAMP
                    zs.append(z)
                    flags.append(abs(z) >= z_thresh)
            vals.append(v)  # nulls hold their frame slot, like the batch op
            if len(vals) > window:
                vals.pop(0)
        state.update((vals,))
        yield pd.DataFrame(
            {
                "metric": metric,
                "ts": pdf[ts_col].values,
                "value": pdf[value_col].values,
                "z": pd.array(zs, dtype="float64"),
                "is_outlier": flags,
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(metric_col)
        .applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
