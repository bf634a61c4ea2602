"""Streaming floored running balance via ``applyInPandasWithState`` —
the streaming twin of ``operators/temporal.running_balance``.

State per user is 3 scalars (balance, n_clamped, n_events) — O(active
users), independent of stream length, the same bound as the session
operator. Each micro-batch folds its events in (ts, id) order on top of
the carried balance and emits the user's updated row (update-mode
semantics: downstream sees the latest balance per user).

Ordering caveat (inherent to per-event folds over streams): events are
folded in order WITHIN each batch; an event arriving in a later batch
but timestamped before an already-folded one cannot retroactively
re-fold. Bound staleness with a watermark + delayed trigger upstream,
or use the batch operator for reconciliation — the equivalence test
pins that ordered delivery reproduces the batch fold bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, final_balance double, n_clamped bigint"
STATE_SCHEMA = "balance double, n_clamped bigint, n_events bigint"


def running_balance_stream(
    events: DataFrame,
    floor_value: float = 0.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    delta_col: str = "delta",
) -> DataFrame:
    """``events``: streaming frame with (user, ts, id, delta). Returns
    the update-mode per-user balance stream."""

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter)).sort_values([ts_col, id_col])
        bal, clamps, n = state.get if state.exists else (0.0, 0, 0)
        for d in pdf[delta_col].astype("float64").tolist():
            nxt = bal + d
            if nxt < floor_value:
                bal, clamps = floor_value, clamps + 1
            else:
                bal = nxt
            n += 1
        state.update((bal, clamps, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "final_balance": [bal],
                "n_clamped": [clamps],
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
