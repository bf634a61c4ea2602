"""Streaming gap-based sessionization via ``applyInPandasWithState`` —
the custom stateful operator shape (SURVEY §2.8: "applyInPandasWithState
for custom stateful operators").

Semantics match operators/sessions.sessionize exactly: a session is a
maximal run of a user's events with consecutive gaps ≤ ``gap``. State is
ONE open session per user (4 longs) — O(active users) regardless of
event volume. Sessions are emitted when closed by a later event, or by
event-time timeout once the watermark passes session_end + gap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_id bigint, session_start timestamp, "
    "session_end timestamp, n_events bigint"
)
#: (next/current session id, open-session start/end in epoch-us, count)
STATE_SCHEMA = "session_id bigint, start_us bigint, end_us bigint, n bigint"


def _emit(user: int, sid: int, s_us: int, e_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_id": [sid],
            "session_start": [pd.Timestamp(s_us, unit="us")],
            "session_end": [pd.Timestamp(e_us, unit="us")],
            "n_events": [n],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization. ``events`` is a streaming DataFrame with
    (user_col, ts_col); returns the append-mode session stream."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            sid, s_us, e_us, n = state.get
            state.remove()
            yield _emit(user, sid, s_us, e_us, n)
            return
        pdf = pd.concat(list(pdf_iter)).sort_values(ts_col)
        ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()  # ns → us
        sid, s_us, e_us, n = state.get if state.exists else (0, None, None, 0)
        closed: list[pd.DataFrame] = []
        for t in ts_us:
            if s_us is None:
                sid, s_us, e_us, n = sid + 1, t, t, 1
            elif t - e_us <= gap_us:
                e_us, n = max(e_us, t), n + 1
            else:
                closed.append(_emit(user, sid, s_us, e_us, n))
                sid, s_us, e_us, n = sid + 1, t, t, 1
        state.update((sid, s_us, e_us, n))
        # flush the open session once the watermark passes end + gap
        state.setTimeoutTimestamp((e_us + gap_us) // 1000)  # epoch-ms
        for c in closed:
            yield c

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
