"""Property-based tests (hypothesis): the trickiest window semantics
pinned against straightforward single-process Python references on
random inputs.

Inputs are integer-valued floats so every decimal cast in the engine's
numeric discipline is exact and the Python mirror (plain IEEE doubles,
same operation order) is bit-identical — the properties test LOGIC
(frames, null gates, flat windows, session splits), not float noise.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from smartdatapipeline_spark.operators.anomaly import rolling_zscore_api
from smartdatapipeline_spark.operators.sessions import sessionize

Z_CLAMP = 1e9


def _zscore_api_ref(values, window, z_thresh):
    """reference routers/metrics.py:228-256 re-derived in plain Python,
    mirroring the engine's sum/sumsq formulation operation-for-operation."""
    out = []
    for i, v in enumerate(values):
        frame = [x for x in values[max(0, i - window) : i] if x is not None]
        n = len(frame)
        if v is None or n < 2:
            out.append((None, False))
            continue
        s = float(sum(frame))
        sq = float(sum(x * x for x in frame))
        mu = s / n
        var = (sq - s * s / n) / (n - 1)
        sigma = math.sqrt(var) if var > 0 else 0.0
        if sigma == 0.0:
            if v != mu:
                out.append((Z_CLAMP, True))
            else:
                out.append((0.0, False))
        else:
            z = (v - mu) / sigma
            if z == float("inf"):
                z = Z_CLAMP
            elif z == float("-inf"):
                z = -Z_CLAMP
            out.append((z, abs(z) >= z_thresh))
    return out


@settings(max_examples=12, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.none(), st.integers(-50, 50).map(float)), min_size=3, max_size=20
    ),
    window=st.integers(2, 5),
)
def test_rolling_zscore_api_matches_reference(spark, values, window):
    base = dt.date(2024, 1, 1)
    rows = [
        Row(metric="m", metric_date=base + dt.timedelta(days=i), value=v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "metric string, metric_date date, value double")
    got = {
        r["metric_date"]: (r["z"], r["is_outlier"])
        for r in rolling_zscore_api(df, window=window, z_thresh=2.0).collect()
    }
    for i, (z_want, out_want) in enumerate(_zscore_api_ref(values, window, 2.0)):
        z_got, out_got = got[base + dt.timedelta(days=i)]
        assert out_got == out_want, (i, values)
        if z_want is None:
            assert z_got is None, (i, values)
        else:
            assert z_got == z_want, (i, values)


def _sessions_ref(events, gap_minutes):
    gap = dt.timedelta(minutes=gap_minutes)
    byuser: dict[int, list[dt.datetime]] = {}
    for u, ts in events:
        byuser.setdefault(u, []).append(ts)
    out = set()
    for u, tss in byuser.items():
        tss.sort()
        sid, start, end, n = 0, None, None, 0
        for t in tss:
            if start is None or t - end > gap:
                if start is not None:
                    out.add((u, sid, start, end, n))
                sid, start, end, n = sid + 1, t, t, 1
            else:
                end, n = max(end, t), n + 1
        if start is not None:
            out.add((u, sid, start, end, n))
    return out


@settings(max_examples=12, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 4_000_000).map(
                lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    gap_minutes=st.integers(1, 120),
)
def test_sessionize_matches_reference(spark, events, gap_minutes):
    df = spark.createDataFrame(
        [Row(user_id=u, ts=t) for u, t in events], "user_id bigint, ts timestamp"
    )
    got = {
        (r["user_id"], r["session_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap_minutes=gap_minutes).collect()
    }
    assert got == _sessions_ref(events, gap_minutes)
