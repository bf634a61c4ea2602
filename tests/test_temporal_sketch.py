"""Tests for temporal joins (as-of, range) and the moments sketch.

As-of semantics are pinned against pandas ``merge_asof`` (the same
convention DuckDB's ASOF JOIN uses: inclusive at-or-before); the range
join against a naive cross-join filter; the sketch against exact Python
arithmetic plus the merge-invariance property that justifies it.
"""

from __future__ import annotations

import datetime as dt
import math
import statistics

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import sketch as SK
from smartdatapipeline_spark.operators import temporal as T


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:00:00"), px=1.0),
            Row(sym="A", ts=_ts("2024-01-01 10:00:05"), px=2.0),
            Row(sym="A", ts=_ts("2024-01-01 10:01:00"), px=3.0),
            Row(sym="B", ts=_ts("2024-01-01 09:59:00"), px=9.0),
            Row(sym="B", ts=_ts("2024-01-01 10:02:00"), px=8.0),
        ]
    )


def _quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", qts=_ts("2024-01-01 09:59:59"), bid=10.0),
            Row(sym="A", qts=_ts("2024-01-01 10:00:05"), bid=11.0),  # exact tie
            Row(sym="A", qts=_ts("2024-01-01 10:00:30"), bid=12.0),
            Row(sym="B", qts=_ts("2024-01-01 10:00:00"), bid=20.0),
        ]
    )


# ------------------------------------------------------------ as-of join

def test_asof_backward_matches_pandas_merge_asof(spark):
    out = T.asof_join(
        _trades(spark), _quotes(spark), left_ts="ts", right_ts="qts",
        by=["sym"], right_cols=["bid"], how="left",
    ).toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)

    exp = pd.merge_asof(
        _trades(spark).toPandas().sort_values("ts"),
        _quotes(spark).toPandas().sort_values("qts"),
        left_on="ts", right_on="qts", by="sym", direction="backward",
    ).sort_values(["sym", "ts"]).reset_index(drop=True)

    assert list(out["bid"].fillna(-1)) == list(exp["bid"].fillna(-1))
    assert list(out["qts"].fillna(pd.Timestamp(0))) == list(
        exp["qts"].fillna(pd.Timestamp(0))
    )


def test_asof_inclusive_tie_and_inner_drop(spark):
    out = {
        (r["sym"], r["ts"]): r
        for r in T.asof_join(
            _trades(spark), _quotes(spark), left_ts="ts", right_ts="qts",
            by=["sym"], right_cols=["bid"], how="inner",
        ).collect()
    }
    # exact-tie timestamp matches its own quote (inclusive), not the prior
    assert out[("A", _ts("2024-01-01 10:00:05"))]["bid"] == 11.0
    # B's 09:59 trade precedes every B quote -> dropped under inner
    assert ("B", _ts("2024-01-01 09:59:00")) not in out
    assert len(out) == 4


def test_asof_forward_and_tolerance(spark):
    fwd = {
        (r["sym"], r["ts"]): r["bid"]
        for r in T.asof_join(
            _trades(spark), _quotes(spark), left_ts="ts", right_ts="qts",
            by=["sym"], right_cols=["bid"], direction="forward", how="left",
        ).collect()
    }
    assert fwd[("A", _ts("2024-01-01 10:00:00"))] == 11.0  # earliest at-or-after
    assert fwd[("B", _ts("2024-01-01 10:02:00"))] is None  # nothing after

    tol = {
        (r["sym"], r["ts"]): r["bid"]
        for r in T.asof_join(
            _trades(spark), _quotes(spark), left_ts="ts", right_ts="qts",
            by=["sym"], right_cols=["bid"], how="left", tolerance_seconds=10,
        ).collect()
    }
    assert tol[("A", _ts("2024-01-01 10:00:00"))] == 10.0  # 1s gap, kept
    assert tol[("A", _ts("2024-01-01 10:01:00"))] is None  # 30s gap, nulled


# ------------------------------------------------------------ range join

def test_range_join_matches_naive_cross_filter(spark):
    ev = spark.createDataFrame(
        [Row(eid=i, ts=_ts(f"2024-01-{d:02d} 12:00:00"), v=float(i))
         for i, d in enumerate([1, 2, 3, 5, 8, 13, 21], start=1)]
    )
    iv = spark.createDataFrame(
        [
            Row(name="w1", start=_ts("2024-01-02 00:00:00"), end=_ts("2024-01-04 00:00:00")),
            Row(name="w2", start=_ts("2024-01-03 12:00:00"), end=_ts("2024-01-09 00:00:00")),
            Row(name="empty", start=_ts("2024-02-01 00:00:00"), end=_ts("2024-02-02 00:00:00")),
        ]
    )
    got = sorted(
        (r["name"], r["eid"])
        for r in T.range_join_bucketed(ev, iv, left_ts="ts", start="start", end="end").collect()
    )
    naive = sorted(
        (r["name"], r["eid"])
        for r in ev.crossJoin(iv)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    )
    assert got == naive
    # overlap: day-3 event hits both w1 and w2 (12:00 >= w2 start 12:00)
    assert ("w1", 3) in got and ("w2", 3) in got


# -------------------------------------------------------- moments sketch

def test_moments_stats_exact_vs_python(spark):
    vals = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 8.0]
    df = spark.createDataFrame([Row(g="x", v=v) for v in vals])
    row = SK.moments_stats(
        SK.moments_sketch(df, "v", by=["g"], scale=1), by=["g"]
    ).collect()[0]

    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    assert row["n"] == n
    assert math.isclose(row["mean"], mu, rel_tol=1e-12)
    assert math.isclose(row["var_pop"], m2, rel_tol=1e-12)
    assert math.isclose(row["std_pop"], statistics.pstdev(vals), rel_tol=1e-12)
    assert math.isclose(row["skewness"], m3 / m2 ** 1.5, rel_tol=1e-9)
    assert math.isclose(row["kurtosis_excess"], m4 / m2 ** 2 - 3.0, rel_tol=1e-9)


def test_sketch_merge_equals_whole(spark):
    df = spark.createDataFrame(
        [Row(g="g1" if i % 3 else "g2", v=float(i % 17) + 0.25) for i in range(200)]
    )
    whole = SK.moments_sketch(df, "v", by=["g"], scale=2)
    a = SK.moments_sketch(df.filter(F.col("v") < 8), "v", by=["g"], scale=2)
    b = SK.moments_sketch(df.filter(F.col("v") >= 8), "v", by=["g"], scale=2)
    merged = SK.merge_sketches(a, b, by=["g"])

    key = lambda r: r["g"]  # noqa: E731
    for rw, rm in zip(
        sorted(whole.collect(), key=key), sorted(merged.collect(), key=key)
    ):
        assert rw.asDict() == rm.asDict()  # exact decimal equality


def test_sketch_constant_series_null_shape_stats(spark):
    df = spark.createDataFrame([Row(g="c", v=4.0)] * 5)
    row = SK.moments_stats(SK.moments_sketch(df, "v", by=["g"]), by=["g"]).collect()[0]
    assert row["var_pop"] == 0.0
    assert row["std_pop"] is None and row["skewness"] is None
    assert row["kurtosis_excess"] is None
