"""Golden tests for the dual z-score semantics and the iforest ladder —
pinning the reference behaviors from FIXTURES.md F5 and SURVEY §7.4."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from smartdatapipeline_spark.operators import anomaly as A


def _series(spark, values, metric="m"):
    base = dt.date(2025, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                metric_date=base + dt.timedelta(days=i),
                metric=metric,
                value=(float(v) if v is not None else None),
            )
            for i, v in enumerate(values)
        ]
    )


def _by_date(rows):
    return {r["metric_date"].isoformat(): r for r in rows}


def test_w1_strict_flags_spike_and_gates_partial_windows(spark):
    # 7 identical-variance points then a huge spike
    vals = [10, 12, 11, 13, 10, 12, 11, 100]
    out = _by_date(
        A.rolling_zscore_strict(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    # positions 0..6: fewer than window prior rows ⇒ z NULL
    for i in range(7):
        assert out[f"2025-01-0{i+1}"]["z"] is None
        assert out[f"2025-01-0{i+1}"]["is_anomaly"] is False
    spike = out["2025-01-08"]
    assert spike["z"] is not None and abs(spike["z"]) >= 3.0
    assert spike["is_anomaly"] is True


def test_w1_null_in_window_disables_z(spark):
    vals = [10, 12, None, 13, 10, 12, 11, 100]
    out = _by_date(
        A.rolling_zscore_strict(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    # prior window of the last point contains a null ⇒ z stays NULL (W1 gate)
    assert out["2025-01-08"]["z"] is None


def test_w1_flat_window_sigma_zero_gives_null(spark):
    vals = [5, 5, 5, 5, 5, 5, 5, 9]
    out = _by_date(
        A.rolling_zscore_strict(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    assert out["2025-01-08"]["z"] is None
    assert out["2025-01-08"]["is_anomaly"] is False


def test_w2_flat_window_clamps_to_1e9_sign_independent(spark):
    """Reference routers/metrics.py:243-246: flat window ⇒ z=+1e9 for ANY
    deviation (even downward), 0.0 when equal."""
    vals = [5, 5, 5, 1]  # deviating DOWN
    out = _by_date(
        A.rolling_zscore_api(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    assert out["2025-01-04"]["z"] == 1e9  # positive sentinel despite v < mu
    assert out["2025-01-04"]["is_outlier"] is True
    vals_eq = [5, 5, 5, 5]
    out_eq = _by_date(
        A.rolling_zscore_api(_series(spark, vals_eq), window=7, z_thresh=3.0).collect()
    )
    assert out_eq["2025-01-04"]["z"] == 0.0
    assert out_eq["2025-01-04"]["is_outlier"] is False


def test_w2_needs_two_prior_nonnull(spark):
    vals = [5, 7, 9]
    out = _by_date(
        A.rolling_zscore_api(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    assert out["2025-01-01"]["z"] is None  # 0 prior
    assert out["2025-01-02"]["z"] is None  # 1 prior
    assert out["2025-01-03"]["z"] is not None  # 2 prior


def test_w2_skips_nulls_in_window(spark):
    """Window is [i-7, i) filtered to non-null; mean of {10, 20} = 15."""
    vals = [10, None, 20, 15]
    out = _by_date(
        A.rolling_zscore_api(_series(spark, vals), window=7, z_thresh=3.0).collect()
    )
    r = out["2025-01-04"]
    assert r["z"] == 0.0  # (15 - 15) / sd
    assert r["is_outlier"] is False


def test_w3_features_first_row(spark):
    out = _by_date(A.iforest_features(_series(spark, [4, 6])).collect())
    r0, r1 = out["2025-01-01"], out["2025-01-02"]
    assert r0["roll_mean_7"] == 4.0 and r0["roll_std_7"] == 0.0 and r0["diff_1"] == 0.0
    assert r1["roll_mean_7"] == 5.0 and r1["roll_std_7"] == 1.0 and r1["diff_1"] == 2.0


def test_iforest_insufficient_data_all_inlier(spark):
    """< 5 finite values ⇒ all-inlier, score NULL (routers/anomaly_iforest.py:79-93)."""
    out = A.anomaly_iforest(_series(spark, [1, 2, 3, 4])).collect()
    assert all(r["is_outlier"] is False for r in out)
    assert all(r["score"] is None for r in out)


def test_iforest_fallback_windows_over_nonnull_history(spark):
    """The fallback's history skips nulls: 7 non-null points spread over 9
    rows still arm the window for the 10th (routers/anomaly_iforest.py:137-141)."""
    vals = [10, None, 12, 11, None, 13, 10, 12, 11, 100]
    out = _by_date(A.anomaly_iforest(_series(spark, vals)).collect())
    spike = out["2025-01-10"]
    assert spike["is_outlier"] is True
    assert spike["score"] is not None and abs(spike["score"]) >= 3.0


def test_iforest_4d_executes_with_real_math(spark):
    """M7: the 4-D service variant always runs — sklearn when present,
    else the from-scratch numpy forest over the same W3 feature block.
    A spike that distorts all four features gets the top score."""
    from smartdatapipeline_spark.operators.anomaly import anomaly_iforest_4d

    vals = [10.0, 11.0, 10.5, 9.8, 10.2, 10.9, 500.0, 10.1, 9.9, 10.4,
            10.6, 10.3, 9.7, 10.8, 10.0, 10.2, 9.9, 10.5, 10.1, 10.7]
    out = anomaly_iforest_4d(_series(spark, vals)).collect()
    assert {"is_outlier", "score", "roll_mean_7", "roll_std_7", "diff_1"} <= set(
        out[0].asDict()
    )
    by = _by_date(out)
    spike = by["2025-01-07"]
    assert spike["is_outlier"] is True
    try:
        import sklearn  # noqa: F401
    except ImportError:
        # numpy convention: [0,1], higher = more anomalous
        assert spike["score"] == max(r["score"] for r in by.values())


def test_iforest_4d_deterministic_across_partitioning(spark):
    """The nd numpy forest seeds per group key: identical scores at any
    partition count."""
    from smartdatapipeline_spark.operators.anomaly import anomaly_iforest_4d

    vals = [float(v) for v in [5, 6, 5, 7, 6, 50, 5, 6, 7, 5, 6, 5]]
    a = _by_date(anomaly_iforest_4d(_series(spark, vals)).collect())
    b = _by_date(anomaly_iforest_4d(_series(spark, vals).repartition(7)).collect())
    assert {d: r["score"] for d, r in a.items()} == {
        d: r["score"] for d, r in b.items()
    }


def test_derive_horizon_clamps():
    """C3: clamp((end_date - last_obs).days, 0, 30)."""
    from smartdatapipeline_spark.operators.forecast import derive_horizon

    last = dt.date(2025, 1, 10)
    assert derive_horizon(last, dt.date(2025, 1, 17)) == 7
    assert derive_horizon(last, dt.date(2025, 1, 10)) == 0
    assert derive_horizon(last, dt.date(2025, 1, 1)) == 0
    assert derive_horizon(last, dt.date(2025, 6, 1)) == 30


def test_iforest_numpy_flags_spike(spark):
    """Real isolation-forest math (numpy, 200 trees): an obvious spike
    gets the series' top anomaly score and the outlier flag."""
    vals = [10.0, 11.0, 10.5, 9.8, 10.2, 10.9, 500.0, 10.1, 9.9, 10.4,
            10.6, 10.3, 9.7, 10.8, 10.0, 10.2, 9.9, 10.5, 10.1, 10.7]
    out = _by_date(A.anomaly_iforest_numpy(_series(spark, vals)).collect())
    spike = out["2025-01-07"]
    assert spike["is_outlier"] is True
    assert spike["score"] == max(r["score"] for r in out.values())
    normals = [r for d, r in out.items() if d != "2025-01-07"]
    assert all(r["is_outlier"] is False for r in normals)
    assert all(r["score"] < spike["score"] for r in normals)


def test_iforest_numpy_deterministic_across_runs(spark):
    """Per-group crc32 seeding: scores are identical run-to-run and
    partition-count-independent."""
    vals = [float(v) for v in [5, 6, 5, 7, 6, 50, 5, 6, 7, 5, 6, 5]]
    a = _by_date(A.anomaly_iforest_numpy(_series(spark, vals)).collect())
    b = _by_date(
        A.anomaly_iforest_numpy(_series(spark, vals).repartition(7)).collect()
    )
    assert {d: r["score"] for d, r in a.items()} == {
        d: r["score"] for d, r in b.items()
    }


def test_iforest_numpy_insufficient_data(spark):
    out = A.anomaly_iforest_numpy(_series(spark, [1.0, 2.0, 3.0, 4.0])).collect()
    assert all(r["is_outlier"] is False and r["score"] is None for r in out)


def test_anomaly_mad_flat_series_and_spike(spark):
    """MAD=0 (flat series) degrades like the flat-window convention:
    score NULL, outlier iff value differs from the median."""
    out = _by_date(A.anomaly_mad(_series(spark, [5.0] * 9 + [9.0])).collect())
    flat = out["2025-01-01"]
    assert flat["mad_z"] is None and flat["is_outlier"] is False
    spike = out["2025-01-10"]
    assert spike["mad_z"] is None and spike["is_outlier"] is True
    # non-degenerate series: the spike carries the max |modified z|
    vals = [10.0, 11.0, 10.5, 9.8, 10.2, 10.9, 500.0, 10.1, 9.9, 10.4]
    out2 = _by_date(A.anomaly_mad(_series(spark, vals)).collect())
    assert out2["2025-01-07"]["is_outlier"] is True
    assert all(
        not r["is_outlier"] for d, r in out2.items() if d != "2025-01-07"
    )


def test_rolling_mad_resists_window_contamination(spark):
    """The point of a robust detector: a spike ALREADY IN the window
    doesn't mask the next spike. Mean/stddev z (W2) gets dragged; the
    rolling-median MAD z still flags the second spike."""
    vals = [10.0, 10.5, 10.2, 9.8, 10.1, 10.3, 500.0, 10.2, 9.9, 480.0]
    mad = _by_date(
        A.rolling_mad_zscore(_series(spark, vals), window=7, min_periods=5).collect()
    )
    # second spike (index 9): prior window contains the 500 outlier but
    # the median/MAD barely move -> flagged
    assert mad["2025-01-10"]["is_outlier"] is True
    assert mad["2025-01-10"]["mad_z"] > 100
    # warmup rows below min_periods stay unflagged with NULL score
    assert mad["2025-01-03"]["mad_z"] is None
    assert mad["2025-01-03"]["is_outlier"] is False
    # flat prior window (no deviation): non-median value flags, score NULL
    flat = _by_date(
        A.rolling_mad_zscore(
            _series(spark, [5.0] * 8 + [7.0]), window=7, min_periods=5
        ).collect()
    )
    assert flat["2025-01-09"]["mad_z"] is None
    assert flat["2025-01-09"]["is_outlier"] is True


def test_cusum_detects_level_shift(spark):
    """A sustained level shift accumulates in S+ and crosses h, while a
    single spike (which rolling z flags) decays back below threshold —
    the complementary detector for drifts vs point anomalies."""
    shift = [10.0] * 10 + [14.0] * 10  # sustained +4 shift at index 10
    out = _by_date(
        A.cusum_changepoints(_series(spark, shift), k=1.0, h=6.0).collect()
    )
    # around the pooled mean (12), the early regime drifts low (S-)
    # and the late regime drifts high (S+) — the level-shift signature
    assert out["2025-01-20"]["is_changepoint"] is True
    assert out["2025-01-20"]["cusum_pos"] > 6.0
    assert out["2025-01-10"]["cusum_neg"] > 6.0
    assert out["2025-01-01"]["is_changepoint"] is False
    # S+ is monotone-increasing through the shifted regime
    tail = [out[f"2025-01-{d}"]["cusum_pos"] for d in range(14, 21)]
    assert tail == sorted(tail)
    # a single spike never crosses the same threshold
    spike = [10.0] * 19 + [14.0]
    out2 = A.cusum_changepoints(_series(spark, spike), k=1.0, h=6.0).collect()
    assert all(not r["is_changepoint"] for r in out2)
