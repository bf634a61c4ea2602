"""Conditional library-parity tests (round-3 VERDICT #6).

The sandbox has no statsmodels/sklearn wheels, so the M1/M6 model slots
run from-scratch numpy implementations (``arima_css_fn``,
``_iforest_scores_1d``). These tests ``importorskip`` the reference
libraries and, wherever they ARE installed, pin the from-scratch math
against them — skipped here, latent green anywhere the libs exist.

No SparkSession needed: both implementations expose their numeric core
at the pandas/numpy level, so parity is checked below the grouped-map
plumbing (which has its own tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _arma11_series(n: int, phi: float, theta: float, seed: int) -> np.ndarray:
    """Integrated ARMA(1,1) fixture: y = cumsum(w), w_t = φ w_{t-1} +
    ε_t + θ ε_{t-1} — the exact model class ARIMA(1,1,1) assumes."""
    rng = np.random.RandomState(seed)
    eps = rng.normal(0.0, 1.0, n + 100)
    w = np.zeros(n + 100)
    for t in range(1, n + 100):
        w[t] = phi * w[t - 1] + eps[t] + theta * eps[t - 1]
    return 100.0 + np.cumsum(w[100:])


@pytest.mark.parametrize("phi,theta,seed", [(0.6, 0.3, 7), (-0.5, -0.3, 11)])
def test_arima_css_matches_statsmodels_sarimax(phi, theta, seed):
    """From-scratch lattice-CSS ARIMA(1,1,1) vs statsmodels SARIMAX
    (1,1,1): fitted (φ, θ) within lattice-step + sampling tolerance of
    each other on a 400-point series generated from the true model, and
    point forecasts close relative to the series scale."""
    sm = pytest.importorskip("statsmodels.tsa.statespace.sarimax")

    from smartdatapipeline_spark.operators.forecast import (
        ARIMA_GRID_DENOM,
        ARIMA_GRID_K,
        arima_css_fn,
    )

    y = _arma11_series(400, phi, theta, seed)
    s = pd.Series(y)

    # recover the lattice argmin (same recursion arima_css_fn runs)
    w = np.diff(y)
    ks = np.arange(-ARIMA_GRID_K, ARIMA_GRID_K + 1)
    P = (ks / ARIMA_GRID_DENOM)[:, None]
    T = (ks / ARIMA_GRID_DENOM)[None, :]
    eps = np.full((len(ks), len(ks)), w[0])
    sse = np.zeros_like(eps)
    aw = w[0]
    for t in range(1, len(w)):
        eps = (w[t] - P * aw) - T * eps
        sse = sse + eps * eps
        aw = w[t]
    i, j = divmod(int(np.argmin(sse.ravel())), len(ks))
    phi_css = float(ks[i]) / ARIMA_GRID_DENOM
    theta_css = float(ks[j]) / ARIMA_GRID_DENOM

    fitted = sm.SARIMAX(
        s,
        order=(1, 1, 1),
        seasonal_order=(0, 0, 0, 0),
        enforce_stationarity=False,
        enforce_invertibility=False,
    ).fit(disp=False)
    phi_ml = float(fitted.arparams[0])
    theta_ml = float(fitted.maparams[0])

    # lattice step 0.05; CSS-vs-ML estimator gap + sampling noise on
    # n=400 stays well inside 0.15 for |φ|,|θ| ≤ 0.6
    assert abs(phi_css - phi_ml) <= 0.15
    assert abs(theta_css - theta_ml) <= 0.15

    ours = arima_css_fn(s, 7)
    theirs = fitted.get_forecast(steps=7).predicted_mean.to_numpy()
    scale = max(1.0, float(np.abs(np.diff(y)).mean()))
    assert np.max(np.abs(ours["yhat"].to_numpy() - theirs)) <= 5.0 * scale


def test_iforest_numpy_flags_agree_with_sklearn():
    """From-scratch 1-D isolation forest vs seeded sklearn
    IsolationForest: on a fixture with 5 gross spikes in 300 normals,
    both flag every spike in their top-5%, and the score ORDERINGS agree
    (Spearman ≥ 0.8). Exact tree parity is impossible — different RNG
    consumption — so agreement is on the decisions, like for like."""
    ensemble = pytest.importorskip("sklearn.ensemble")

    from smartdatapipeline_spark.operators.anomaly import _iforest_scores_1d

    rng = np.random.RandomState(3)
    x = rng.normal(100.0, 5.0, 300)
    spikes = np.array([500.0, -250.0, 800.0, 430.0, -600.0])
    x = np.concatenate([x, spikes])

    ours = _iforest_scores_1d(x, 200, "parity")
    clf = ensemble.IsolationForest(
        n_estimators=200, contamination=0.05, random_state=42
    ).fit(x.reshape(-1, 1))
    theirs = -clf.score_samples(x.reshape(-1, 1))  # higher = more anomalous

    k = int(np.ceil(0.05 * len(x)))
    top_ours = set(np.argsort(-ours)[:k])
    top_theirs = set(np.argsort(-theirs)[:k])
    spike_idx = set(range(300, 305))
    assert spike_idx <= top_ours
    assert spike_idx <= top_theirs

    def spearman(a, b):
        ra = np.argsort(np.argsort(a)).astype(float)
        rb = np.argsort(np.argsort(b)).astype(float)
        ra -= ra.mean()
        rb -= rb.mean()
        return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))

    assert spearman(ours, theirs) >= 0.8


def test_iforest_numpy_nd_flags_agree_with_sklearn():
    """4-D variant (M7): same decision-agreement check over a feature
    block with 3 planted multivariate outliers."""
    ensemble = pytest.importorskip("sklearn.ensemble")

    from smartdatapipeline_spark.operators.anomaly import _iforest_scores_nd

    rng = np.random.RandomState(5)
    X = rng.normal(0.0, 1.0, (300, 4))
    outliers = np.array([[8, 8, 8, 8], [-7, 9, -8, 7], [10, -10, 10, -10]], dtype=float)
    X = np.vstack([X, outliers])

    ours = _iforest_scores_nd(X, 200, "parity-nd")
    clf = ensemble.IsolationForest(
        n_estimators=200, contamination=0.05, random_state=42
    ).fit(X)
    theirs = -clf.score_samples(X)

    k = int(np.ceil(0.05 * len(X)))
    top_ours = set(np.argsort(-ours)[:k])
    top_theirs = set(np.argsort(-theirs)[:k])
    out_idx = set(range(300, 303))
    assert out_idx <= top_ours
    assert out_idx <= top_theirs


# --------------------------------------------------------------------------
# Round-7 (verdict r6 task #6): LATENT BIT-PARITY goldens for the full
# pipeline entry points. The tolerance tests above compare the numeric
# cores; these pin the day statsmodels/sklearn appear: forecast() must
# route through the gated SARIMAX slot and reproduce the reference
# recipe (services/forecast.py:39-92) BIT-EXACTLY, and anomaly_iforest()
# must reproduce the reference's sklearn calls
# (routers/anomaly_iforest.py:96-126) decision-for-decision,
# score-for-score. Skipped in this sandbox (no wheels); green means
# parity is PROVEN, not assumed.
# --------------------------------------------------------------------------


def _pinned_series_rows():
    """20 gapless days of deterministic values — above MIN_POINTS, no
    zeros-sum shortcut, no date-spine dependence (the reference asfreq-
    fills gaps; a gapless fixture pins the shared path)."""
    import datetime as dt

    base = dt.date(2024, 3, 1)
    vals = [100.0 + 7.0 * ((i * 13) % 5) - 3.0 * ((i * 29) % 3) + i for i in range(20)]
    return [(base + dt.timedelta(days=i), "value_sum", v) for i, v in enumerate(vals)], vals


def test_forecast_entry_bit_parity_with_sarimax(spark):
    """forecast() output == the reference's exact SARIMAX recipe, bit
    for bit (yhat, yhat_lower, yhat_upper, strictly-future dates,
    model_version tag)."""
    sm = pytest.importorskip("statsmodels.tsa.statespace.sarimax")

    from smartdatapipeline_spark.operators.forecast import forecast

    rows, vals = _pinned_series_rows()
    df = spark.createDataFrame(rows, "metric_date date, metric string, value double")
    got = {
        str(r["target_date"]): (r["yhat"], r["yhat_lower"], r["yhat_upper"], r["model_version"])
        for r in forecast(df, horizon_days=7).collect()
    }

    # the reference recipe, verbatim (services/forecast.py:68-92)
    s = pd.Series(
        vals,
        index=pd.date_range("2024-03-01", periods=len(vals), freq="D"),
        dtype=float,
    )
    fitted = sm.SARIMAX(
        s,
        order=(1, 1, 1),
        seasonal_order=(0, 0, 0, 0),
        enforce_stationarity=False,
        enforce_invertibility=False,
    ).fit(disp=False)
    fc = fitted.get_forecast(steps=7)
    ci = fc.conf_int()
    idx = pd.date_range(s.index.max() + pd.Timedelta(days=1), periods=7, freq="D")
    ref = pd.DataFrame(
        {
            "yhat": fc.predicted_mean.to_numpy(),
            "yhat_lower": ci.iloc[:, 0].to_numpy(),
            "yhat_upper": ci.iloc[:, 1].to_numpy(),
        },
        index=idx,
    ).ffill().fillna(0.0)

    assert set(got) == {str(d.date()) for d in idx}
    for d, row in ref.iterrows():
        yh, lo, hi, ver = got[str(d.date())]
        assert ver == "sarimax-0.1"
        assert yh == row["yhat"], (d, yh, row["yhat"])  # bit-exact
        assert lo == row["yhat_lower"]
        assert hi == row["yhat_upper"]


def test_anomaly_iforest_entry_bit_parity_with_sklearn(spark):
    """anomaly_iforest() == the reference's IsolationForest recipe
    (contamination, n_estimators=200, random_state=42; predict ==
    -1 ⇒ outlier; decision_function score) bit for bit."""
    ensemble = pytest.importorskip("sklearn.ensemble")

    from smartdatapipeline_spark.operators.anomaly import anomaly_iforest

    import datetime as dt

    base = dt.date(2024, 4, 1)
    vals = [float(v) for v in (10, 11, 9, 10, 12, 11, 10, 300, 9, 10, 11, 10, 9, 12, -250, 10, 11, 10, 9, 11)]
    rows = [(base + dt.timedelta(days=i), "value_sum", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric_date date, metric string, value double")
    got = {
        str(r["metric_date"]): (bool(r["is_outlier"]), r["score"])
        for r in anomaly_iforest(df, contamination=0.1).collect()
    }

    X = np.array([[v] for v in vals], dtype=float)
    model = ensemble.IsolationForest(
        contamination=0.1, n_estimators=200, random_state=42
    )
    model.fit(X)
    preds = model.predict(X)
    scores = model.decision_function(X)
    for i, (p, sc) in enumerate(zip(preds, scores)):
        d = str(base + dt.timedelta(days=i))
        assert got[d][0] == (p == -1), d
        assert got[d][1] == float(sc), d  # bit-exact
