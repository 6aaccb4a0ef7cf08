"""M1/M2 statistical parity vs the reference's OWN committed outputs
(VERDICT r3 item 5): not determinism or shape checks, but measured
deltas with documented tolerances.

M1: the reference selects its GWR bandwidth with mgwr's AICc
golden-section (gwr_model.py:84-93) and commits the resulting
predictions for all 19,125 points in outputs/results.csv. The engine
selects by holdout-CV golden-section (models/gwr.py:77-115). Parity is
judged prediction-vs-prediction on the reference's own combined.csv.
Measured at HEAD (full 19,125 points): corr 0.99892, rmse 0.00258,
and the two models' fit-vs-actual-NDVI RMSEs agree to 0.0002
(ours 0.03357 vs mgwr 0.03338) — the CV-selected bandwidth is
statistically interchangeable with the AICc one.

M2: the reference runs 10 pyro SVI/Adam steps on a GPRegression
before predicting (GaussianProcesses.py:38-43); the engine computes
the exact RBF posterior mean at the initial hyperparameters
(models/gp.py). pyro is not installed here, but for an exact GPR the
ELBO IS the log marginal likelihood, so 10 SVI/Adam steps are exactly
10 Adam steps (defaults: lr 0.01, betas 0.9/0.999, eps 1e-8) of
gradient ascent on the lml in unconstrained log-space (the positive-
constraint bijection). The test replays that drift in numpy on the
reference's own per-zone series (outputs/Databases/woredas.csv, 151
zones) and measures the posterior-mean delta. Measured at HEAD:
hyperparameters drift ~10% (ls 60 -> ~54, var 0.5 -> ~0.45, noise
0.01 -> ~0.011); mean |delta| 0.0155 on a 0.434 biomass scale
(~3.6%), max 0.018 at the last in-sample point, growing to 0.16 at
the +48-day extrapolation horizon where both posteriors revert to the
mean at slightly different rates.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

REF_OUT = "/root/reference/src/outputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_OUT), reason="reference outputs not present")


def test_m1_gwr_prediction_parity_vs_mgwr_reference():
    from lswms_forage_etl_spark.models.gwr import (
        _wls_predict,
        select_bandwidth,
    )

    comb = pd.read_csv(f"{REF_OUT}/combined.csv")
    res = pd.read_csv(f"{REF_OUT}/results.csv")
    assert len(comb) == len(res) == 19125

    coords = comb[["lon", "lat"]].to_numpy(float)
    x = comb[["sm", "preci"]].fillna(0).to_numpy(float)
    y = comb["ndvi"].fillna(0).to_numpy(float)
    ref = res["pred"].to_numpy(float)

    bw = select_bandwidth(coords, x, y)
    # mgwr's AICc search lands in the same adaptive-NN regime
    assert 20 <= bw <= 120

    # score a bounded deterministic subsample (stats are stable; full-set
    # numbers in the module docstring)
    rng = np.random.RandomState(11)
    idx = rng.choice(len(comb), size=3000, replace=False)
    pred = _wls_predict(coords, x, y, coords[idx], x[idx], bw)

    d = pred - ref[idx]
    rmse = float(np.sqrt(np.mean(d**2)))
    corr = float(np.corrcoef(pred, ref[idx])[0, 1])
    assert corr > 0.995, corr
    assert rmse < 0.006, rmse

    # equal fit quality against the actual NDVI (neither model should be
    # meaningfully better on its own training target)
    rmse_ours = float(np.sqrt(np.mean((pred - y[idx]) ** 2)))
    rmse_ref = float(np.sqrt(np.mean((ref[idx] - y[idx]) ** 2)))
    assert abs(rmse_ours - rmse_ref) < 0.003, (rmse_ours, rmse_ref)


def _lml(x, yc, ls, var, noise):
    k = var * np.exp(-0.5 * ((x[:, None] - x[None, :]) / ls) ** 2) \
        + noise * np.eye(len(x))
    _, logdet = np.linalg.slogdet(k)
    alpha = np.linalg.solve(k, yc)
    return float(-0.5 * (yc @ alpha) - 0.5 * logdet
                 - 0.5 * len(x) * np.log(2 * np.pi))


def _svi_drifted_params(x, yc, steps=10, lr=0.01):
    """pyro SVI(Adam) emulation: Adam ascent on the exact lml in
    log-space (ExpTransform bijection of the positive constraint)."""
    from lswms_forage_etl_spark.models.gp import (
        NOISE,
        RBF_LENGTHSCALE,
        RBF_VARIANCE,
    )

    theta = np.log(np.array([RBF_LENGTHSCALE, RBF_VARIANCE, NOISE]))
    m = np.zeros(3)
    v = np.zeros(3)
    h = 1e-5
    for t in range(1, steps + 1):
        g = np.empty(3)
        for i in range(3):
            tp = theta.copy()
            tp[i] += h
            tm = theta.copy()
            tm[i] -= h
            g[i] = (_lml(x, yc, *np.exp(tp))
                    - _lml(x, yc, *np.exp(tm))) / (2 * h)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        theta = theta + lr * (m / (1 - 0.9**t)) \
            / (np.sqrt(v / (1 - 0.999**t)) + 1e-8)
    return np.exp(theta)


def _posterior_mean(x, y, x_star, ls, var, noise):
    mu = float(np.mean(y))
    k = var * np.exp(-0.5 * ((x[:, None] - x[None, :]) / ls) ** 2) \
        + noise * np.eye(len(x))
    ks = var * np.exp(-0.5 * ((x_star[:, None] - x[None, :]) / ls) ** 2)
    return ks @ np.linalg.solve(k, y - mu) + mu


def test_m2_gp_exact_posterior_vs_svi_drift_on_reference_series():
    from lswms_forage_etl_spark.models.gp import (
        HORIZON_DAYS,
        gp_posterior_mean,
    )

    wor = pd.read_csv(f"{REF_OUT}/Databases/woredas.csv")
    h0 = []          # last in-sample point
    all_d = []       # every horizon
    drifts = []
    for _, g in wor.groupby("Dataset"):
        g = g.dropna(subset=["Biomass"]).sort_values("Date")
        if len(g) < 2:
            continue
        dates = pd.to_datetime(g["Date"], format="%Y%m%d")
        x = (dates - dates.iloc[0]).dt.days.to_numpy(float)
        y = g["Biomass"].to_numpy(float)
        x_star = np.array([x[-1]] + [x[-1] + h for h in HORIZON_DAYS])
        ours = gp_posterior_mean(x, y, x_star)
        ls, var, noise = _svi_drifted_params(x, y - np.mean(y))
        drifts.append((ls, var, noise))
        ref_like = _posterior_mean(x, y, x_star, ls, var, noise)
        d = np.abs(ours - ref_like)
        h0.append(d[0])
        all_d.append(d)

    assert len(all_d) == 151                  # every reference zone
    all_d = np.stack(all_d)
    drifts = np.array(drifts)

    # 10 Adam steps at lr=0.01 move hyperparameters by ~10%, justifying
    # the fixed-hyperparameter exact posterior as the deterministic twin
    assert np.all(drifts[:, 0] > 45) and np.all(drifts[:, 0] < 75)
    assert np.all(drifts[:, 1] > 0.35) and np.all(drifts[:, 1] < 0.65)

    scale = float(wor["Biomass"].abs().mean())  # ~0.434
    assert float(np.max(h0)) < 0.05 * max(scale, 1e-9) + 0.03
    assert float(all_d.mean()) < 0.03          # ~3.6% of the biomass scale
    assert float(all_d.max()) < 0.25           # +48d extrapolation tail
