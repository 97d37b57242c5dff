"""Forecast harness (F1–F3 surrogates, F13): each grouped-UDF model is
checked against an independent driver-side numpy/pandas implementation —
the correctness story for operators the DuckDB oracle can't cover."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def events_pdf(spark, sf_dir):
    from portofolio_maximizer_spark.plans.queries_stats import _series

    return _series(spark, sf_dir).toPandas()


def test_ewma_matches_pandas(spark, sf_dir, events_pdf):
    got = QUERIES["ewma_vol_recursive"](spark, sf_dir).toPandas()
    one = events_pdf[events_pdf.user_id == events_pdf.user_id.iloc[0]].sort_values(
        "rn"
    )
    r = one.lr.dropna().to_numpy()
    lam, var = 0.94, r[0] ** 2
    expect = []
    for t in range(1, len(r)):
        var = lam * var + (1 - lam) * r[t - 1] ** 2
        expect.append(np.sqrt(var))
    mine = got[got.user_id == one.user_id.iloc[0]].sort_values("rn").sigma.to_numpy()
    assert len(mine) == len(expect)
    np.testing.assert_allclose(mine, np.round(expect, 6), atol=1e-6)


def test_ar_forecast_recovers_ar1(spark):
    """A synthetic AR(1) series must be identified (order 1 wins AIC) and
    forecast close to the true conditional mean."""
    rng = np.random.default_rng(7)
    n, phi, c = 400, 0.8, 2.0
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = c + phi * x[t - 1] + rng.normal(0, 0.1)
    pdf = pd.DataFrame(
        {"user_id": 1, "rn": np.arange(n), "value": x}
    )
    from portofolio_maximizer_spark.forecast import ar_grid_forecast

    out = ar_grid_forecast(spark.createDataFrame(pdf)).toPandas()
    assert (out.best_order == 1).all()
    step1 = out[out.horizon_step == 1].iloc[0]
    expect = c + phi * x[-1]
    assert abs(step1.yhat - expect) < 0.1
    assert step1.lo < step1.yhat < step1.hi


def test_ssa_beats_naive_on_structured_series(spark, sf_dir):
    out = QUERIES["ssa_reconstruction"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.evr >= 0.9).all()
    # reconstruction of a rank-truncated SVD must on average beat the
    # naive diff RMSE on series with any structure
    assert (out.recon_rmse <= out.naive_rmse).mean() > 0.5


def test_classifier_fits_and_is_deterministic(spark, sf_dir):
    """The synthetic embeddings carry no label signal (test accuracy ≈
    chance, by construction of the testdata) — what must hold is that the
    optimizer genuinely fits (train accuracy ≫ 10-class chance via
    memorization) and that the whole pipeline is run-to-run deterministic."""
    row = QUERIES["embedding_classifier_eval"](spark, sf_dir).collect()[0]
    assert row.n_train + row.n_calib + row.n_test == 500
    assert row.train_accuracy > 0.3  # memorizes 64-dim train set, chance=0.1
    assert 0.0 <= row.accuracy <= 1.0
    # calibration stage (F13): ECE present and sane; Platt must not make
    # calibration dramatically worse than raw confidences
    assert 0.0 <= row.ece_uncalibrated <= 1.0
    assert 0.0 <= row.ece_platt <= 1.0
    assert row.platt_a == row.platt_a  # finite (not NaN)
    row2 = QUERIES["embedding_classifier_eval"](spark, sf_dir).collect()[0]
    assert row.accuracy == row2.accuracy
    assert row.train_accuracy == row2.train_accuracy
    assert row.ece_platt == row2.ece_platt


def test_ece_matches_independent_numpy(spark):
    """Spark 15-bin ECE == independent numpy ECE on a synthetic scored
    frame with known miscalibration."""
    import numpy as np
    import pandas as pd

    from portofolio_maximizer_spark.forecast.classifier import (
        expected_calibration_error,
    )

    rng = np.random.default_rng(7)
    conf = rng.uniform(0.05, 0.999, 400)
    # overconfident by construction: true hit prob is conf * 0.8
    correct = (rng.uniform(size=400) < conf * 0.8).astype(float)
    sdf = spark.createDataFrame(pd.DataFrame({"conf": conf, "correct": correct}))
    got = expected_calibration_error(sdf, n_bins=15)

    bins = np.minimum((conf * 15).astype(int), 14)
    ece = 0.0
    for b in range(15):
        m = bins == b
        if m.sum():
            ece += m.sum() / 400 * abs(correct[m].mean() - conf[m].mean())
    assert abs(got - ece) < 1e-9


def test_platt_fit_matches_numpy_irls(spark):
    """MLlib's single-feature unregularized logistic MLE (the Platt fit)
    must agree with an independent numpy Newton/IRLS solve."""
    import numpy as np
    import pandas as pd

    from portofolio_maximizer_spark.forecast.classifier import fit_platt

    rng = np.random.default_rng(11)
    conf = rng.uniform(0.1, 0.999, 600)
    s = np.log(conf / (1 - conf))
    true_a, true_b = 0.7, -0.4
    p = 1.0 / (1.0 + np.exp(-(true_a * s + true_b)))
    correct = (rng.uniform(size=600) < p).astype(float)

    sdf = spark.createDataFrame(pd.DataFrame({"conf": conf, "correct": correct}))
    a, b = fit_platt(sdf)

    # numpy IRLS for logistic regression on (s, correct)
    X = np.column_stack([s, np.ones_like(s)])
    w = np.zeros(2)
    for _ in range(50):
        z = X @ w
        mu = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (correct - mu)
        W = mu * (1 - mu)
        H = X.T @ (X * W[:, None])
        step = np.linalg.solve(H, g)
        w = w + step
        if np.abs(step).max() < 1e-12:
            break
    assert abs(a - w[0]) < 1e-3 and abs(b - w[1]) < 1e-3


def test_cusum_detects_injected_shift(spark):
    """A mean shift of +3σ at t=100 must raise an up-shift alarm shortly
    after the break, and a flat-noise series must raise none."""
    import numpy as np
    import pandas as pd

    from portofolio_maximizer_spark.forecast.models import cusum_changepoints

    rng = np.random.default_rng(3)
    calm = rng.normal(0, 1, 100)
    shifted = rng.normal(3, 1, 40)
    lr = np.concatenate([calm, shifted])
    pdf = pd.DataFrame({"user_id": 1, "rn": range(len(lr)), "lr": lr})
    out = cusum_changepoints(spark.createDataFrame(pdf), h=3.0).toPandas()
    ups = out[out.direction == 1]
    assert len(ups) >= 1
    assert ups.rn.min() >= 100  # no alarm before the break
    assert ups.rn.min() <= 110  # detected within ~10 bars

    # alarms in the calm pre-break segment must be rare (CUSUM standardizes
    # against its own history, so iid noise fires only occasionally)
    pre_break = out[out.rn < 100]
    assert len(pre_break) <= 3


def test_ar_fanout_matches_intask_and_fans_per_candidate(spark):
    """The (key, order) candidate fan-out must produce byte-identical
    output to the in-task grid, and the candidate table must contain one
    independent fit per (key, order) — the unit of parallelism."""
    rng = np.random.default_rng(11)
    frames = []
    for uid, phi in [(1, 0.7), (2, -0.4), (3, 0.2)]:
        n = 120
        x = np.zeros(n)
        for t in range(1, n):
            x[t] = 1.0 + phi * x[t - 1] + rng.normal(0, 0.2)
        frames.append(pd.DataFrame({"user_id": uid, "rn": np.arange(n), "value": x}))
    sdf = spark.createDataFrame(pd.concat(frames))

    from portofolio_maximizer_spark.forecast import (
        ar_candidate_fits,
        ar_grid_forecast,
        ar_grid_forecast_fanout,
    )

    cand = ar_candidate_fits(sdf).toPandas()
    # one fit (5 forecast rows) per (key, order) candidate: 3 keys × 3 orders
    combos = cand.groupby(["user_id", "p"]).size()
    assert len(combos) == 9
    assert (combos == 5).all()

    intask = (
        ar_grid_forecast(sdf).toPandas()
        .sort_values(["user_id", "horizon_step"]).reset_index(drop=True)
    )
    fanout = (
        ar_grid_forecast_fanout(sdf).toPandas()
        .sort_values(["user_id", "horizon_step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(intask, fanout, check_exact=True)


def test_ar_fanout_plan_groups_by_candidate(spark):
    """The fit stage's grouping key must include the order column — i.e.
    candidates, not just keys, are the distributed unit."""
    pdf = pd.DataFrame({"user_id": 1, "rn": range(40), "value": np.sin(np.arange(40))})
    from portofolio_maximizer_spark.forecast import ar_candidate_fits

    plan = ar_candidate_fits(spark.createDataFrame(pdf))._jdf.queryExecution().toString()
    assert "FlatMapGroupsInArrow" in plan  # numpy kernels on the Arrow fast path
    # grouping expressions carry both user_id and the candidate order p
    import re
    seg = plan[plan.index("FlatMapGroupsInArrow"):].split("\n")[0]
    assert "user_id" in seg and re.search(r"\bp\b|p#", seg)


def test_walkforward_refit_is_leakfree_and_skillful(spark):
    """Refit-per-fold walk-forward: coefficients must come from the train
    window only (leak-free), and on a strongly AR series the refit model
    must beat the naive forecaster on most folds."""
    rng = np.random.default_rng(3)
    n, phi, c = 250, 0.9, 1.0
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = c + phi * x[t - 1] + rng.normal(0, 0.1)
    sdf = spark.createDataFrame(
        pd.DataFrame({"user_id": 1, "rn": np.arange(n), "value": x})
    )
    from portofolio_maximizer_spark.forecast import walkforward_refit

    out = walkforward_refit(sdf).toPandas().sort_values("fold")
    assert list(out.fold) == [2, 3, 4, 5]
    # expanding window: train size strictly grows fold to fold
    assert out.n_train.is_monotonic_increasing and out.n_train.iloc[0] > 0
    # every fold picked an order from the grid, and the refit model beats
    # naive on most folds (on the largest train window AIC identifies
    # AR(1) — small-window AIC may legitimately prefer order 2)
    assert out.best_order.isin([1, 2]).all()
    assert out[out.n_train >= 150].best_order.eq(1).all()
    assert (out.skill > 0).mean() >= 0.75

    # leak-freedom: corrupting fold-5 test values must not change the
    # fold-5 model (same train window -> same AIC); only its scores move
    x2 = x.copy()
    fold_size = n // 5
    x2[4 * fold_size:] += 100.0
    sdf2 = spark.createDataFrame(
        pd.DataFrame({"user_id": 1, "rn": np.arange(n), "value": x2})
    )
    out2 = walkforward_refit(sdf2).toPandas().sort_values("fold")
    f5, f5b = out[out.fold == 5].iloc[0], out2[out2.fold == 5].iloc[0]
    assert f5.aic == f5b.aic and f5.n_train == f5b.n_train
    assert f5b.rmse != f5.rmse


def test_walkforward_refit_replay_numpy(spark):
    """Fold-2 metrics must equal an independent numpy replay of the
    expanding-window AR fit + 1-step scoring."""
    rng = np.random.default_rng(5)
    n = 150
    x = np.cumsum(rng.normal(0.1, 1.0, n)) + 50
    sdf = spark.createDataFrame(
        pd.DataFrame({"user_id": 7, "rn": np.arange(n), "value": x})
    )
    from portofolio_maximizer_spark.forecast import walkforward_refit
    from portofolio_maximizer_spark.forecast.models import _fit_ar

    out = walkforward_refit(sdf, orders=(1, 2)).toPandas()
    row = out[out.fold == 2].iloc[0]
    # replay: ntile(5) boundaries — first fold gets ceil(n/5) when uneven
    sizes = [n // 5 + (1 if i < n % 5 else 0) for i in range(5)]
    b1 = sizes[0]
    train, test = x[:b1], x[b1 : b1 + sizes[1]]
    fits = {p: _fit_ar(train, p) for p in (1, 2)}
    best = min((1, 2), key=lambda p: fits[p][2])
    beta = fits[best][0]
    full = np.concatenate([train, test])
    preds = [
        beta[0] + sum(beta[j + 1] * full[t - j - 1] for j in range(best))
        for t in range(len(train), len(full))
    ]
    rmse = float(np.sqrt(np.mean((test - np.array(preds)) ** 2)))
    assert row.best_order == best
    assert abs(row.rmse - round(rmse, 6)) < 1e-9
    assert row.n_train == b1 and row.n_test == sizes[1]


def test_mssa_q_iteration_learned_policy_beats_uniform(spark):
    """Planted regime-switch series (calm trend → high-vol random walk):
    the offline learning loop must visit multiple variance-ratio states
    and its greedy per-state policy must achieve a strictly higher mean
    reward than the uniform (action-agnostic) policy on the experience
    it learned from — the artifact builder's own validation notion
    (reference `mssa_rl.py:425-437` mean_reward of best actions)."""
    from portofolio_maximizer_spark.forecast.models import mssa_reward_windows

    rng = np.random.default_rng(5)
    rows = []
    for uid in range(4):
        n = 400
        x = np.zeros(n)
        lvl = 100.0
        for t in range(n):
            if t < n // 2:
                lvl += 0.3 + rng.normal(0, 0.2)  # calm trend regime
            else:
                lvl += rng.normal(0, 3.0)  # high-vol random regime
            x[t] = lvl
        rows += [(uid, t, float(x[t])) for t in range(n)]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, value double")
    pdf = mssa_reward_windows(sdf).toPandas()
    assert pdf.state.nunique() >= 3  # the regime switch moves the state
    assert set(pdf.action) == {0, 1, 2}
    cell = pdf.groupby(["state", "action"]).reward.agg(["mean", "count"])
    best = cell["mean"].groupby(level=0).idxmax()
    learned = sum(
        cell.loc[b, "mean"] * cell.loc[b, "count"] for b in best
    ) / sum(cell.loc[b, "count"] for b in best)
    uniform = pdf.reward.mean()
    assert learned > uniform + 0.02
    # rewards are the clipped relative-RMSE-improvement definition
    assert pdf.reward.between(-1.0, 1.0).all()
    assert (pdf.baseline_rmse > 0).all()


def test_mssa_policy_actions_semantics(spark, sf_dir):
    """Learned-policy stage: states in range, the applied policy equals
    the one mssa_q_iteration learns from the shared experience table,
    under-supported/unseen states fall back to HOLD, and the policy
    lookup is a broadcast join."""
    from portofolio_maximizer_spark.plans import QUERIES
    from portofolio_maximizer_spark.plans.queries_stats import _MSSA_MIN_SUPPORT

    df = QUERIES["mssa_policy_actions"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out = df.toPandas()
    assert len(out) > 0
    assert out.state.isin([0, 1, 2, 3]).all()
    learned = QUERIES["mssa_q_iteration"](spark, sf_dir).toPandas()
    table = {
        int(r.state): (int(r.action), round(float(r.action_value), 6), int(r.support))
        for _, r in learned[learned.is_best].iterrows()
    }
    for _, row in out.iterrows():
        if row.state not in table:  # state never visited in training
            assert row.policy_status == "insufficient_support"
            assert row.selected_action == 1 and row.support == 0
            continue
        a, q, n = table[row.state]
        assert row.best_action == a and row.support == n
        assert abs(row.q_value - q) < 1e-9
        if n >= _MSSA_MIN_SUPPORT:
            assert row.policy_status == "ready" and row.selected_action == a
        else:
            assert row.policy_status == "insufficient_support"
            assert row.selected_action == 1  # HOLD fallback


def test_garch11_recovers_simulated_parameters(spark):
    """Fit on simulated GARCH(1,1) paths: recovered (alpha, beta) must be
    near truth, the fitted likelihood must beat the true-parameter
    likelihood evaluated on the same grid-free recursion (MLE property,
    up to grid resolution), and the fit must be deterministic."""
    import numpy as np
    import pandas as pd

    from portofolio_maximizer_spark.forecast import garch11_fit

    rng = np.random.default_rng(17)
    omega, alpha, beta = 4e-6, 0.08, 0.88
    rows = []
    for uid in range(3):
        n = 2000
        r = np.zeros(n)
        s2 = omega / (1 - alpha - beta)
        for t in range(1, n):
            s2 = omega + alpha * r[t - 1] ** 2 + beta * s2
            r[t] = rng.normal(0, np.sqrt(s2))
        rows += [(uid, t, float(r[t])) for t in range(n)]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")

    out = garch11_fit(sdf).toPandas().sort_values("user_id")
    assert len(out) == 3
    for _, row in out.iterrows():
        assert abs(row.alpha - alpha) < 0.06
        assert abs(row.beta - beta) < 0.10
        assert row.persistence < 0.999
        assert row.igarch_guard in (0, 1)
        assert row.sigma_next > 0

        # MLE property: fitted ll >= ll at the true parameters
        r = np.array([v for (u, t, v) in rows if u == row.user_id])
        r = r - r.mean()
        r2 = r * r
        var0 = r2.mean()

        def ll_of(a, b, w):
            s2, ll = var0, 0.0
            for t in range(1, len(r2)):
                s2 = w + a * r2[t - 1] + b * s2
                ll -= 0.5 * (np.log(s2) + r2[t] / s2)
            return ll

        ll_true = ll_of(alpha, beta, omega)
        assert row.loglik >= ll_true - 1.0  # within grid resolution

    again = garch11_fit(sdf).toPandas().sort_values("user_id")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_garch11_flags_near_igarch_series(spark):
    """A near-integrated simulated path (alpha+beta ≈ 0.99) must trip the
    reference's persistence guard flag."""
    import numpy as np

    from portofolio_maximizer_spark.forecast import garch11_fit

    rng = np.random.default_rng(23)
    omega, alpha, beta = 1e-6, 0.15, 0.845
    n = 3000
    r = np.zeros(n)
    s2 = omega / (1 - alpha - beta)
    for t in range(1, n):
        s2 = omega + alpha * r[t - 1] ** 2 + beta * s2
        r[t] = rng.normal(0, np.sqrt(s2))
    sdf = spark.createDataFrame(
        [(1, t, float(r[t])) for t in range(n)], "user_id long, rn long, lr double"
    )
    out = garch11_fit(sdf).toPandas()
    assert len(out) == 1
    assert out.persistence.iloc[0] > 0.95
    assert out.igarch_guard.iloc[0] == 1


def test_arima_hr_recovers_arma11(spark):
    """Simulated ARMA(1,1) with a strong MA term: the grid must select a
    model with q >= 1 (the AR-only surrogate cannot express it), recover
    (phi, theta)-implied dynamics, and forecast near the true conditional
    mean."""
    rng = np.random.default_rng(29)
    n, phi, theta, c = 1500, 0.6, 0.55, 1.0
    e = rng.normal(0, 0.2, n)
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = c + phi * x[t - 1] + e[t] + theta * e[t - 1]
    sdf = spark.createDataFrame(
        [(1, t, float(x[t])) for t in range(n)], "user_id long, rn long, value double"
    )
    from portofolio_maximizer_spark.forecast import arima_hr_forecast

    out = arima_hr_forecast(sdf).toPandas().sort_values("horizon_step")
    assert len(out) == 5
    assert out.d.iloc[0] == 0
    assert out.q.iloc[0] >= 1  # MA structure detected
    step1 = out.iloc[0]
    expect = c + phi * x[-1] + theta * e[-1]
    assert abs(step1.yhat - expect) < 0.15
    assert step1.lo < step1.yhat < step1.hi
    # bands widen with horizon (psi-weight variance is nondecreasing)
    widths = (out.hi - out.lo).to_numpy()
    assert (np.diff(widths) >= -1e-9).all()


def test_arima_hr_selects_differencing_on_random_walk(spark):
    """A random-walk-with-drift series must select d=1 and forecast the
    level continuing from the last observation plus the drift."""
    rng = np.random.default_rng(31)
    n, drift = 1200, 0.5
    x = np.cumsum(drift + rng.normal(0, 0.3, n))
    sdf = spark.createDataFrame(
        [(1, t, float(x[t])) for t in range(n)], "user_id long, rn long, value double"
    )
    from portofolio_maximizer_spark.forecast import arima_hr_forecast

    out = arima_hr_forecast(sdf).toPandas().sort_values("horizon_step")
    assert out.d.iloc[0] == 1
    step5 = out[out.horizon_step == 5].iloc[0]
    assert abs(step5.yhat - (x[-1] + 5 * drift)) < 1.0
    # integrated forecasts: variance grows superlinearly vs the d=0 case
    widths = (out.hi - out.lo).to_numpy()
    assert widths[-1] > widths[0]


def test_samossa_forecasts_periodic_signal(spark):
    """SSA R-forecast must continue a noisy sine wave: the combined
    trend+AR forecast must beat last-value-carry-forward by a wide margin
    on the held-out continuation, and be deterministic."""
    rng = np.random.default_rng(41)
    n, period, amp = 240, 12, 5.0
    t = np.arange(n + 5)
    signal = amp * np.sin(2 * np.pi * t / period) + 0.02 * t
    noise = rng.normal(0, 0.3, n + 5)
    x_full = signal + noise
    x, future = x_full[:n], x_full[n:]

    sdf = spark.createDataFrame(
        [(1, int(i), float(x[i])) for i in range(n)],
        "user_id long, rn long, value double",
    )
    from portofolio_maximizer_spark.forecast import samossa_forecast

    out = samossa_forecast(sdf).toPandas().sort_values("horizon_step")
    assert len(out) == 5
    yhat = out.yhat.to_numpy()
    rmse_model = np.sqrt(np.mean((yhat - future) ** 2))
    rmse_naive = np.sqrt(np.mean((x[-1] - future) ** 2))
    assert rmse_model < 0.5 * rmse_naive
    # the deterministic trend does the heavy lifting on a periodic signal
    assert np.abs(out.trend_part.to_numpy() - signal[n:]).max() < 1.5

    again = samossa_forecast(sdf).toPandas().sort_values("horizon_step")
    assert (again.yhat.to_numpy() == yhat).all()


def test_samossa_query_runs(spark, sf_dir):
    from portofolio_maximizer_spark.plans import QUERIES

    out = QUERIES["samossa_forecast"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert set(out.horizon_step) == {1, 2, 3, 4, 5}
    assert out.sigma.gt(0).all()


def test_arima_adf_differencing_decision(spark):
    """ADF-based d-selection (reference `forcester_ts/forecaster.py:
    611-680` stationarity gate): a TRUE random walk whose small-sample
    AR(1) coefficient is ~0.95 — which the old persistence-threshold rule
    (d=1 iff coef >= 0.97) left undifferenced — must now select d=1,
    while a genuinely stationary near-unit-root AR(1) (phi=0.95, long
    sample) must stay d=0."""
    from portofolio_maximizer_spark.forecast import arima_hr_forecast
    from portofolio_maximizer_spark.forecast.models import _adf_tau, _fit_ar

    rng = np.random.default_rng(45)
    rw = np.cumsum(rng.normal(0, 1, 150))
    b1, _, _ = _fit_ar(rw, 1)
    assert abs(float(b1[1])) < 0.97  # the old rule would have chosen d=0
    sdf = spark.createDataFrame(
        [(1, t, float(rw[t])) for t in range(len(rw))],
        "user_id long, rn long, value double",
    )
    out = arima_hr_forecast(sdf).toPandas()
    assert out.d.iloc[0] == 1

    ar = np.zeros(3000)
    e = rng.normal(0, 1, 3000)
    for t in range(1, 3000):
        ar[t] = 0.95 * ar[t - 1] + e[t]
    assert _adf_tau(ar) < -2.86
    sdf2 = spark.createDataFrame(
        [(1, t, float(ar[t])) for t in range(len(ar))],
        "user_id long, rn long, value double",
    )
    out2 = arima_hr_forecast(sdf2).toPandas()
    assert out2.d.iloc[0] == 0


def test_platt_degenerate_fold_falls_back_to_identity(spark):
    """A single-class calibration fold (every prediction correct) must not
    explode the Platt fit — identity calibration (a=1, b=0) instead."""
    from portofolio_maximizer_spark.forecast.classifier import fit_platt

    scored = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.95, 1.0), (0.7, 1.0)], "conf double, correct double"
    )
    a, b = fit_platt(scored)
    assert (a, b) == (1.0, 0.0)


def test_sarimax_recovers_seasonal_period_and_beats_plain_arima(spark):
    """Synthetic seasonal series (period 12 + AR(1) noise): the ACF
    autodetect must recover s=12, select at least one seasonal term, beat
    the non-seasonal ARIMA's AIC on the same series, and forecast the
    seasonal pattern's continuation."""
    from portofolio_maximizer_spark.forecast import (
        arima_hr_forecast,
        sarimax_hr_forecast,
    )

    rng = np.random.default_rng(53)
    n, s_true = 600, 12
    # a RANDOM 12-point seasonal profile: unlike a sinusoid (which obeys
    # a 2-lag recurrence and is therefore representable by plain AR(2)),
    # an arbitrary profile needs genuine seasonal structure — seasonal
    # difference or lag-12 terms — to model
    profile = rng.normal(0.0, 2.0, s_true)
    season = profile[np.arange(n) % s_true]
    ar = np.zeros(n)
    e = rng.normal(0, 0.3, n)
    for t in range(1, n):
        ar[t] = 0.4 * ar[t - 1] + e[t]
    x = 10.0 + season + ar
    sdf = spark.createDataFrame(
        [(1, t, float(x[t])) for t in range(n)], "user_id long, rn long, value double"
    )
    out = sarimax_hr_forecast(sdf).toPandas().sort_values("horizon_step")
    assert len(out) == 5
    assert out.s.iloc[0] == s_true
    # seasonal structure selected: seasonal AR/MA terms or the seasonal
    # difference (the reference's every seasonal candidate carries D=1)
    assert out.sp.iloc[0] + out.sq.iloc[0] + out.sd.iloc[0] >= 1
    plain = arima_hr_forecast(sdf).toPandas()
    assert out.aic.iloc[0] < plain.aic.iloc[0]
    # forecasts continue the seasonal pattern: step-h ~ level + season(n+h)
    for _, r in out.iterrows():
        expect = 10.0 + profile[(n + int(r.horizon_step) - 1) % s_true]
        assert abs(r.yhat - expect) < 1.0, (r.horizon_step, r.yhat, expect)


def test_sarimax_seasonal_difference_selected_on_seasonal_random_walk(spark):
    """Planted seasonal random walk y_t = y_{t−12} + ε: only the D=1
    rung models it (every seasonal candidate carries one seasonal
    difference, reference sarimax.py:523); the winner must select sd=1
    and its forecast must continue each slot's own random-walk level."""
    from portofolio_maximizer_spark.forecast import sarimax_hr_forecast

    rng = np.random.default_rng(37)
    n, s_true = 600, 12
    x = np.zeros(n)
    x[:s_true] = rng.normal(10.0, 1.0, s_true)
    for t in range(s_true, n):
        x[t] = x[t - s_true] + rng.normal(0, 0.2)
    sdf = spark.createDataFrame(
        [(1, t, float(x[t])) for t in range(n)], "user_id long, rn long, value double"
    )
    out = sarimax_hr_forecast(sdf).toPandas().sort_values("horizon_step")
    assert out.s.iloc[0] == s_true
    assert out.sd.iloc[0] == 1
    for _, r in out.iterrows():
        expect = x[n + int(r.horizon_step) - 1 - s_true]
        assert abs(r.yhat - expect) < 1.0, (r.horizon_step, r.yhat, expect)


def test_sarimax_multiplicative_recovery_beats_additive():
    """Parameter recovery on a pure multiplicative SAR(1)(1)_12 synthetic
    y_t = φy_{t−1} + Φy_{t−12} − φΦy_{t−13} + e: the alternating-LS fit
    must recover (φ, Φ) and its AIC must beat the ADDITIVE fit (free
    lags 1, 12 — the engine's pre-round-6 form) on the same series,
    because only the multiplicative design carries the −φΦ cross term."""
    from portofolio_maximizer_spark.forecast.models import (
        _fit_ar,
        _fit_lagged_hr,
        _fit_sarma_mult,
    )

    rng = np.random.default_rng(71)
    n, s, phi_true, Phi_true = 900, 12, 0.5, 0.6
    y = np.zeros(n)
    e = rng.normal(0, 0.5, n)
    for t in range(s + 1, n):
        y[t] = (
            phi_true * y[t - 1]
            + Phi_true * y[t - s]
            - phi_true * Phi_true * y[t - s - 1]
            + e[t]
        )
    t0 = s + 2
    m_long = s + 4
    bl, _, _ = _fit_ar(y, m_long)
    e_long = np.zeros(n)
    Xl = np.column_stack(
        [np.ones(n - m_long)]
        + [y[m_long - k - 1 : n - k - 1] for k in range(m_long)]
    )
    e_long[m_long:] = y[m_long:] - Xl @ bl
    c0, phi, th, Phi, Th, _bx, sigma, aic_mult, _ef = _fit_sarma_mult(
        y, 1, 0, 1, 0, s, e_long, t0
    )
    assert abs(phi[0] - phi_true) < 0.08
    assert abs(Phi - Phi_true) < 0.08
    assert abs(sigma - 0.5) < 0.08
    # additive fit with free lags {1, s} on the same window
    _beta, _sg, aic_add, _e = _fit_lagged_hr(y, [1, s], [], e_long, t0)
    assert aic_mult < aic_add


def test_sarimax_exog_coefficient_recovered(spark):
    """y = 2·x_exog + AR(1) noise: the HR design's exog column must
    absorb the dependence — forecasts with the exog column present track
    the exog-driven level far better than without it."""
    from portofolio_maximizer_spark.forecast import sarimax_hr_forecast

    rng = np.random.default_rng(59)
    n = 400
    exog = np.where((np.arange(n) // 25) % 2 == 0, 1.0, -1.0)
    ar = np.zeros(n)
    e = rng.normal(0, 0.2, n)
    for t in range(1, n):
        ar[t] = 0.3 * ar[t - 1] + e[t]
    y = 2.0 * exog + ar
    sdf = spark.createDataFrame(
        [(1, t, float(y[t]), float(exog[t])) for t in range(n)],
        "user_id long, rn long, value double, x1 double",
    )
    with_ex = sarimax_hr_forecast(sdf, exog_cols=["x1"]).toPandas()
    no_ex = sarimax_hr_forecast(sdf.select("user_id", "rn", "value")).toPandas()
    # exog frozen at its last value (+1 block): step-1 forecast near 2.0
    step1 = with_ex[with_ex.horizon_step == 1].iloc[0]
    truth = 2.0 * exog[-1]
    assert abs(step1.yhat - truth) < 0.6
    err_with = abs(step1.yhat - truth)
    err_without = abs(no_ex[no_ex.horizon_step == 1].iloc[0].yhat - truth)
    assert err_with <= err_without + 1e-9


def test_garch_grid_prefers_t_on_fat_tails_and_recovers_nu(spark):
    """Simulated GARCH(1,1) with Student-t(5) innovations: the ladder must
    pick dist='t' with ν near 5, recover (α, β) approximately, and the
    same ladder must pick 'normal' on Gaussian innovations."""
    from portofolio_maximizer_spark.forecast import garch_grid_fit

    rng = np.random.default_rng(61)
    n, alpha, beta, omega = 3000, 0.10, 0.80, 0.05
    nu = 5.0
    # standardized t innovations (unit variance)
    z = rng.standard_t(nu, n) / np.sqrt(nu / (nu - 2.0))
    zg = rng.normal(0, 1, n)
    rows = []
    for uid, innov in ((1, z), (2, zg)):
        s2, r = omega / (1 - alpha - beta), np.zeros(n)
        for t in range(n):
            if t:
                s2 = omega + alpha * r[t - 1] ** 2 + beta * s2
            r[t] = np.sqrt(s2) * innov[t]
        rows += [(uid, t, float(r[t])) for t in range(n)]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")
    out = garch_grid_fit(sdf).toPandas().set_index("user_id")
    t_fit, g_fit = out.loc[1], out.loc[2]
    assert t_fit.dist == "t"
    assert 4.0 <= t_fit.nu <= 8.0  # true nu=5 within the ladder's resolution
    assert abs(t_fit.alpha1 + t_fit.alpha2 - alpha) < 0.06
    # persistence (α+β) is the robustly-identified quantity under QMLE;
    # tolerance sized to the ~0.05 sampling se on a 2000-point t(5) window
    assert abs(t_fit.persistence - (alpha + beta)) < 0.12
    assert g_fit.dist == "normal"
    assert g_fit.nu == 0.0
    assert t_fit.lam == 0.0 and g_fit.lam == 0.0
    for f in (t_fit, g_fit):
        assert f.persistence < 0.999
        assert f.sigma_next > 0


def test_garch_tail_clipping_guards_against_outliers(spark):
    """The reference's pre-fit overflow guard (garch.py:155-168): a
    single 50x price-error spike must not blow up the fitted volatility
    — the clip caps it at max(p99.5, 10*median), so sigma_next on the
    corrupted series stays within a small factor of the clean fit."""
    from portofolio_maximizer_spark.forecast import garch11_fit
    from portofolio_maximizer_spark.forecast.models import _clip_return_tails

    rng = np.random.default_rng(29)
    r = rng.normal(0, 0.01, 800)
    clipped = _clip_return_tails(np.append(r, 0.5))
    assert clipped[-1] < 0.5  # the spike is capped...
    assert clipped[-1] >= 10 * np.median(np.abs(r)) * 0.5  # ...not zeroed
    assert np.array_equal(_clip_return_tails(r)[:-1], r[:-1])  # tails only

    corrupted = r.copy()
    corrupted[400] = 0.5  # 50-sigma spike
    rows = [(1, t, float(v)) for t, v in enumerate(r)]
    rows += [(2, t, float(v)) for t, v in enumerate(corrupted)]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")
    out = garch11_fit(sdf).toPandas().set_index("user_id")
    assert out.loc[2, "sigma_next"] < 3.0 * out.loc[1, "sigma_next"]


def _hansen_skewt_sample(rng, nu, lam, n):
    """Sample Hansen (1994) skew-t via its two-piece construction: w =
    ±|standardized t_nu| with P(+) = (1+λ)/2, z = ((1 ± λ)w − a)/b."""
    v = np.abs(rng.standard_t(nu, n) / np.sqrt(nu / (nu - 2.0)))
    s = np.where(rng.uniform(0, 1, n) < (1 + lam) / 2.0, 1.0, -1.0)
    from math import lgamma, pi, sqrt

    c = np.exp(lgamma((nu + 1) / 2) - lgamma(nu / 2)) / sqrt(pi * (nu - 2))
    a = 4 * lam * c * (nu - 2) / (nu - 1)
    b = sqrt(1 + 3 * lam * lam - a * a)
    return ((1 + s * lam) * s * v - a) / b


def test_garch_grid_adf_differencing_and_vol_ladder(spark):
    """Reference garch.py:185-199 (ADF guard) + :643-738 (multi-step
    forecast): a random walk fed as 'returns' must trigger one
    difference (dd=1) while true returns stay undifferenced (dd=0), and
    the h-step vol ladder must follow sigma^2(h) = omega +
    pers*sigma^2(h-1), converging toward the unconditional vol."""
    from portofolio_maximizer_spark.forecast import garch_grid_fit

    rng = np.random.default_rng(19)
    rw = np.cumsum(rng.normal(0, 0.02, 1500)) + 5.0  # unit root
    ret = rng.normal(0, 0.02, 1500)  # stationary
    rows = [(1, t, float(v)) for t, v in enumerate(rw)]
    rows += [(2, t, float(v)) for t, v in enumerate(ret)]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")
    out = garch_grid_fit(sdf).toPandas().set_index("user_id")
    assert out.loc[1, "dd"] == 1
    assert out.loc[2, "dd"] == 0
    for uid in (1, 2):
        f = out.loc[uid]
        s2 = f.sigma_next**2
        for col in ("sigma_h2", "sigma_h3", "sigma_h4", "sigma_h5"):
            s2 = f.omega + f.persistence * s2
            assert abs(f[col] - np.sqrt(s2)) < 1e-5, (uid, col)
        if f.persistence < 1.0:
            uncond = f.omega / (1.0 - f.persistence)
            gaps = [abs(f[c] ** 2 - uncond) for c in
                    ("sigma_next", "sigma_h2", "sigma_h3", "sigma_h4", "sigma_h5")]
            assert gaps == sorted(gaps, reverse=True)  # monotone approach


def test_garch_grid_short_series_ewma_fallback(spark):
    """Reference insufficient-sample fallback (garch.py:212-222): keys
    with fewer than 40 innovations get the EWMA(0.94) vol rung — emitted
    as the IGARCH special case (omega=0, alpha=0.06, beta=0.94) so the
    same recursion/oracle replay applies — while long keys fit the full
    grid. Pinned against an independent numpy EWMA replay."""
    from portofolio_maximizer_spark.forecast import garch_grid_fit

    rng = np.random.default_rng(11)
    rows = [(1, t, float(v)) for t, v in enumerate(rng.normal(0, 0.02, 25))]
    rows += [(2, t, float(v)) for t, v in enumerate(rng.normal(0, 0.02, 300))]
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")
    out = garch_grid_fit(sdf).toPandas().set_index("user_id")
    short, full = out.loc[1], out.loc[2]
    assert short.dist == "ewma"
    assert (short.alpha1, short.beta1) == (0.06, 0.94)
    assert short.igarch_guard == 1 and short.persistence == 1.0
    assert full.dist in ("normal", "t", "skewt")
    # independent EWMA replay on the AR(1)-mean innovations
    r = np.array([v for _, _, v in rows[:25]])
    x0, x1 = r[1:], r[:-1]
    m = float(len(x0))
    den = float(np.sum(x1 * x1) - np.sum(x1) * np.sum(x1) / m)
    rho = float(np.sum(x0 * x1) - np.sum(x0) * np.sum(x1) / m) / den
    mu = float(np.mean(x0)) - rho * float(np.mean(x1))
    eps2 = (x0 - mu - rho * x1) ** 2
    s2 = float(eps2.mean())
    # replicate _garch_sigma2_path(t0=2): state held at var0 before t0
    path = [s2]
    for t in range(2, len(eps2) + 1):
        path.append(0.06 * eps2[t - 1] + 0.94 * path[-1])
    assert abs(short.sigma_next - np.sqrt(path[-1])) < 1e-6
    """Reference mean='AR' (garch.py:373): r_t = mu + rho*r_{t-1} + eps
    with GARCH(1,1) innovations — the closed-form mean stage must
    recover (mu, rho) and the variance fit then runs on the innovations
    (persistence recovered too, not polluted by the AR mean)."""
    from portofolio_maximizer_spark.forecast import garch_grid_fit

    rng = np.random.default_rng(47)
    n, alpha, beta, omega = 3000, 0.10, 0.80, 0.05
    mu_true, rho_true = 0.5, 0.3
    z = rng.normal(0, 1, n)
    s2, eps, r = omega / (1 - alpha - beta), np.zeros(n), np.zeros(n)
    for t in range(n):
        if t:
            s2 = omega + alpha * eps[t - 1] ** 2 + beta * s2
        eps[t] = np.sqrt(s2) * z[t]
        r[t] = mu_true + rho_true * (r[t - 1] if t else 0.0) + eps[t]
    sdf = spark.createDataFrame(
        [(1, t, float(r[t])) for t in range(n)], "user_id long, rn long, lr double"
    )
    fit = garch_grid_fit(sdf).toPandas().iloc[0]
    assert abs(fit.rho - rho_true) < 0.06
    assert abs(fit.mu - mu_true) < 0.1
    assert abs(fit.persistence - (alpha + beta)) < 0.12


def test_garch_grid_prefers_skewt_on_skewed_tails_and_recovers_params(spark):
    """Simulated GARCH(1,1) with Hansen skew-t(ν=6, λ=−0.3) innovations:
    the full ladder must pick dist='skewt' with λ on the negative side
    and ν in range, and the per-rung log-likelihoods must order
    skewt > t > normal on the fitted path (the AIC ladder's premise)."""
    from portofolio_maximizer_spark.forecast import garch_grid_fit
    from portofolio_maximizer_spark.forecast.models import (
        _garch_sigma2_path,
        _hansen_skewt_loglik,
        _student_t_loglik,
    )

    rng = np.random.default_rng(83)
    n, alpha, beta, omega = 3000, 0.10, 0.80, 0.05
    nu, lam = 6.0, -0.3
    z = _hansen_skewt_sample(rng, nu, lam, n)
    # the construction must deliver a unit-variance, left-skewed sample
    assert abs(np.var(z) - 1.0) < 0.1
    assert np.mean(z**3) < -0.2
    s2, r = omega / (1 - alpha - beta), np.zeros(n)
    for t in range(n):
        if t:
            s2 = omega + alpha * r[t - 1] ** 2 + beta * s2
        r[t] = np.sqrt(s2) * z[t]
    sdf = spark.createDataFrame(
        [(1, t, float(r[t])) for t in range(n)],
        "user_id long, rn long, lr double",
    )
    fit = garch_grid_fit(sdf).toPandas().iloc[0]
    assert fit.dist == "skewt"
    assert fit.lam < 0.0  # skew direction recovered
    assert 4.0 <= fit.nu <= 10.0
    assert abs(fit.persistence - (alpha + beta)) < 0.12
    # rung ordering on the same fitted sigma^2 path (independent replay)
    rr = r[-2000:] - r[-2000:].mean()
    r2 = rr * rr
    var0 = float(r2.mean())
    al = np.array([fit.alpha1] + ([fit.alpha2] if fit.p == 2 else []))
    be = np.array([fit.beta1] + ([fit.beta2] if fit.q == 2 else []))
    path = _garch_sigma2_path(r2, var0, fit.omega, al, be, 2)[:-1]
    ll_st = _hansen_skewt_loglik(rr[2:], path, float(fit.nu), float(fit.lam))
    ll_t = max(_student_t_loglik(r2[2:], path, v) for v in (4.0, 6.0, 8.0, 10.0))
    ll_n = float(
        -0.5 * np.sum(np.log(2 * np.pi) + np.log(path) + r2[2:] / path)
    )
    assert ll_st > ll_t > ll_n
    # AIC ladder: the winner's reported AIC beats the t rung's even after
    # the extra-lambda charge
    k = fit.p + fit.q + 1
    assert fit.aic <= 2 * (k + 1) - 2 * ll_t + 1e-6


def test_arima_warmstart_prunes_and_agrees(spark, sf_dir):
    """OrderLearner wiring: cache hits fit exactly one candidate; cache
    misses run the full 8-candidate grid; where the cached order equals
    the full grid's choice the forecasts are bit-identical (same kernel,
    same conditioning window)."""
    from portofolio_maximizer_spark.plans import QUERIES

    warm = QUERIES["arima_warmstart_forecast"](spark, sf_dir).toPandas()
    full = QUERIES["arima_hr_forecast"](spark, sf_dir).toPandas()
    assert warm.warm_hit.any(), "no cache hits at all"
    assert (warm[warm.warm_hit].n_candidates == 1).all()
    assert (warm[~warm.warm_hit].n_candidates == 8).all()
    w1 = warm[warm.horizon_step == 1].set_index("user_id")
    f1 = full[full.horizon_step == 1].set_index("user_id")
    same_order = [
        uid
        for uid in w1.index
        if uid in f1.index
        and (w1.loc[uid, "p"], w1.loc[uid, "q"])
        == (f1.loc[uid, "p"], f1.loc[uid, "q"])
    ]
    assert same_order, "cache never matched the full-grid order"
    for uid in same_order:
        assert abs(w1.loc[uid, "yhat"] - f1.loc[uid, "yhat"]) < 1e-9
