"""Adversarial forecaster suite (pack 12, R135-R137) and the
directional-label bootstrap (R138/R139).

Generator properties pin the planted regime structure the scenarios exist
to stress; the run-row replica re-derives one matrix cell end-to-end in
independent numpy/pandas against the Spark query output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from portofolio_maximizer_spark.forecast.adversarial import (
    HORIZON,
    N_POINTS,
    SCENARIOS,
    SEEDS,
    TRAIN_N,
    gen_scenario,
)
from portofolio_maximizer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_generator_deterministic():
    for kind in SCENARIOS:
        a = gen_scenario(kind, N_POINTS, 101)
        b = gen_scenario(kind, N_POINTS, 101)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (N_POINTS,)
        assert np.isfinite(a).all()


def test_fat_tail_crash_has_crash_window():
    # the planted 3-day crash (reference :196-202) must dominate every
    # other 3-day move in the path
    for seed in SEEDS:
        y = gen_scenario("fat_tail_crash", N_POINTS, seed)
        lr = np.diff(np.log(y))
        roll3 = np.convolve(lr, np.ones(3), mode="valid")
        start = N_POINTS // 3
        # crash magnitude is 3 * chosen shift in {-.36,-.30,-.24} plus noise
        assert roll3.min() < -0.20
        assert abs(int(np.argmin(roll3)) - (start - 1)) <= 1


def test_crisis_recovery_recovers():
    # phase-2 drift (+0.8%/day over ~213 bars) must end far above the
    # phase-1 trough region for every seed (reference :204-218)
    for seed in SEEDS:
        y = gen_scenario("crisis_recovery", N_POINTS, seed)
        third = N_POINTS // 3
        assert y[-1] > y[third - 1] * 1.5
        assert (y >= 1.0).all()


def test_staged_forecasts_match_kernels_run_directly(spark):
    """Round-7 pin: the staged adversarial forecasts ARE the real kernels'
    output — re-run `arima_hr_forecast` / `samossa_forecast` directly on
    one cell's series and replay the GARCH price-path recipe from
    `garch_grid_fit` parameters; every staged value must match."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark.forecast.adversarial import (
        kernel_forecast_table,
    )
    from portofolio_maximizer_spark.forecast.models import (
        arima_hr_forecast,
        garch_grid_fit,
        samossa_forecast,
    )
    from portofolio_maximizer_spark.plans.queries import stage_cached

    kind, seed = "random_walk", 202
    staged = {
        r["h"]: r
        for r in stage_cached(
            spark, SF, "adversarial_forecasts",
            lambda: kernel_forecast_table(spark),
        )
        .filter((F.col("scenario") == kind) & (F.col("seed") == seed))
        .collect()
    }
    assert len(staged) == HORIZON

    y = gen_scenario(kind, N_POINTS, seed)
    tr = spark.createDataFrame(
        [(7, int(t), float(v)) for t, v in enumerate(y[:TRAIN_N])],
        "user_id long, rn int, value double",
    )
    sar = {
        r["horizon_step"]: r
        for r in arima_hr_forecast(tr, horizon=HORIZON).collect()
    }
    ssa = {
        r["horizon_step"]: r
        for r in samossa_forecast(tr, horizon=HORIZON).collect()
    }
    for h in range(1, HORIZON + 1):
        assert staged[h]["p_sarimax"] == pytest.approx(
            sar[h]["yhat"], abs=1e-9
        )
        assert staged[h]["lo_sarimax"] == pytest.approx(
            sar[h]["lo"], abs=1e-9
        )
        assert staged[h]["hi_sarimax"] == pytest.approx(
            sar[h]["hi"], abs=1e-9
        )
        assert staged[h]["p_samossa"] == pytest.approx(
            ssa[h]["yhat"], abs=1e-9
        )
        band = 1.96 * ssa[h]["sigma"] * np.sqrt(h)
        assert staged[h]["lo_samossa"] == pytest.approx(
            ssa[h]["yhat"] - band, abs=1e-6
        )

    # GARCH: the R38 price-path recipe from the grid-fit parameters
    wo = Window.partitionBy("user_id").orderBy("rn")
    ret = tr.select(
        "user_id", "rn",
        (F.col("value") / F.lag("value").over(wo) - 1.0).alias("lr"),
    ).filter(F.col("lr").isNotNull())
    g = garch_grid_fit(ret, round_out=False).collect()[0]
    r = pd.Series(y[:TRAIN_N]).pct_change().dropna().to_numpy()
    # fit-scale seed: the kernel's 99.5-pct/10-median tail clip first
    ar = np.abs(r)
    cap = max(
        float(np.percentile(ar, 99.5)), 10.0 * float(np.median(ar))
    )
    rc = np.clip(r, -cap, cap)
    x_last = float(rc[-1]) if g["dd"] == 0 else float(rc[-1] - rc[-2])
    s2 = g["sigma_next"] ** 2
    cur, xh = float(y[TRAIN_N - 1]), x_last
    for h in range(1, HORIZON + 1):
        xh = g["mu"] + g["rho"] * xh
        cur *= 1.0 + xh
        sig = np.sqrt(s2)
        assert staged[h]["p_garch"] == pytest.approx(cur, rel=1e-9)
        assert staged[h]["lo_garch"] == pytest.approx(
            max(cur * (1 - 1.96 * sig), 0.0), rel=1e-9
        )
        assert staged[h]["hi_garch"] == pytest.approx(
            cur * (1 + 1.96 * sig), rel=1e-9
        )
        s2 = g["omega"] + g["persistence"] * s2


def test_run_row_numpy_replica(spark):
    # one cell's metric algebra re-derived outside Spark/DuckDB from the
    # staged kernel forecasts + the regenerated series
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark.forecast.adversarial import (
        kernel_forecast_table,
    )
    from portofolio_maximizer_spark.plans.queries import stage_cached

    kind, seed = "random_walk", 202
    y = gen_scenario(kind, N_POINTS, seed)
    train, test = y[:TRAIN_N], y[TRAIN_N:]
    fcr = (
        stage_cached(
            spark, SF, "adversarial_forecasts",
            lambda: kernel_forecast_table(spark),
        )
        .filter((F.col("scenario") == kind) & (F.col("seed") == seed))
        .orderBy("h")
        .collect()
    )
    p_sar = np.array([r["p_sarimax"] for r in fcr])
    p_gar = np.array([r["p_garch"] for r in fcr])
    p_ssa = np.array([r["p_samossa"] for r in fcr])
    p_ens = (p_sar + p_gar + p_ssa) / 3.0
    lo = (
        np.array([r["lo_sarimax"] for r in fcr])
        + np.array([r["lo_garch"] for r in fcr])
        + np.array([r["lo_samossa"] for r in fcr])
    ) / 3.0
    hi = (
        np.array([r["hi_sarimax"] for r in fcr])
        + np.array([r["hi_garch"] for r in fcr])
        + np.array([r["hi_samossa"] for r in fcr])
    ) / 3.0

    def rmse(p):
        return float(np.sqrt(np.mean((test - p) ** 2)))

    row = next(
        r
        for r in QUERIES["adversarial_scenario_matrix"](spark, SF).collect()
        if r["scenario"] == kind and r["seed"] == seed
    )
    assert row["rmse_sarimax"] == pytest.approx(rmse(p_sar), abs=2e-6)
    assert row["rmse_garch"] == pytest.approx(rmse(p_gar), abs=2e-6)
    assert row["rmse_samossa"] == pytest.approx(rmse(p_ssa), abs=2e-6)
    assert row["rmse_ens"] == pytest.approx(rmse(p_ens), abs=2e-6)
    assert row["rmse_rw"] == pytest.approx(
        rmse(np.full(HORIZON, train[-1])), abs=2e-6
    )
    best = min(rmse(p_sar), rmse(p_gar), rmse(p_ssa))
    assert row["ratio_vs_best"] == pytest.approx(rmse(p_ens) / best, abs=2e-6)

    entry, exit_ = train[-1], test[-1]
    aret = (exit_ - entry) / entry
    direction = np.sign(p_ens[-1] - p_ens[0])
    a_dir = np.sign(test[-1] - test[0])
    tda = 0.0 if (direction == 0 or a_dir == 0) else float(direction == a_dir)
    assert row["terminal_da"] == pytest.approx(tda)
    assert row["trade_return"] == pytest.approx(direction * aret, abs=2e-6)
    assert row["ci_coverage"] == pytest.approx(
        float(lo[-1] <= test[-1] <= hi[-1])
    )
    rets = pd.Series(test).pct_change().dropna()
    cum = (1.0 + rets).cumprod()
    dd = (cum - cum.cummax()) / cum.cummax()
    assert row["max_drawdown"] == pytest.approx(abs(dd.min()), abs=2e-6)


def test_summary_and_gate_consistency(spark):
    matrix = QUERIES["adversarial_scenario_matrix"](spark, SF).collect()
    summary = {
        r["scope"]: r
        for r in QUERIES["adversarial_suite_summary"](spark, SF).collect()
    }
    overall = summary["overall"]
    assert overall["runs"] == len(matrix)
    assert overall["under_best_n"] == sum(r["under_best"] for r in matrix)
    assert overall["worse_rw_n"] == sum(r["worse_than_rw"] for r in matrix)
    # scenario rows partition the matrix
    assert sum(v["runs"] for k, v in summary.items() if k != "overall") == len(
        matrix
    )

    gate = QUERIES["adversarial_barbell_gate"](spark, SF).collect()[0]
    trs = [r["trade_return"] for r in matrix]
    tau = 1.31 ** (1.0 / 252.0) - 1.0
    gain = sum(max(t - tau, 0.0) for t in trs)
    loss = sum(max(tau - t, 0.0) for t in trs)
    assert gate["n_trades"] == len(trs)
    if loss > 0:
        assert gate["omega_ratio"] == pytest.approx(gain / loss, abs=2e-5)
        assert gate["omega_above_1"] == (gain / loss > 1.0)
    wins = [t for t in trs if t > 0]
    assert gate["win_rate"] == pytest.approx(len(wins) / len(trs), abs=1e-6)
    assert gate["barbell_status"] in ("PASS", "FAIL")
    assert gate["gate_tda"] == (gate["tda_pass_rate"] >= 0.45)


# ---------------------------------------------------------------------------
# Directional label bootstrap (R138/R139) — pandas replica of one key
# ---------------------------------------------------------------------------


def test_directional_labels_pandas_replica(spark, duck):
    import math

    rows = QUERIES["directional_training_labels"](spark, SF).collect()
    assert rows, "labels frame is empty"
    key = rows[0]["user_id"]
    ser = duck.execute(
        "SELECT value FROM events WHERE value > 0 AND user_id = ? "
        "ORDER BY ts, event_id",
        [key],
    ).fetchdf()["value"].astype(float)
    n = len(ser)
    eff = min(30, n - 11)
    got = {r["bar"]: r for r in rows if r["user_id"] == key}
    expect_bars = list(range(eff, n - 10, 5))
    assert sorted(got) == expect_bars
    for bar in expect_bars:
        r = got[bar]
        cur, fwd = ser.iloc[bar], ser.iloc[bar + 10]
        assert r["y_directional"] == (1 if fwd > cur else 0)
        assert r["action"] == ("BUY" if fwd > cur else "SELL")
        win = ser.iloc[max(0, bar - eff): bar + 1]
        rets = win.pct_change().dropna()
        assert r["recent_return_5d"] == pytest.approx(
            cur / ser.iloc[bar - 5] - 1.0, abs=2e-6
        )
        assert r["realized_vol_annualized"] == pytest.approx(
            rets.std() * math.sqrt(252.0), abs=2e-6
        )
        vol5 = rets.iloc[-5:].std()
        assert r["recent_vol_ratio"] == pytest.approx(
            vol5 / rets.std(), abs=2e-6
        )
        x = np.arange(len(win), dtype=float)
        ts_r2 = float(np.corrcoef(x, win.values)[0, 1] ** 2)
        assert r["trend_strength"] == pytest.approx(ts_r2, abs=2e-6)
        onehots = [
            r["regime_liquid_rangebound"],
            r["regime_moderate_trending"],
            r["regime_high_vol_trending"],
            r["regime_crisis"],
        ]
        assert sum(onehots) == 1.0
        assert r["hurst_exponent"] is None and r["snr"] is None

    summ = QUERIES["directional_labels_summary"](spark, SF).collect()[0]
    assert summ["n_labeled"] == len(rows)
    assert summ["n_positive"] == sum(r["y_directional"] for r in rows)
    assert summ["cold_start"] == (
        summ["n_labeled"] < 60
        or summ["n_positive"] < 10
        or summ["n_negative"] < 10
    )


# ---------------------------------------------------------------------------
# Signal-validation backfill (R140/R141)
# ---------------------------------------------------------------------------


def test_backfill_transition_consistency(spark):
    val = {
        r["user_id"]: r
        for r in QUERIES["llm_signal_validation"](spark, SF).collect()
    }
    back = QUERIES["signal_validation_backfill"](spark, SF).collect()
    assert len(back) >= len(val)  # archived keys extend the frame
    for r in back:
        assert r["prior_status"] == "pending"
        v = val.get(r["user_id"])
        if v is None:
            assert r["new_status"] == "archived"
            assert r["recommendation"] is None
            assert r["validator_version"] is None
        else:
            expect = "validated" if v["is_valid"] == 1 else "failed"
            assert r["new_status"] == expect
            assert r["recommendation"] == v["recommendation"]
            assert r["validator_version"] == "v2-backfill"

    cen = QUERIES["signal_backfill_census"](spark, SF).collect()[0]
    assert cen["processed"] == len(back)
    assert cen["validated"] == sum(
        1 for r in back if r["new_status"] == "validated"
    )
    assert cen["validated"] + cen["failed"] + cen["archived"] == cen[
        "processed"
    ]
    assert cen["errors"] == 0


# ---------------------------------------------------------------------------
# Regime first-hit scan (R142/R143) — pandas replica of one key
# ---------------------------------------------------------------------------


def test_regime_scan_pandas_replica(spark, duck):
    from portofolio_maximizer_spark.plans.queries_stats import (
        _RFH_MIN_LEN,
        _RFH_TR_STRONG,
        _RFH_TR_WEAK,
        _RFH_VOL_CRISIS,
        _RFH_VOL_HIGH,
        _RFH_VOL_LOW,
        _RFH_W,
    )

    hits = QUERIES["regime_first_hit_scan"](spark, SF).collect()
    assert hits
    key = hits[0]["user_id"]
    ser = duck.execute(
        "SELECT ts, value FROM (SELECT ts, value, ROW_NUMBER() OVER "
        "(PARTITION BY ts ORDER BY event_id DESC) rk FROM events "
        "WHERE value > 0 AND user_id = ?) WHERE rk = 1 ORDER BY ts",
        [key],
    ).fetchdf()
    vals = ser["value"].astype(float).reset_index(drop=True)
    rets = vals.pct_change()
    first = {}
    for bar in range(_RFH_MIN_LEN, len(vals)):
        if bar < _RFH_W or bar + 1 < _RFH_W + 5:
            continue
        r = rets.iloc[bar - _RFH_W + 1: bar + 1]
        if r.notna().sum() != _RFH_W:
            continue
        vol = float(r.std())
        win = vals.iloc[bar - _RFH_W + 1: bar + 1]
        if win.std(ddof=0) < 1e-10:
            trend = 0.0
        else:
            x = np.arange(len(win), dtype=float)
            trend = float(np.corrcoef(x, win.values)[0, 1] ** 2)
        if vol > _RFH_VOL_CRISIS:
            reg = "CRISIS"
        elif vol > _RFH_VOL_HIGH and trend > _RFH_TR_WEAK:
            reg = "HIGH_VOL_TRENDING"
        elif vol > _RFH_VOL_LOW and trend > _RFH_TR_STRONG:
            reg = "HIGH_VOL_TRENDING"
        elif vol < _RFH_VOL_LOW and trend < _RFH_TR_WEAK:
            reg = "RANGEBOUND"
        elif trend > _RFH_TR_WEAK:
            reg = "MODERATE_TRENDING"
        else:
            reg = "MODERATE_MIXED"
        if reg not in first:
            first[reg] = (bar, vol, trend)

    got = {r["regime"]: r for r in hits if r["user_id"] == key}
    assert sorted(got) == sorted(first)
    for reg, (bar, vol, trend) in first.items():
        assert got[reg]["first_bar"] == bar
        assert got[reg]["realized_volatility"] == pytest.approx(vol, abs=2e-6)
        assert got[reg]["trend_strength"] == pytest.approx(trend, abs=2e-6)

    summ = {
        r["user_id"]: r
        for r in QUERIES["fresh_data_validation_summary"](spark, SF).collect()
    }
    s = summ[key]
    assert s["n_rows"] == len(vals)
    assert s["n_regimes_seen"] == len(first)
    assert s["latest_regime"] in (
        "CRISIS", "HIGH_VOL_TRENDING", "MODERATE_TRENDING",
        "MODERATE_MIXED", "RANGEBOUND",
    )


# ---------------------------------------------------------------------------
# TA feature factory (R144/R145) — replica against REAL pandas semantics
# ---------------------------------------------------------------------------


def test_ta_features_match_pandas(spark, duck):
    rows = QUERIES["ta_feature_frame"](spark, SF).collect()
    key = rows[0]["user_id"]
    got = {r["bar"]: r for r in rows if r["user_id"] == key}
    close = duck.execute(
        "SELECT value FROM events WHERE value > 0 AND user_id = ? "
        "ORDER BY ts, event_id",
        [key],
    ).fetchdf()["value"].astype(float).reset_index(drop=True)
    rets = close.pct_change()
    exp = pd.DataFrame(
        {
            "sma_5": close.rolling(5, min_periods=2).mean(),
            "sma_20": close.rolling(20, min_periods=10).mean(),
            "vol_10": rets.rolling(10, min_periods=5).std(),
            "return_fwd_1": close.pct_change(1).shift(-1),
            "return_fwd_5": close.pct_change(5).shift(-5),
        }
    )
    delta = close.diff()
    gain = delta.clip(lower=0).rolling(14, min_periods=7).mean()
    loss = (-delta.clip(upper=0)).rolling(14, min_periods=7).mean()
    rs = gain / loss.replace(0, np.nan)
    exp["rsi_14"] = 100 - 100 / (1 + rs)
    ema_fast = close.ewm(span=12, adjust=False).mean()
    ema_slow = close.ewm(span=26, adjust=False).mean()
    macd = ema_fast - ema_slow
    exp["macd"] = macd
    exp["macd_signal"] = macd.ewm(span=9, adjust=False).mean()
    exp["macd_hist"] = exp["macd"] - exp["macd_signal"]
    ma20 = close.rolling(20, min_periods=10).mean()
    sd20 = close.rolling(20, min_periods=10).std()
    exp["boll_mid"] = ma20
    exp["boll_upper"] = ma20 + 2.0 * sd20
    exp["boll_lower"] = ma20 - 2.0 * sd20
    exp["zscore_20"] = (close - ma20) / sd20

    assert sorted(got) == list(range(len(close)))
    for bar in range(len(close)):
        r = got[bar]
        for col in exp.columns:
            want = exp[col].iloc[bar]
            have = r[col]
            if pd.isna(want):
                assert have is None, (col, bar, have)
            else:
                assert have == pytest.approx(float(want), abs=3e-6), (
                    col, bar, have, float(want),
                )

    cal = {
        r["user_id"]: r
        for r in QUERIES["series_calibration_stats"](spark, SF).collect()
    }
    c = cal[key]
    lr = np.log(close).diff().dropna()
    assert c["observations"] == len(rets.dropna())
    assert c["mean_return"] == pytest.approx(rets.mean(), abs=2e-6)
    assert c["volatility"] == pytest.approx(rets.std(), abs=2e-6)
    assert c["log_return_mean"] == pytest.approx(lr.mean(), abs=2e-6)
    assert c["log_return_variance"] == pytest.approx(lr.var(), abs=2e-6)


# ---------------------------------------------------------------------------
# Rolling CV aggregate (R146) — pandas replica of one key's drift arm
# ---------------------------------------------------------------------------


def test_rolling_cv_pandas_replica(spark, duck):
    """R146 metric-bundle replica over the STAGED kernel forecasts, plus
    a direct-kernel pin: one fold's staged sarimax path must equal
    `_arima_rows` run on the fold's train slice, the garch path the
    `garch_mean_path` recipe, the samossa path `samossa_path` — the real
    kernels, refit per fold."""
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark.forecast.models import (
        _ARIMA_PQ_GRID,
        _arima_rows,
        samossa_path,
    )
    from portofolio_maximizer_spark.forecast.rollingcv import (
        garch_mean_path,
        rolling_cv_forecast_table,
    )
    from portofolio_maximizer_spark.plans.queries import stage_cached
    from portofolio_maximizer_spark.plans.queries_stats import _series

    rows = QUERIES["rolling_cv_aggregate"](spark, SF).collect()
    key = rows[0]["user_id"]
    close = duck.execute(
        "SELECT value FROM events WHERE value > 0 AND user_id = ? "
        "ORDER BY ts, event_id",
        [key],
    ).fetchdf()["value"].astype(float).reset_index(drop=True)
    n = len(close)
    MIN_T, H = 40, 5
    staged = (
        stage_cached(
            spark, SF, "rolling_cv_forecasts",
            lambda: rolling_cv_forecast_table(
                _series(spark, SF).select(
                    "user_id", (F.col("rn") - 1).alias("rn"), "value"
                ),
                min_train=MIN_T,
                horizon=H,
            ),
        )
        .filter(F.col("user_id") == key)
        .collect()
    )
    fc = {(r["fold_id"], r["h"]): r for r in staged}

    # direct-kernel pin on fold 0
    tr = close.iloc[:MIN_T].values
    ar = _arima_rows(int(key), tr, list(_ARIMA_PQ_GRID), H)
    sp = samossa_path(tr, 12, 0.9, H)
    gp = garch_mean_path(tr, H)
    assert ar and sp is not None and gp is not None
    lo_b, hi_b = tr[-1] / 1e3, tr[-1] * 1e3
    for h in range(1, H + 1):
        r = fc[(0, h)]
        assert r["p_sarimax"] == pytest.approx(
            min(max(ar[h - 1][6], lo_b), hi_b), abs=1e-9
        )
        assert r["p_garch"] == pytest.approx(
            min(max(float(gp[h - 1]), lo_b), hi_b), rel=1e-12
        )
        assert r["p_samossa"] == pytest.approx(
            min(max(round(float(sp[1][h - 1] + sp[2][h - 1]), 6), lo_b), hi_b),
            abs=1e-9,
        )

    # metric-bundle replica over every complete fold with staged preds
    per_model = {"sarimax": [], "garch": [], "samossa": [], "ensemble": []}
    folds = []
    f, fold_id = MIN_T, 0
    while f + H <= n:
        test = close.iloc[f : f + H].values
        if (fold_id, 1) in fc:
            preds = {
                m: np.array([fc[(fold_id, h)]["p_" + m] for h in range(1, H + 1)])
                for m in ("sarimax", "garch", "samossa")
            }
            preds["ensemble"] = (
                preds["sarimax"] + preds["garch"] + preds["samossa"]
            ) / 3.0
            folds.append(fold_id)
            for m, p in preds.items():
                resid = p - test
                den = np.maximum(np.abs(test) + np.abs(p), 1e-9)
                da = np.mean(np.sign(np.diff(test)) == np.sign(np.diff(p)))
                pdir, adir = np.sign(p[-1] - p[0]), np.sign(test[-1] - test[0])
                tda = 0.0 if (pdir == 0 or adir == 0) else float(pdir == adir)
                per_model[m].append(
                    (
                        np.sqrt(np.mean(resid**2)),
                        2.0 * np.mean(np.abs(resid) / den),
                        np.std(resid),
                        da,
                        tda,
                    )
                )
        f += H
        fold_id += 1
    got = {(r["user_id"], r["model"]): r for r in rows}
    for m, vals in per_model.items():
        r = got[(key, m)]
        arr = np.array(vals)
        assert r["fold_count"] == len(folds)
        assert r["mean_rmse"] == pytest.approx(arr[:, 0].mean(), abs=2e-6)
        assert r["mean_smape"] == pytest.approx(arr[:, 1].mean(), abs=2e-6)
        assert r["mean_tracking_error"] == pytest.approx(
            arr[:, 2].mean(), abs=2e-6
        )
        assert r["mean_directional_accuracy"] == pytest.approx(
            arr[:, 3].mean(), abs=2e-6
        )
        assert r["mean_terminal_da"] == pytest.approx(
            arr[:, 4].mean(), abs=2e-6
        )


# ---------------------------------------------------------------------------
# LLM system health fold (R147)
# ---------------------------------------------------------------------------


def test_llm_system_health_fold(spark):
    rows = {
        r["component"]: r
        for r in QUERIES["llm_system_health_report"](spark, SF).collect()
    }
    assert set(rows) == {
        "llm_performance", "signal_quality", "signal_backtests",
        "database_integration", "ollama_client", "overall",
    }
    # the default-DISABLED ollama client is always an issue (reference
    # _assess_system_health treats anything outside HEALTHY/NO_DATA as one)
    assert rows["ollama_client"]["status"] == "DISABLED"
    assert rows["ollama_client"]["issue"] is True
    assert rows["overall"]["status"] == "DEGRADED"
    n_issues = sum(
        1 for c, r in rows.items() if c != "overall" and r["issue"]
    )
    assert f"issues={n_issues}" in rows["overall"]["detail"]
    assert rows["database_integration"]["status"] == "HEALTHY"


# ---------------------------------------------------------------------------
# Token-budget epoch plan (L36) — allocation invariants
# ---------------------------------------------------------------------------


def test_token_budget_epoch_plan_invariants(spark):
    rows = QUERIES["token_budget_epoch_plan"](spark, SF).collect()
    assert rows
    emax = 4.0
    total_alloc = sum(r["allocated_tokens"] for r in rows)
    budget = rows[0]["budget_unallocated"] + total_alloc
    for r in rows:
        # the epoch cap is a hard invariant
        assert r["epochs_final"] <= emax + 1e-6
        assert r["allocated_tokens"] <= emax * r["available_tokens"] + 1e-3
        if r["capped"]:
            assert r["epochs_raw"] > emax
            # capped domains sit exactly at the cap
            assert r["epochs_final"] == pytest.approx(emax, abs=1e-6)
        else:
            assert r["epochs_raw"] <= emax
            # redistribution only raises, never lowers
            assert r["allocated_tokens"] >= r["desired_tokens"] - 1e-3
    # shares sum to 1, budget never over-allocated
    assert sum(r["final_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert rows[0]["budget_unallocated"] >= -1e-6
    assert total_alloc <= budget + 1e-3
    # both branches exercised at this SF
    assert any(r["capped"] for r in rows)
    assert any(not r["capped"] for r in rows)


# ---------------------------------------------------------------------------
# Trading-objective report (R148) — scipy-free Wilson/binomial replica
# ---------------------------------------------------------------------------


def test_trading_objective_replica(spark):
    import math

    rt = QUERIES["round_trips"](spark, SF).collect()
    pnls = [r["gross_pnl"] for r in rt if r["gross_pnl"] is not None]
    total, wins = len(pnls), sum(1 for p in pnls if p > 0)
    z = 1.96
    p_hat = min(1.0, max(0.0, wins / total))
    denom = 1.0 + z * z / total
    centre = p_hat + z * z / (2 * total)
    var = p_hat * (1 - p_hat) / total + z * z / (4 * total * total)
    wilson = max(0.0, min(1.0, (centre - z * math.sqrt(var)) / denom))
    err_up = max(0.0, 1.0 - wilson)
    zscore = (wins - 0.5 * total) / math.sqrt(0.25 * total)
    pval = min(1.0, max(0.0, math.erfc(abs(zscore) / math.sqrt(2.0))))

    r = QUERIES["trading_objective_report"](spark, SF).collect()[0]
    assert r["sample_size"] == total and r["wins"] == wins
    assert r["wilson_win_rate_lower"] == pytest.approx(wilson, abs=2e-6)
    assert r["conservative_error_rate_upper"] == pytest.approx(
        err_up, abs=2e-6
    )
    assert r["z_score"] == pytest.approx(zscore, abs=2e-6)
    # A&S 7.1.26 erfc approximation fed the 6dp-rounded z-squared: the
    # input rounding alone moves p by ~2e-6 near z=0
    assert r["p_value"] == pytest.approx(pval, abs=1e-5)
    assert r["objective_value"] == pytest.approx(
        err_up - 0.42, abs=2e-6
    )
    suff = total >= 40
    signif = suff and pval <= 0.05
    passes = signif and wilson >= 0.55 and err_up <= 0.42
    expect = "PASS" if passes else ("LIMITED" if suff else "FAIL")
    assert r["status"] == expect
    assert r["lim_wilson"] == (wilson < 0.55)


# ---------------------------------------------------------------------------
# Centroid silhouette (L37) — bounds and consistency
# ---------------------------------------------------------------------------


def test_cluster_silhouette_invariants(spark):
    rows = QUERIES["cluster_silhouette_report"](spark, SF).collect()
    per = [r for r in rows if r["scope"] != "overall"]
    overall = next(r for r in rows if r["scope"] == "overall")
    assert per and overall["n_vectors"] == sum(r["n_vectors"] for r in per)
    for r in rows:
        # silhouette is bounded in [-1, 1]
        assert -1.0 - 1e-9 <= r["min_silhouette"] <= r["max_silhouette"] <= 1.0 + 1e-9
        assert r["min_silhouette"] <= r["mean_silhouette"] <= r["max_silhouette"]
        assert 0.0 <= r["misassigned_share"] <= 1.0
        assert r["mean_intra_dist"] >= 0.0
        # assignment picks the NEAREST centroid, so s < 0 is impossible
        # under exact re-derivation — misassignment share must be zero
        assert r["misassigned_share"] == 0.0
        assert r["min_silhouette"] >= 0.0


# ---------------------------------------------------------------------------
# Run execution summary (R149) — cross-grain consistency
# ---------------------------------------------------------------------------


def test_run_execution_summary_consistency(spark):
    rows = QUERIES["run_execution_summary"](spark, SF).collect()
    kinds = {}
    for r in rows:
        kinds.setdefault(r["kind"], []).append(r)
    assert len(kinds["run"]) == 1
    run = kinds["run"][0]
    statuses = {r["label"]: r for r in kinds.get("status", [])}
    n_status = sum(r["n"] for r in statuses.values())
    assert n_status == run["n"] <= 200
    if "EXECUTED" in statuses:
        assert statuses["EXECUTED"]["avg_confidence"] is not None
    if "REJECTED" in statuses:
        reasons = kinds.get("rejection_reason", [])
        assert sum(r["n"] for r in reasons) == statuses["REJECTED"]["n"]
        ranks = [r["rnk"] for r in reasons]
        assert ranks == sorted(ranks) and max(ranks) <= 5
        # ranked by count descending
        ns = [r["n"] for r in sorted(reasons, key=lambda x: x["rnk"])]
        assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------------------
# WAC position reconstruction (R150) — planted branch fixture
# ---------------------------------------------------------------------------


def test_wac_kernel_branches():
    from portofolio_maximizer_spark.plans.queries_trades import _wac_kernel

    # open +10@100, add +10@120 (blend->110), partial close -5 (avg
    # unchanged), exact close -15 (flat), flip: +4@50 then -10@60
    # (over-close -> short 6 @ NEW price 60)
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 6,
            "rn": range(1, 7),
            "signed_qty": [10.0, 10.0, -5.0, -15.0, 4.0, -10.0],
            "price": [100.0, 120.0, 90.0, 95.0, 50.0, 60.0],
        }
    )
    out = _wac_kernel(pdf).iloc[0]
    assert out["shares"] == -6.0
    assert out["entry_price"] == 60.0
    assert out["n_full_closes"] == 1
    assert out["n_flips"] == 1

    # partial close must NOT move the average
    pdf2 = pd.DataFrame(
        {
            "user_id": [2] * 3,
            "rn": [1, 2, 3],
            "signed_qty": [10.0, 10.0, -5.0],
            "price": [100.0, 120.0, 999.0],
        }
    )
    out2 = _wac_kernel(pdf2).iloc[0]
    assert out2["shares"] == 15.0
    assert out2["entry_price"] == pytest.approx(110.0)


def test_wac_reconstruction_marking(spark):
    rows = QUERIES["wac_position_reconstruction"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["status"] == "ACTIVE":
            assert r["market_value"] == pytest.approx(
                r["current_price"] * r["shares"], abs=2e-5
            )
            if r["entry_price"]:
                expect = (r["current_price"] / r["entry_price"] - 1.0) * (
                    1.0 if r["shares"] > 0 else -1.0
                )
                assert r["unrealized_pnl_pct"] == pytest.approx(
                    expect, abs=2e-6
                )
        else:
            assert r["market_value"] is None


# ---------------------------------------------------------------------------
# Quality-pipeline contract (R151)
# ---------------------------------------------------------------------------


def test_quality_pipeline_contract(spark):
    rows = {
        r["step"]: r
        for r in QUERIES["quality_pipeline_status"](spark, SF).collect()
    }
    assert set(rows) == {
        "compute_ticker_eligibility", "apply_ticker_eligibility_gates",
        "compute_context_quality", "data_sufficiency_monitor",
        "generate_performance_charts", "overall",
    }
    steps = [v for k, v in rows.items() if k != "overall"]
    any_err = any(r["status"] == "ERROR" for r in steps)
    any_warn = any(r["status"] == "WARN" for r in steps)
    expect = "ERROR" if any_err else ("WARN" if any_warn else "PASS")
    assert rows["overall"]["status"] == expect
    assert rows["overall"]["n_warnings"] == sum(
        r["n_warnings"] for r in steps
    )
    for r in steps:
        assert (r["n_warnings"] > 0) == (r["warning_codes"] != "") or r[
            "status"
        ] == "ERROR"


# ---------------------------------------------------------------------------
# Corpus shard plan (L38) — partition and balance invariants
# ---------------------------------------------------------------------------


def test_corpus_shard_plan_invariants(spark, duck):
    rows = QUERIES["corpus_shard_plan"](spark, SF).collect()
    by_strat = {}
    for r in rows:
        by_strat.setdefault(r["strategy"], []).append(r)
    assert set(by_strat) == {"id_mod", "token_balanced"}
    total_docs = duck.execute(
        "SELECT COUNT(*) FROM documents WHERE TRIM(text) <> ''"
    ).fetchone()[0]
    for strat, rs in by_strat.items():
        # shards partition the corpus
        assert sum(r["n_docs"] for r in rs) == total_docs
        assert sum(r["token_share"] for r in rs) == pytest.approx(
            1.0, abs=1e-4
        )
        assert len({r["shard"] for r in rs}) == len(rs) <= 8
        mx = max(r["shard_skew"] for r in rs)
        assert rs[0]["strategy_max_skew"] == pytest.approx(mx, abs=1e-6)
    # token-balanced must not be WORSE than id-mod on max skew: its
    # worst shard overshoots the ideal width by at most one document
    bal = by_strat["token_balanced"][0]["strategy_max_skew"]
    mod = by_strat["id_mod"][0]["strategy_max_skew"]
    assert bal <= mod + 1e-6


# ---------------------------------------------------------------------------
# Dedup savings curve (L39) — monotonicity
# ---------------------------------------------------------------------------


def test_dedup_savings_curve_monotone(spark):
    rows = sorted(
        QUERIES["dedup_savings_curve"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.3, 0.4, 0.5, 0.6, 0.8]
    # raising the threshold can only shrink pairs, removals and savings
    for a, b in zip(rows, rows[1:]):
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_removable_docs"] <= a["n_removable_docs"]
        assert b["tokens_removed"] <= a["tokens_removed"]
        assert b["saving_fraction"] <= a["saving_fraction"] + 1e-9
    assert all(r["corpus_tokens"] == rows[0]["corpus_tokens"] for r in rows)
    assert rows[0]["n_pairs"] > 0  # the 0.3 floor matches the L4 frame


# ---------------------------------------------------------------------------
# Context-length sweep (L40) — bound invariants
# ---------------------------------------------------------------------------


def test_context_length_sweep_invariants(spark):
    rows = sorted(
        QUERIES["context_length_sweep"](spark, SF).collect(),
        key=lambda r: r["ctx_len"],
    )
    assert [r["ctx_len"] for r in rows] == [64, 128, 256, 512]
    for a, b in zip(rows, rows[1:]):
        # longer contexts truncate less
        assert b["truncation_loss"] <= a["truncation_loss"] + 1e-9
        assert b["truncated_docs"] <= a["truncated_docs"]
        # but waste more padding in the one-doc regime
        assert b["one_doc_utilization"] <= a["one_doc_utilization"] + 1e-9
    for r in rows:
        assert 0.0 <= r["truncation_loss"] < 1.0
        # dense packing wastes less than one context of padding
        assert r["packed_utilization"] > 1.0 - r["ctx_len"] / (
            r["packed_contexts"] * r["ctx_len"]
        ) - 1e-9
        assert r["packed_contexts"] * r["ctx_len"] >= r["corpus_tokens"]


# ---------------------------------------------------------------------------
# Trade event feed (R152) — ladder and bound
# ---------------------------------------------------------------------------


def test_trade_event_feed_ladder(spark):
    rows = QUERIES["trade_event_feed"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    assert [r["rnk"] for r in rows] == sorted(r["rnk"] for r in rows)
    ts = [r["event_ms"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert ts == sorted(ts, reverse=True)
    for r in rows:
        if r["action"] == "BUY":
            assert r["event_class"] == "ENTRY"
            assert r["realized_pnl"] is None
        elif r["realized_pnl"] is None:
            assert r["event_class"] == "EXIT_FLAT"
        elif r["realized_pnl"] > 0:
            assert r["event_class"] == "EXIT_PROFIT"
        elif r["realized_pnl"] < 0:
            assert r["event_class"] == "EXIT_LOSS"
        else:
            assert r["event_class"] == "EXIT_FLAT"
