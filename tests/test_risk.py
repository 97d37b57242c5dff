"""Risk-layer operator tests (reference `risk/` module +
residual/ensemble diagnostics + warm-start cache): feasibility
invariants of the barbell projection, penalty bounds, alert-severity
scenarios, white-noise verdicts on known series, promotion-gate
metrics vs hand computation, the warm-start fallback ladder, and the
bias/variance identity of the error decomposition."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from portofolio_maximizer_spark.operators import risk as R
from portofolio_maximizer_spark.plans import QUERIES


# ---------------------------------------------------------------------------
# Barbell projection (risk/barbell_policy.py:120-190)
# ---------------------------------------------------------------------------


def _weights_df(spark, rows):
    return spark.createDataFrame(
        rows, "segment string, symbol string, bucket string, w double"
    )


def _reference_project(weights: dict, buckets: dict) -> dict:
    """Pure-python replica of the reference's project_to_feasible
    (`risk/barbell_policy.py:120-190`) with this repo's cap constants —
    the ground truth the DataFrame projection must reproduce."""
    w = dict(weights)
    total = sum(w.values()) or 1.0

    def bucket_sum(kind):
        return sum(v for s, v in w.items() if buckets[s] == kind)

    risk = bucket_sum("core") + bucket_sum("spec")
    if risk > R.RISK_MAX:
        scale = R.RISK_MAX / risk
        for s in w:
            if buckets[s] in ("core", "spec"):
                w[s] *= scale
    core = bucket_sum("core")
    if core > R.CORE_MAX > 0:
        for s in w:
            if buckets[s] == "core":
                w[s] *= R.CORE_MAX / core
    spec = bucket_sum("spec")
    if spec > R.SPEC_MAX > 0:
        for s in w:
            if buckets[s] == "spec":
                w[s] *= R.SPEC_MAX / spec
    safe = bucket_sum("safe")
    if safe < R.SAFE_MIN:
        deficit = R.SAFE_MIN - safe
        donor_total = total - safe
        if donor_total > 0:
            frac = deficit / donor_total
            for s in w:
                if buckets[s] != "safe":
                    w[s] *= max(0.0, 1.0 - frac)
            safe_current = bucket_sum("safe")
            if safe_current > 0:
                boost = deficit / safe_current
                for s in w:
                    if buckets[s] == "safe":
                        w[s] *= 1.0 + boost
    new_total = sum(w.values()) or 1.0
    if new_total != total:
        for s in w:
            w[s] *= total / new_total
    return w


def test_barbell_projection_feasibility(spark):
    # Segment A violates everything: risk = 0.8 >> RISK_MAX, safe far
    # below SAFE_MIN (and the post-cap donor pool is SMALLER than the
    # safe deficit, exercising the max(0, .) donor clamp). Segment B is
    # already feasible.
    rows = [
        ("A", "s1", "safe", 0.05),
        ("A", "s2", "safe", 0.05),
        ("A", "c1", "core", 0.30),
        ("A", "c2", "core", 0.20),
        ("A", "p1", "spec", 0.30),
        ("A", "o1", "other", 0.10),
        ("B", "s1", "safe", 0.60),
        ("B", "c1", "core", 0.05),
        ("B", "p1", "spec", 0.02),
        ("B", "o1", "other", 0.33),
    ]
    out = R.project_barbell(_weights_df(spark, rows)).toPandas()
    assert (out.w_proj >= -1e-12).all(), "projection produced negative weights"
    for seg, grp in out.groupby("segment"):
        total_before = grp.w.sum()
        total_after = grp.w_proj.sum()
        assert total_after == pytest.approx(total_before, abs=1e-9)
        # Symbol-level agreement with the reference algorithm is THE
        # contract. (Note a reference property faithfully reproduced:
        # when the safe-min boost shrinks the interim total, the final
        # renormalisation scales risk back up and can land it slightly
        # ABOVE RISK_MAX — the caps are guaranteed only when no safe
        # deficit redistribution fires, as in segment B below.)
        seg_rows = [r for r in rows if r[0] == seg]
        want = _reference_project(
            {r[1]: r[3] for r in seg_rows}, {r[1]: r[2] for r in seg_rows}
        )
        got = grp.set_index("symbol").w_proj
        for sym, exp in want.items():
            assert got[sym] == pytest.approx(exp, abs=1e-9), (seg, sym)
    # No-deficit segment B: every cap holds exactly.
    bb = out[out.segment == "B"].groupby("bucket").w_proj.sum()
    assert bb.get("core", 0.0) + bb.get("spec", 0.0) <= R.RISK_MAX + 1e-9
    assert bb.get("spec", 0.0) <= R.SPEC_MAX + 1e-9
    assert bb.get("core", 0.0) <= R.CORE_MAX + 1e-9
    # Feasible segment B: safe stays dominant, projection ~identity up
    # to the final renormalisation.
    b = out[out.segment == "B"].set_index("symbol")
    assert b.loc["s1", "w_proj"] == pytest.approx(0.60, abs=1e-6)
    # Violating segment A: safe was boosted toward SAFE_MIN.
    a = out[out.segment == "A"]
    assert a[a.bucket == "safe"].w_proj.sum() >= R.SAFE_MIN - 1e-6


def test_barbell_projection_zero_risk_segment(spark):
    rows = [
        ("C", "s1", "safe", 0.70),
        ("C", "o1", "other", 0.30),
    ]
    out = R.project_barbell(_weights_df(spark, rows)).toPandas()
    assert out.w_proj.sum() == pytest.approx(1.0, abs=1e-9)
    assert out[out.bucket == "safe"].w_proj.iloc[0] >= R.SAFE_MIN


# ---------------------------------------------------------------------------
# Ratio penalty (risk/barbell_sizing.py:164-175)
# ---------------------------------------------------------------------------


def test_ratio_penalty_bounds(spark):
    df = spark.range(1).select(
        R.ratio_penalty(F.lit(None).cast("double"), 0.35, 0.55).alias("p_null"),
        R.ratio_penalty(F.lit(0.2), 0.35, 0.55).alias("p_under"),
        R.ratio_penalty(F.lit(0.35), 0.35, 0.55).alias("p_at"),
        R.ratio_penalty(F.lit(0.70), 0.35, 0.55).alias("p_2x"),
        R.ratio_penalty(F.lit(100.0), 0.35, 0.55).alias("p_huge"),
    )
    row = df.collect()[0]
    assert row.p_null == 1.0
    assert row.p_under == 1.0
    assert row.p_at == 1.0
    # 2x the cap: excess = 1 -> 1/(1+1) = 0.5, floored at 0.55.
    assert row.p_2x == pytest.approx(0.55)
    assert row.p_huge == pytest.approx(0.55)


# ---------------------------------------------------------------------------
# Real-time risk alerts (risk/real_time_risk_manager.py:102-331)
# ---------------------------------------------------------------------------


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, rn int, value double")


def test_risk_alert_crash_is_critical(spark):
    # 30% crash in 10% daily steps: drawdown crosses 15% AND daily
    # losses breach the 5% limit.
    vals = [100.0, 110.0, 99.0, 89.0, 80.0, 72.0, 65.0]
    rows = [(1, i + 1, v) for i, v in enumerate(vals)]
    out = R.risk_alert_summary(_series_df(spark, rows)).collect()[0]
    assert out.status == "CRITICAL"
    assert out.n_critical_dd > 0
    assert out.n_daily_loss > 0
    assert out.max_drawdown == pytest.approx((110 - 65) / 110, abs=1e-6)


def test_risk_alert_flat_is_normal(spark):
    rows = [(2, i + 1, 100.0 + 0.1 * (i % 3)) for i in range(20)]
    out = R.risk_alert_summary(_series_df(spark, rows)).collect()[0]
    assert out.status == "NORMAL"
    assert out.n_critical_dd == 0 and out.n_daily_loss == 0


def test_risk_alert_mild_drawdown_is_warning(spark):
    # Glide from 100 to 88 in 1%-ish steps: drawdown in [10%, 15%),
    # no daily-loss breach, vol < 40%.
    vals = [100.0 - 1.0 * i for i in range(13)]  # 100 .. 88
    rows = [(3, i + 1, v) for i, v in enumerate(vals)]
    out = R.risk_alert_summary(_series_df(spark, rows)).collect()[0]
    assert out.status == "WARNING"
    assert out.n_warning_dd > 0 and out.n_critical_dd == 0


# ---------------------------------------------------------------------------
# Residual white-noise verdict (forcester_ts/residual_diagnostics.py)
# ---------------------------------------------------------------------------


def _resid_df(spark, key, values):
    return spark.createDataFrame(
        [(key, i + 1, float(v)) for i, v in enumerate(values)],
        "user_id long, rn int, resid double",
    )


def test_white_noise_accepts_gaussian(spark):
    rng = np.random.default_rng(7)
    out = R.white_noise_verdict(_resid_df(spark, 1, rng.normal(size=300)))
    row = out.collect()[0]
    assert row.white_noise is True
    assert row.lb_pvalue > 0.05 and row.jb_pvalue > 0.05


def test_white_noise_rejects_autocorrelated(spark):
    rng = np.random.default_rng(7)
    walk = np.cumsum(rng.normal(size=300))  # strongly autocorrelated
    row = R.white_noise_verdict(_resid_df(spark, 2, walk)).collect()[0]
    assert row.white_noise is False
    assert row.lb_pvalue < 0.05


def test_chi2_sf6_matches_known_values(spark):
    # chi2(6) survival at its own mean (6.0) is ~0.4232.
    df = spark.range(1).select(
        R.chi2_sf6(F.lit(6.0)).alias("p6"),
        R.chi2_sf6(F.lit(12.592)).alias("p05"),  # 5% critical value
    )
    row = df.collect()[0]
    assert row.p6 == pytest.approx(0.42319, abs=1e-4)
    assert row.p05 == pytest.approx(0.05, abs=1e-3)


# ---------------------------------------------------------------------------
# Promotion gate (risk/barbell_promotion_gate.py:248-428)
# ---------------------------------------------------------------------------


def test_promotion_checks_metrics(spark):
    # 40 trades: 28 winners of +10, 12 losers of -5 for the 'other'
    # bucket (user_id % 5 == 4 -> mult 0.85 scales both sides equally).
    rows = [
        (4, i, i + 1, 10.0 if i % 10 < 7 else -5.0) for i in range(40)
    ]
    trades = spark.createDataFrame(
        rows, "user_id long, entry_rn int, exit_rn int, realized_pnl double"
    )
    bucket = F.lit("other")
    out = {
        r.check_name: r for r in R.promotion_checks(trades, bucket).collect()
    }
    assert len(out) == 8
    assert out["trade_support"].passed is True  # 40 >= 30
    assert out["loss_support"].passed is True  # 12 >= 5
    # Uniform 0.85 scaling shrinks total PnL and cannot raise the
    # profit factor -> pnl_delta fails; drawdown shrinks -> passes.
    assert out["pnl_delta"].passed is False
    assert out["drawdown_regression"].passed is True
    # Payoff asymmetry = 10/5 = 2 >= 1.10.
    assert out["payoff_asymmetry_effective"].passed is True
    assert out["payoff_asymmetry_effective"].observed == pytest.approx(2.0)
    # 28 equal winners -> concentration 1/28 <= 0.60.
    assert out["winner_concentration"].passed is True
    assert out["promote"].passed is False  # pnl_delta fails


# ---------------------------------------------------------------------------
# Warm-start suggestion ladder (forcester_ts/order_learner.py:233-323)
# ---------------------------------------------------------------------------


def test_warmstart_ladder_sources(spark):
    fits = spark.createDataFrame(
        [
            (1, "A", 1, 2, 10.0, 50),
            (1, "A", 2, 1, 9.0, 95),
            (1, "B", 1, 2, 8.0, 40),
            (2, "A", 2, 1, 5.0, 60),
            (2, "A", 1, 2, 6.0, 55),
        ],
        "user_id long, regime string, fitted_at int, best_p int, "
        "aic double, n_obs int",
    )
    cur = spark.createDataFrame(
        [(1, "A", 100), (2, "C", 80), (3, "A", 90)],
        "user_id long, regime string, n_obs int",
    )
    out = {
        r.user_id: r for r in R.warmstart_suggest(fits, cur).collect()
    }
    # user 1: exact (A) hit, latest fit (fitted_at=2, p=1), covers
    # 95/100 >= SKIP_FRACTION -> skip.
    assert out[1].source == "regime" and out[1].suggested_p == 1
    assert out[1].skip_grid is True and out[1].cache_aic == pytest.approx(9.0)
    # user 2: regime C never fitted -> global fallback (latest fit is
    # fitted_at=2 -> p=1), no skip.
    assert out[2].source == "global" and out[2].suggested_p == 1
    assert out[2].skip_grid is False
    # user 3: no fits at all -> population mode for regime A: a TRUE
    # count tie (p=1 twice, p=2 twice) resolved by the smaller-p
    # tiebreak.
    assert out[3].source == "population" and out[3].suggested_p == 1
    assert out[3].skip_grid is False


def test_warmstart_skip_respects_fraction(spark):
    fits = spark.createDataFrame(
        [(1, "A", 1, 2, 10.0, 60)],
        "user_id long, regime string, fitted_at int, best_p int, "
        "aic double, n_obs int",
    )
    cur = spark.createDataFrame(
        [(1, "A", 100)], "user_id long, regime string, n_obs int"
    )
    row = R.warmstart_suggest(fits, cur).collect()[0]
    # 60 < 0.7 * 100: cache hit but stale -> re-fit, keep suggestion.
    assert row.source == "regime" and row.skip_grid is False


# ---------------------------------------------------------------------------
# Ensemble error decomposition (forcester_ts/ensemble_diagnostics.py)
# ---------------------------------------------------------------------------


def test_error_decomposition_identity(spark, sf_dir):
    out = QUERIES["ensemble_error_decomposition"](spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        # Population identity: E[e^2] = (E[e])^2 + Var_pop(e).
        assert r.ensemble_rmse**2 == pytest.approx(
            r.bias_squared + r.ensemble_variance, rel=1e-3, abs=1e-4
        )
        assert r.rmse_ratio == pytest.approx(
            r.ensemble_rmse / r.best_model_rmse, rel=1e-3
        )
        assert r.best_model in ("naive", "ma3", "ma10")


# ---------------------------------------------------------------------------
# Query-level sanity at sf0.001 (oracle equality runs in
# tests/test_queries_oracle.py; these pin the semantics)
# ---------------------------------------------------------------------------


def test_projection_query_feasible_at_sf(spark, sf_dir):
    out = QUERIES["barbell_projection"](spark, sf_dir).toPandas()
    assert (out.w_after >= -1e-9).all()
    for seg, grp in out.groupby("segment"):
        by = grp.set_index("bucket").w_after
        # the safe floor survives the renormalisation (factor >= 1);
        # risk stays near its cap but may exceed it slightly when the
        # safe-deficit redistribution fired (reference property — see
        # test_barbell_projection_feasibility)
        assert by.get("safe", 0.0) >= R.SAFE_MIN - 1e-4
        assert by.get("core", 0.0) + by.get("spec", 0.0) <= R.RISK_MAX * 1.5
        assert grp.w_after.sum() == pytest.approx(1.0, abs=1e-4)


def test_risk_alert_statuses_present(spark, sf_dir):
    out = QUERIES["portfolio_risk_alerts"](spark, sf_dir).toPandas()
    assert set(out.status) <= {"CRITICAL", "WARNING", "NORMAL"}
    assert (out.vol_annualized >= 0).all()
    assert (out.max_drawdown >= out.final_drawdown - 1e-9).all()


# ---------------------------------------------------------------------------
# Omega antifragility suite (etl/portfolio_math.py:540-1032)
# ---------------------------------------------------------------------------


def _user_lr(sf_dir, uid):
    """Independent numpy log-return series for one user, straight from
    the parquet (no engine code)."""
    import duckdb

    df = duckdb.sql(
        f"SELECT value FROM read_parquet('{sf_dir}/events.parquet') "
        f"WHERE user_id = {uid} AND value > 0 ORDER BY ts, event_id"
    ).df()
    v = df.value.to_numpy(dtype=float)
    return np.log(v[1:] / v[:-1])


def _omega_ref(lr, tau):
    """Reference omega_ratio (portfolio_math.py:540-586) in numpy."""
    excess = lr - tau
    gain = np.clip(excess, 0, None).sum()
    loss = np.clip(-excess, 0, None).sum()
    return gain / loss if loss > 0 else float("inf")


def test_omega_curve_matches_reference_formula(spark, sf_dir):
    out = QUERIES["omega_robustness_curve"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert ((out.robustness_score >= 0) & (out.robustness_score <= 1)).all()
    assert ((out.omega_zero > 0) & (out.omega_zero <= R.OMEGA_CAP)).all()
    row = out[out.user_id == out.user_id.min()].iloc[0]
    lr = _user_lr(sf_dir, int(row.user_id))
    want = min(_omega_ref(lr, R.DAILY_NGN_THRESHOLD), R.OMEGA_CAP)
    assert row.omega_hurdle == pytest.approx(want, abs=1e-5)
    want0 = min(_omega_ref(lr, 0.0), R.OMEGA_CAP)
    assert row.omega_zero == pytest.approx(want0, abs=1e-5)


def test_omega_bootstrap_gate_invariants(spark, sf_dir):
    out = QUERIES["omega_bootstrap_gate"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.ci_lo <= out.ci_hi).all()
    assert (out.n_reps <= 100).all() and (out.n_reps > 50).all()
    for _, r in out.iterrows():
        assert bool(r.right_tail_ok) == bool(r.ci_lo >= 1.0)
        assert r.ci_width == pytest.approx(r.ci_hi - r.ci_lo, abs=2e-6)


def test_es_payoff_gate_matches_reference_formula(spark, sf_dir):
    out = QUERIES["es_payoff_support_gate"](spark, sf_dir).toPandas()
    assert len(out) > 0
    # unsupported keys must zero the effective ratio
    unsupported = out[~out.support_ok]
    assert (unsupported.payoff_effective == 0).all()
    supported = out[out.support_ok]
    assert (
        supported.payoff_effective
        <= supported.payoff_asymmetry + 1e-6
    ).all()
    row = out[out.user_id == out.user_id.min()].iloc[0]
    lr = _user_lr(sf_dir, int(row.user_id))
    tail_n = max(1, int(np.floor(len(lr) * R.ES_TAIL_PCT)))
    es_want = np.sort(lr)[:tail_n].mean()
    assert row.es_raw == pytest.approx(es_want, abs=1e-5)
    wins, losses = lr[lr > 0], -lr[lr < 0]
    assert row.payoff_asymmetry == pytest.approx(
        wins.mean() / losses.mean(), abs=1e-5
    )
    assert row.winner_concentration == pytest.approx(
        wins.max() / wins.sum(), abs=1e-5
    )


def test_split_drift_psi_same_population(spark, sf_dir):
    """A uniform hash split draws all three splits from the same
    distribution: PSI must be near zero and vol ratio near 1."""
    out = QUERIES["split_drift_psi"](spark, sf_dir).toPandas()
    assert set(out.split) == {"validation", "test"}
    # sf0.001 holdouts hold only ~100 log-returns, so the PSI estimator
    # is small-sample noisy; "same distribution" still means well under
    # the 0.25 industry drift-alarm level with headroom for noise.
    assert (out.psi.abs() < 0.5).all()
    assert ((out.volatility_ratio > 0.5) & (out.volatility_ratio < 2.0)).all()
    assert (out.n_base > out.n_cmp).all()


def test_stress_scenarios_match_reference_formula(spark, sf_dir):
    out = QUERIES["stress_test_scenarios"](spark, sf_dir).toPandas()
    assert set(out.scenario) == set(R.STRESS_SCENARIOS)
    uid = int(out.user_id.min())
    lr = _user_lr(sf_dir, uid)
    row = out[(out.user_id == uid) & (out.scenario == "crisis")].iloc[0]
    stressed = lr + R.STRESS_SCENARIOS["crisis"]
    sharpe = (
        (stressed.mean() - R.DEFAULT_RISK_FREE_RATE / R.TRADING_DAYS)
        / stressed.std()  # ddof=0: np.std population, as the reference
        * np.sqrt(R.TRADING_DAYS)
    )
    assert row.stressed_sharpe == pytest.approx(sharpe, abs=1e-4)
    # equity-curve factors are clamped at 1e-12: synthetic log returns
    # can dip below -100%, where the reference's raw cumprod would flip
    # sign and produce drawdowns > 1 (undefined); the clamp keeps the
    # curve positive and the drawdown in [0, 1]
    cum = np.cumprod(np.maximum(1 + stressed, 1e-12))
    dd = (1 - cum / np.maximum.accumulate(cum)).max()
    assert row.stressed_max_drawdown == pytest.approx(dd, abs=1e-5)
    assert row.stressed_var_95 == pytest.approx(
        np.percentile(stressed, 5), abs=1e-5
    )
    assert row.portfolio_loss == pytest.approx(
        R.STRESS_SCENARIOS["crisis"] * len(lr), abs=1e-6
    )
    # shocks only shift location: drawdown worsens monotonically with
    # shock severity for every key
    piv = out.pivot_table(
        index="user_id", columns="scenario", values="stressed_max_drawdown"
    )
    assert (piv["crisis"] >= piv["baseline"] - 1e-9).all()


def test_kelly_fat_tail_matches_reference_formula(spark, sf_dir):
    import pandas as pd

    out = QUERIES["kelly_fat_tail_fraction"](spark, sf_dir).toPandas()
    assert ((out.kelly_fraction >= 0) & (out.kelly_fraction <= 0.20)).all()
    uid = int(out.user_id.min())
    lr = pd.Series(_user_lr(sf_dir, uid))
    row = out[out.user_id == uid].iloc[0]
    assert row.excess_kurtosis == pytest.approx(lr.kurtosis(), abs=1e-4)
    if len(lr) >= R.KELLY_MIN_OBS:
        full = (lr.mean() - R.DAILY_NGN_THRESHOLD) / lr.var()
        corr = 1.0 / (1.0 + max(lr.kurtosis() - 3.0, 0.0) / 4.0)
        want = float(np.clip(full * corr * R.KELLY_LAMBDA, 0.0, R.KELLY_CAP))
        assert row.kelly_fraction == pytest.approx(want, abs=1e-4)


def test_pretrade_gate_counts_consistent(spark, sf_dir):
    out = QUERIES["pretrade_check_gate"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.n_passed <= out.n_signals).all()
    # each failure counter is bounded by the signal count and the pass
    # count excludes every row with any failure
    for c in (
        "n_conf_fail",
        "n_cash_fail",
        "n_position_fail",
        "n_daily_fail",
        "n_risk_fail",
    ):
        assert (out[c] <= out.n_signals).all()
        assert (out.n_passed + out[c] <= out.n_signals).all()
    assert (out.volume_passed >= 0).all()
    # passed orders carry at least 1 share each
    assert (out.volume_passed >= out.n_passed).all()


def _reference_omega_summary(z, h, c):
    """Pure-python replica of omega_robustness_summary's derivation
    (`etl/portfolio_math.py:637-756`) on a (zero, hurdle, cost) omega
    triple; float('inf') marks infinite omega."""
    pts = [p for p in (z, h, c) if math.isfinite(p)]
    mono = all(r <= l + 1e-9 for l, r in zip(pts, pts[1:]))
    margin = h - 1.0 if math.isfinite(h) else None
    if not math.isfinite(z) and not math.isfinite(h):
        cliff, cliff_ok = 0.0, True
    elif not math.isfinite(z):
        cliff = 1.0
        cliff_ok = cliff <= R.CLIFF_DROP_MAX
    elif z > 1e-9:
        hf = h if math.isfinite(h) else z
        cliff = min(max((z - hf) / z, 0.0), 1.0)
        cliff_ok = cliff <= R.CLIFF_DROP_MAX
    else:
        cliff, cliff_ok = None, None

    def cap(x):
        return min(max(x, 0.0), R.OMEGA_CAP)

    def clip01(x):
        return min(max(x, 0.0), 1.0)

    zf, hf_, cf = cap(z), cap(h), cap(c)
    score = (
        0.40 * clip01(hf_ - 1.0)
        + 0.30 * clip01(cf - 1.0)
        + 0.20 * clip01(cf / max(hf_, 1e-6))
        + 0.10 * clip01(hf_ / max(zf, 1e-6))
    )
    if not mono:
        score *= 0.5
    if cliff_ok is False:
        score *= 0.5
    return mono, margin, cliff, cliff_ok, clip01(score)


def test_omega_ladder_derive_infinity_cases(spark):
    SENT = R.OMEGA_INF_SENTINEL
    cases = [
        (1, 2.0, 1.5, 1.2),       # ordinary decreasing ladder
        (2, SENT, SENT, SENT),    # always above threshold: no cliff
        (3, SENT, 1.4, 1.1),      # inf -> finite: maximum cliff
        (4, 3.0, SENT, 1.2),      # hurdle inf: dropped from the sequence
        (5, 0.8, 0.9, 1.2),       # increasing ladder: non-monotone
        (6, 500.0, 50.0, 40.0),   # big finite cliff: 0.9 > 0.6 -> fail
    ]
    df = spark.createDataFrame(
        [(u, z, h, c) for u, z, h, c in cases],
        "user_id long, omega_zero double, omega_hurdle double, "
        "omega_cost double",
    )
    out = {r.user_id: r for r in R.omega_ladder_derive(df).collect()}
    for uid, z, h, c in cases:
        inf = float("inf")
        zz = inf if z >= SENT else z
        hh = inf if h >= SENT else h
        cc = inf if c >= SENT else c
        mono, margin, cliff, cliff_ok, score = _reference_omega_summary(
            zz, hh, cc
        )
        # the score arithmetic caps sentinel at 100 exactly as inf
        row = out[uid]
        assert row.monotonicity_ok == mono, uid
        if margin is None:
            assert row.above_hurdle_margin is None, uid
        else:
            assert row.above_hurdle_margin == pytest.approx(margin, abs=1e-6)
        if cliff is None:
            assert row.cliff_drop_ratio is None and row.cliff_ok is None, uid
        else:
            assert row.cliff_drop_ratio == pytest.approx(cliff, abs=1e-6), uid
            assert row.cliff_ok == cliff_ok, uid
        assert row.robustness_score == pytest.approx(score, abs=1e-6), uid


def test_barbell_projection_random_panel(spark):
    """Bulk property test: 60 random Dirichlet weight vectors (plus
    crafted edge segments) projected in ONE Spark job must match the
    pure-python reference replica symbol-for-symbol, stay non-negative
    and preserve each segment's total."""
    rng = np.random.default_rng(11)
    rows = []
    for seg in range(60):
        k = int(rng.integers(2, 9))
        buckets = rng.choice(["safe", "core", "spec", "other"], size=k)
        w = rng.dirichlet(np.ones(k))
        for i in range(k):
            rows.append((f"s{seg}", f"sym{i}", str(buckets[i]), float(w[i])))
    # crafted edges: all-safe, no-safe, single symbol, tiny weights
    rows += [
        ("edge_allsafe", "a", "safe", 0.7),
        ("edge_allsafe", "b", "safe", 0.3),
        ("edge_nosafe", "a", "core", 0.5),
        ("edge_nosafe", "b", "other", 0.5),
        ("edge_single", "a", "spec", 1.0),
        ("edge_tiny", "a", "safe", 1e-9),
        ("edge_tiny", "b", "other", 1.0 - 1e-9),
    ]
    out = R.project_barbell(_weights_df(spark, rows)).toPandas()
    assert (out.w_proj >= -1e-12).all()
    for seg, grp in out.groupby("segment"):
        seg_rows = [r for r in rows if r[0] == seg]
        want = _reference_project(
            {r[1]: r[3] for r in seg_rows}, {r[1]: r[2] for r in seg_rows}
        )
        got = grp.set_index("symbol").w_proj
        for sym, exp in want.items():
            assert got[sym] == pytest.approx(exp, abs=1e-9), (seg, sym)
        assert grp.w_proj.sum() == pytest.approx(grp.w.sum(), abs=1e-9)


def test_ratio_penalty_monotone_panel(spark):
    """Penalty must be non-increasing in the ratio and bounded by
    [floor, 1] across a dense grid — one Spark job."""
    ratios = [i / 50.0 for i in range(0, 201)]
    df = spark.createDataFrame([(r,) for r in ratios], "ratio double")
    out = (
        df.select(
            "ratio", R.ratio_penalty(F.col("ratio"), 0.35, 0.55).alias("p")
        )
        .orderBy("ratio")
        .toPandas()
    )
    assert ((out.p >= 0.55 - 1e-12) & (out.p <= 1.0 + 1e-12)).all()
    assert (out.p.diff().dropna() <= 1e-12).all()
