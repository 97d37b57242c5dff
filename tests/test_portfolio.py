"""F16 N-asset optimizers: the driver-side solvers against brute force,
and the Spark queries' portfolio invariants (reference
`etl/portfolio_math.py:312-382` semantics)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from portofolio_maximizer_spark.operators.portfolio import (
    minvar_longonly,
    riskparity,
)


def _random_cov(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n + 3))
    return A @ A.T / (n + 3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_minvar_beats_simplex_grid(seed):
    """Active-set solution must (weakly) dominate a fine simplex grid of
    long-only weight vectors for 3 assets."""
    sigma = _random_cov(3, seed)
    w = minvar_longonly(sigma)
    assert abs(w.sum() - 1) < 1e-9 and (w >= -1e-12).all()
    best = w @ sigma @ w
    grid = np.linspace(0, 1, 101)
    for a, b in itertools.product(grid, grid):
        if a + b <= 1:
            v = np.array([a, b, 1 - a - b])
            assert best <= v @ sigma @ v + 1e-9


def test_minvar_matches_unconstrained_closed_form_when_interior():
    """When the unconstrained optimum is already long-only it must be
    returned exactly: w = Σ⁻¹1 / 1ᵀΣ⁻¹1."""
    sigma = np.array([[0.04, 0.01, 0.0], [0.01, 0.09, 0.01], [0.0, 0.01, 0.16]])
    x = np.linalg.solve(sigma, np.ones(3))
    expect = x / x.sum()
    assert (expect >= 0).all()
    np.testing.assert_allclose(minvar_longonly(sigma), expect, atol=1e-12)


def test_minvar_two_assets_matches_pair_closed_form():
    v1, v2, c = 0.04, 0.09, 0.012
    sigma = np.array([[v1, c], [c, v2]])
    den = v1 + v2 - 2 * c
    np.testing.assert_allclose(
        minvar_longonly(sigma), [(v2 - c) / den, (v1 - c) / den], atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_riskparity_equalizes_contributions(seed):
    sigma = _random_cov(4, seed)
    w = riskparity(sigma)
    assert abs(w.sum() - 1) < 1e-9 and (w > 0).all()
    rc = w * (sigma @ w)
    assert np.max(np.abs(rc - rc.mean())) < 1e-8 * max(rc.mean(), 1e-12) + 1e-12


def test_riskparity_two_assets_inverse_vol():
    """For N=2 ERC is exactly inverse-vol regardless of correlation."""
    v1, v2, c = 0.04, 0.16, -0.01
    sigma = np.array([[v1, c], [c, v2]])
    s1, s2 = np.sqrt(v1), np.sqrt(v2)
    np.testing.assert_allclose(
        riskparity(sigma), [s2 / (s1 + s2), s1 / (s1 + s2)], atol=1e-10
    )


def test_n_asset_queries_invariants(spark, sf_dir):
    from portofolio_maximizer_spark.plans import QUERIES

    mv = QUERIES["min_variance_weights_n"](spark, sf_dir).toPandas()
    rp = QUERIES["risk_parity_weights_n"](spark, sf_dir).toPandas()
    for out in (mv, rp):
        assert len(out) >= 3
        assert abs(out.weight.sum() - 1) < 1e-5
        assert (out.weight >= 0).all()
        assert out.port_vol.nunique() == 1
    # min-variance must not exceed risk-parity's portfolio vol (both are
    # feasible long-only points of the same covariance)
    assert mv.port_vol.iloc[0] <= rp.port_vol.iloc[0] + 1e-9
    # ERC: risk contributions equal across assets (6dp rounding in output)
    assert rp.risk_contrib.max() - rp.risk_contrib.min() < 1e-4
    # and dominates the 2-asset solutions on the same universe: every pair
    # portfolio is feasible for N-asset min-variance
    pair = QUERIES["min_variance_pair_weights"](spark, sf_dir).toPandas()
    if len(pair):
        assert mv.port_vol.iloc[0] <= pair.min_vol.min() + 1e-6


# ---------------------------------------------------------------------------
# F5 ensemble confidence derivation (reference forcester_ts/ensemble.py:
# 387-724 + _apply_da_cap :26-96)
# ---------------------------------------------------------------------------


def _reference_confidence_replay(rmse, te, da, bl_rmse, bl_te):
    """Independent numpy replay of the scoring pipeline the query encodes:
    relative-RMSE / relative-TE curves, DA score, RMSE-rank hybrid,
    60/40 fit-prediction blend, [0.05, 0.95] clips."""
    clip = lambda x: np.clip(x, 0.05, 0.95)
    rel_rmse = clip(1.0 / (1.0 + 1.5 * (rmse / bl_rmse - 1.0)))
    rel_te = clip(1.0 / (1.0 + 1.2 * (te / bl_te - 1.0)))
    da_score = clip(np.maximum((da - 0.5) / 0.5, 0.0))
    rmse_rank = clip(1.0 - (rmse - rmse.min()) / (rmse.max() - rmse.min() + 1e-10))
    blended = clip(0.6 * (rel_rmse + rel_te) / 2.0 + 0.4 * da_score)
    return clip((blended + rmse_rank) / 2.0)


def _reference_da_cap(w, da, floor=0.10, cap=0.10):
    """Replay of _apply_da_cap's contract."""
    penalized = da < floor
    capped = penalized & (w > cap)
    if not capped.any():
        return w
    fixed = np.where(w > cap, cap, w)
    sum_fixed = fixed[penalized].sum()
    out = w.copy()
    out[penalized] = fixed[penalized]
    np_mask = ~penalized
    out[np_mask] = w[np_mask] / w[np_mask].sum() * max(1.0 - sum_fixed, 0.0)
    return out


def test_ensemble_confidence_matches_reference_replay(spark, sf_dir):
    from portofolio_maximizer_spark.plans import QUERIES

    out = QUERIES["ensemble_confidence_weights"](spark, sf_dir).toPandas()
    assert len(out) > 0
    for uid, g in out.groupby("user_id"):
        g = g.set_index("model")
        assert set(g.index) == {"naive", "ma3", "ma10"}
        # weights sum to 1 after cap+redistribution (6dp rounding)
        assert abs(g.weight.sum() - 1.0) < 1e-4
        # naive's 1-step DA is ~0 by construction -> penalized, capped at 0.10
        assert g.loc["naive", "da"] < 0.10
        assert g.loc["naive", "weight"] <= 0.10 + 1e-9
        # replay confidence independently
        rmse = g.loc[["naive", "ma3", "ma10"], "rmse"].to_numpy()
        te = g.loc[["naive", "ma3", "ma10"], "te"].to_numpy()
        da = g.loc[["naive", "ma3", "ma10"], "da"].to_numpy()
        conf = _reference_confidence_replay(rmse, te, da, rmse[0], te[0])
        got = g.loc[["naive", "ma3", "ma10"], "confidence"].to_numpy()
        np.testing.assert_allclose(got, conf, atol=2e-5)
        w = _reference_da_cap(conf / conf.sum(), da)
        np.testing.assert_allclose(
            g.loc[["naive", "ma3", "ma10"], "weight"].to_numpy(), w, atol=2e-5
        )


def test_da_cap_contract_invariants():
    """The _apply_da_cap contract on synthetic weight/DA fixtures: capped
    models never exceed the cap, non-penalized absorb the freed mass,
    sum stays 1."""
    w = np.array([0.5, 0.3, 0.2])
    da = np.array([0.02, 0.55, 0.60])
    out = _reference_da_cap(w, da)
    assert abs(out.sum() - 1.0) < 1e-12
    assert out[0] == 0.10
    assert out[1] > w[1] and out[2] > w[2]
    # no cap binding -> identity
    da_ok = np.array([0.5, 0.55, 0.60])
    np.testing.assert_array_equal(_reference_da_cap(w, da_ok), w)


def test_pacf3_matches_yule_walker_solve(spark, sf_dir):
    """φ33 from the Durbin-Levinson algebra must equal the last
    coefficient of the exact 3x3 Yule-Walker solve."""
    from portofolio_maximizer_spark.plans import QUERIES

    out = QUERIES["pacf_yule_walker"](spark, sf_dir).toPandas()
    assert {"pacf_1", "pacf_2", "pacf_3"} <= set(out.columns)
    # replay on raw autocorrelations from the same series
    from portofolio_maximizer_spark.plans.queries_stats import _series

    s = _series(spark, sf_dir).toPandas()
    for uid in out.user_id.head(5):
        lr = s[s.user_id == uid].sort_values("rn").lr.dropna().to_numpy()
        rho = [
            np.corrcoef(lr[k:], lr[: len(lr) - k])[0, 1] if k else 1.0
            for k in range(4)
        ]
        R = np.array([[1, rho[1], rho[2]], [rho[1], 1, rho[1]], [rho[2], rho[1], 1]])
        phi = np.linalg.solve(R, np.array(rho[1:4]))
        got = out[out.user_id == uid].iloc[0]
        assert abs(got.pacf_3 - phi[2]) < 5e-3  # corr-vs-acov estimator gap


def test_percentile_sketch_tracks_exact(spark, sf_dir):
    """approx_percentile (the 100 TB path) must track the exact rollup
    within sketch tolerance on every stage."""
    from portofolio_maximizer_spark.plans import QUERIES

    exact = (
        QUERIES["latency_percentiles"](spark, sf_dir)
        .toPandas()
        .set_index("stage")
        .sort_index()
    )
    approx = (
        QUERIES["latency_percentiles_sketch"](spark, sf_dir)
        .toPandas()
        .set_index("stage")
        .sort_index()
    )
    assert list(exact.index) == list(approx.index)
    assert (exact.n == approx.n).all()
    # the query's exact columns must equal the exact twin's, and every
    # in-query sketch-envelope flag must hold
    for col in ("p50", "p95", "p99"):
        assert (exact[col] == approx[f"{col}_exact"]).all()
        assert approx[f"sketch_{col}_ok"].all()
    assert (exact.p_max == approx.p_max).all()
    # GK guarantees RANK error (<= 1/accuracy), not value error: check the
    # empirical CDF at each sketch cut, with a small-n boundary allowance
    from pyspark.sql import functions as SF_

    from portofolio_maximizer_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    sk = (
        ev.groupBy(SF_.col("event_type").alias("stage"))
        .agg(
            *[
                SF_.approx_percentile("value", SF_.lit(q), SF_.lit(10000)).alias(c)
                for c, q in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99))
            ]
        )
        .toPandas()
        .set_index("stage")
        .sort_index()
    )
    vals = ev.select("event_type", "value").toPandas()
    for stage, row in sk.iterrows():
        v = np.sort(vals[vals.event_type == stage].value.to_numpy())
        n = len(v)
        eps = 1e-4 + 2.0 / n  # sketch rank error + discrete-grid allowance
        for col, q in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99)):
            rank = np.searchsorted(v, row[col], side="right") / n
            assert q - eps <= rank <= q + eps, (stage, col, rank)


def test_sampled_shapley_additivity_and_determinism(spark, sf_dir):
    """Permutation-sampled Shapley: each sampled chain telescopes, so
    additivity (sum(phi) == v_full - v_empty) holds exactly even with a
    partial sample; the fixed seed makes it run-to-run deterministic."""
    from portofolio_maximizer_spark.plans import QUERIES

    out = QUERIES["shapley_sampled_5model"](spark, sf_dir).toPandas()
    assert len(out) > 0
    phis = out[[c for c in out.columns if c.startswith("phi_")]].sum(axis=1)
    # all quantities rounded to 6dp independently -> tolerance ~n_models*5e-7
    assert np.max(np.abs(phis - (out.v_full - out.v_empty))) < 1e-5
    out2 = QUERIES["shapley_sampled_5model"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("user_id").reset_index(drop=True),
        out2.sort_values("user_id").reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# Ledoit-Wolf shrinkage (reference etl/portfolio_math.py:266-310)
# ---------------------------------------------------------------------------


def _panel_df(spark, n_assets=6, n_t=120, seed=3):
    rng = np.random.default_rng(seed)
    # correlated returns: factor + idiosyncratic
    f = rng.normal(0, 0.02, n_t)
    rows = []
    for a in range(n_assets):
        beta = 0.5 + 0.1 * a
        r = beta * f + rng.normal(0, 0.01 * (1 + a / 4), n_t)
        rows += [(a, t, float(r[t])) for t in range(n_t)]
    return spark.createDataFrame(rows, "user_id long, rn long, lr double"), rows


def test_lw_lambda_matches_independent_numpy(spark):
    """Distributed λ must equal the Ledoit-Wolf 2004 formula computed
    directly on the collected returns matrix in numpy."""
    from portofolio_maximizer_spark.operators.portfolio import (
        covariance_long,
        ledoit_wolf_lambda,
        _collect_sigma,
    )

    sdf, rows = _panel_df(spark)
    keys, sigma = _collect_sigma(covariance_long(sdf, min_obs=10))
    lam = ledoit_wolf_lambda(sdf, sigma, len(keys))

    # independent numpy implementation (sklearn ledoit_wolf_shrinkage form)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "rn", "lr"])
    X = pdf.pivot(index="rn", columns="user_id", values="lr").to_numpy()
    n, p = X.shape
    Xc = X - X.mean(axis=0)
    S = Xc.T @ Xc / n
    mu = np.trace(S) / p
    delta = ((S - mu * np.eye(p)) ** 2).sum() / p
    beta_ = sum(float((x @ x) ** 2) for x in Xc)
    beta = max(0.0, min((beta_ / n - (S**2).sum()) / (n * p), delta))
    expect = beta / delta
    assert 0.0 < lam < 1.0
    assert abs(lam - expect) < 1e-9


def test_shrunk_weights_monotone_toward_equal_weight(spark):
    """λ=0 reproduces the empirical min-variance solution, λ=1 gives
    exactly equal weights, and the shrunk solution sits between the two
    (distance to equal-weight shrinks as λ grows)."""
    from portofolio_maximizer_spark.operators.portfolio import (
        min_variance_weights,
        min_variance_weights_shrunk,
    )

    sdf, _ = _panel_df(spark)
    emp = min_variance_weights(sdf).toPandas().sort_values("user_id")
    w0 = min_variance_weights_shrunk(sdf, shrinkage=0.0).toPandas().sort_values("user_id")
    w1 = min_variance_weights_shrunk(sdf, shrinkage=1.0).toPandas().sort_values("user_id")
    wmid = min_variance_weights_shrunk(sdf, shrinkage=0.5).toPandas().sort_values("user_id")
    west = min_variance_weights_shrunk(sdf).toPandas().sort_values("user_id")

    n = len(emp)
    eq = np.ones(n) / n
    np.testing.assert_allclose(w0.weight.to_numpy(), emp.weight.to_numpy(), atol=1e-6)
    np.testing.assert_allclose(w1.weight.to_numpy(), eq, atol=1e-6)

    def dist(df):
        return float(np.abs(df.weight.to_numpy() - eq).max())

    assert dist(wmid) <= dist(w0) + 1e-9
    assert dist(w1) <= dist(wmid) + 1e-9
    # estimated λ recorded in the output and inside (0, 1)
    lam = west.shrinkage.iloc[0]
    assert 0.0 < lam < 1.0
    assert dist(west) <= dist(w0) + 1e-9
    assert (west.weight >= 0).all() and abs(west.weight.sum() - 1) < 1e-5


def test_shrunk_query_registered(spark, sf_dir):
    from portofolio_maximizer_spark.plans import QUERIES

    out = QUERIES["min_variance_weights_shrunk"](spark, sf_dir).toPandas()
    assert len(out) >= 3
    assert abs(out.weight.sum() - 1) < 1e-5
    assert (out.weight >= 0).all()
    assert out.shrinkage.nunique() == 1
    assert 0.0 <= out.shrinkage.iloc[0] <= 1.0


def test_ledoit_wolf_rejects_ragged_panel_and_shrunk_aligns(spark):
    """An incomplete panel must fail loudly in the lambda estimator (the
    single-n rescale is wrong per-pair on ragged data), and
    min_variance_weights_shrunk must keep working by aligning the panel
    before estimating lambda."""
    import numpy as np
    import pytest

    from portofolio_maximizer_spark.operators.portfolio import (
        covariance_long,
        _collect_sigma,
        ledoit_wolf_lambda,
        min_variance_weights_shrunk,
    )

    rng = np.random.default_rng(11)
    rows = []
    for uid in range(4):
        n = 60 if uid < 3 else 45  # asset 3 has a shorter (ragged) history
        for t in range(n):
            rows.append((uid, t, float(rng.normal(0, 0.01))))
    sdf = spark.createDataFrame(rows, "user_id long, rn long, lr double")
    keys, sigma = _collect_sigma(covariance_long(sdf, min_obs=5))
    with pytest.raises(ValueError, match="complete panel"):
        ledoit_wolf_lambda(sdf, sigma, len(keys))
    out = min_variance_weights_shrunk(sdf, min_obs=5).toPandas()
    assert len(out) == 4
    lam = out.shrinkage.iloc[0]
    assert 0.0 <= lam <= 1.0
