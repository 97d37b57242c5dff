"""F16 N-asset optimizers: the driver-side solvers against brute force,
and the Spark queries' portfolio invariants (reference
`etl/portfolio_math.py:312-382` semantics)."""

from __future__ import annotations

import itertools

import numpy as np
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
