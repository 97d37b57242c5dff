"""Property-based tests (Hypothesis) over the numpy model kernels —
SURVEY §5's property-test lane (the reference runs 8 Hypothesis suites at
300+ examples; these cover the new engine's UDF cores without paying a
Spark job per example)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from portofolio_maximizer_spark.forecast.models import _fit_ar, ssa_core

F = st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False)


@settings(max_examples=60, deadline=None)
@given(
    phi=st.floats(min_value=-0.9, max_value=0.9),
    c=st.floats(min_value=-5, max_value=5),
    x0=st.floats(min_value=-10, max_value=10),
)
def test_fit_ar_recovers_noiseless_ar1(phi, c, x0):
    """On an exactly-AR(1) series the OLS fit must recover (c, φ) and
    produce ~zero residual σ (up to float conditioning)."""
    n = 80
    x = np.empty(n)
    x[0] = x0
    for t in range(1, n):
        x[t] = c + phi * x[t - 1]
    # degenerate fixed-point series carry no signal — skip those
    if np.ptp(x) < 1e-6:
        return
    beta, sigma, _aic = _fit_ar(x, 1)
    scale = max(1.0, np.abs(x).max())
    assert abs(beta[1] - phi) < 1e-4
    assert sigma < 1e-4 * scale


@settings(max_examples=40, deadline=None)
@given(data=st.lists(F, min_size=24, max_size=120))
def test_ssa_full_rank_reconstructs_exactly(data):
    """With evr_target=1.0 the SVD keeps every component, so diagonal
    averaging must reproduce the series exactly — for ANY input."""
    x = np.asarray(data)
    core = ssa_core(x, window=8, evr_target=1.0)
    assert core is not None
    _r, evr_r, rmse, _naive = core
    scale = max(1.0, np.abs(x).max())
    assert rmse <= 1e-8 * scale
    assert evr_r >= 1.0 - 1e-12


@settings(max_examples=40, deadline=None)
@given(data=st.lists(F, min_size=24, max_size=120), rank_evr=st.floats(0.5, 0.99))
def test_ssa_rank_monotone(data, rank_evr):
    """A lower EVR target can never use a higher rank, and reconstruction
    error can never improve when the rank shrinks."""
    x = np.asarray(data)
    lo = ssa_core(x, window=8, evr_target=rank_evr)
    hi = ssa_core(x, window=8, evr_target=1.0)
    assert lo is not None and hi is not None
    assert lo[0] <= hi[0]
    assert lo[2] >= hi[2] - 1e-9 * max(1.0, np.abs(x).max())


@settings(max_examples=60, deadline=None)
@given(
    rets=st.lists(
        st.floats(min_value=-0.5, max_value=0.5, allow_nan=False), min_size=2,
        max_size=200,
    ),
    lam=st.floats(min_value=0.5, max_value=0.99),
)
def test_ewma_variance_stays_in_hull(rets, lam):
    """The EWMA variance recursion is a convex combination at every step,
    so σ²_t always lies within [min r², max r²] of the observations seen."""
    r = np.asarray(rets)
    var = r[0] ** 2
    lo = hi = r[0] ** 2
    for t in range(1, len(r)):
        var = lam * var + (1 - lam) * r[t - 1] ** 2
        lo = min(lo, r[t - 1] ** 2)
        hi = max(hi, r[t - 1] ** 2)
        assert lo - 1e-12 <= var <= hi + 1e-12


# ---------------------------------------------------------------------------
# F16 N-asset optimizers (operators/portfolio.py) — optimality and ERC
# properties over random positive-definite covariances
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(2, 6),
    seed=st.integers(0, 10_000),
)
def test_minvar_dominates_random_longonly_portfolios(n, seed):
    """Active-set min-variance must (weakly) beat every random long-only
    weight vector on the same covariance."""
    import numpy as np

    from portofolio_maximizer_spark.operators.portfolio import minvar_longonly

    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n + 2))
    sigma = A @ A.T / (n + 2) + np.eye(n) * 1e-9
    w = minvar_longonly(sigma)
    assert abs(w.sum() - 1) < 1e-8 and (w >= -1e-10).all()
    best = w @ sigma @ w
    for _ in range(25):
        r = rng.random(n)
        r /= r.sum()
        assert best <= r @ sigma @ r + 1e-8


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(2, 6),
    seed=st.integers(0, 10_000),
)
def test_riskparity_equal_contributions_property(n, seed):
    """Cyclical coordinate descent must deliver equal risk contributions
    for any positive-definite covariance, including negative correlations."""
    import numpy as np

    from portofolio_maximizer_spark.operators.portfolio import riskparity

    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n + 2))
    sigma = A @ A.T / (n + 2) + np.eye(n) * 1e-9
    w = riskparity(sigma)
    assert abs(w.sum() - 1) < 1e-8 and (w > 0).all()
    rc = w * (sigma @ w)
    scale = max(float(rc.mean()), 1e-300)
    assert np.max(np.abs(rc - rc.mean())) / scale < 1e-6


@settings(max_examples=60, deadline=None)
@given(t=st.floats(-8.0, 8.0), df=st.sampled_from([2, 3, 4]))
def test_student_t_cdf_closed_forms(t, df):
    """The ops pack's DM p-values use exact Student-t CDF closed forms
    at df=2/3/4 (reference scipy.stats.t.cdf at df = folds-1,
    `etl/statistical_tests.py:95`); pin them against numerical
    integration of the t pdf."""
    import math

    import numpy as np

    def pdf(x):
        return (
            math.gamma((df + 1) / 2)
            / (math.sqrt(df * math.pi) * math.gamma(df / 2))
            * (1 + x * x / df) ** (-(df + 1) / 2)
        )

    xs = np.linspace(0.0, abs(t), 20001)
    num = 0.5 + np.trapz([pdf(x) for x in xs], xs)
    if df == 2:
        closed = 0.5 + abs(t) / (2 * math.sqrt(t * t + 2))
    elif df == 3:
        x3 = abs(t) / math.sqrt(3)
        closed = 0.5 + (1 / math.pi) * (x3 / (1 + t * t / 3) + math.atan(x3))
    else:
        u = 1 + t * t / 4
        closed = 0.5 + 0.375 * (abs(t) / math.sqrt(u)) * (
            1 - t * t / (12 * u)
        )
    assert abs(num - closed) < 1e-6


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_bounded_weight_qp_enumeration(seed):
    """The ops pack's 19-candidate active-set enumeration (box-bounded
    simplex QP, reference scipy SLSQP in
    `scripts/optimize_ensemble_weights.py:74-189`) must match a dense
    grid search over the feasible simplex."""
    import numpy as np

    lo, hi = 0.05, 0.95
    rng = np.random.default_rng(seed)
    n = 40
    P = rng.normal(size=(n, 3)) * rng.uniform(0.5, 2.0, size=3)
    a = P @ rng.dirichlet([1, 1, 1]) + rng.normal(scale=0.3, size=n)

    def obj(w):
        r = P @ w - a
        return float(r @ r) / n

    # dense feasible grid
    best_grid = np.inf
    for w1 in np.linspace(lo, hi, 181):
        w2_hi = min(hi, 1 - w1 - lo)
        if w2_hi < lo:  # descending linspace would leak w2 < lo
            continue
        for w2 in np.linspace(lo, w2_hi, 181):
            w3 = 1 - w1 - w2
            if lo - 1e-12 <= w3 <= hi + 1e-12:
                best_grid = min(best_grid, obj(np.array([w1, w2, w3])))

    # replicate the enumeration (same algebra as the query's spec)
    G = P.T @ P
    b = P.T @ a
    cands = []
    # interior: equality-constrained LS
    Gi = np.linalg.inv(G)
    u = Gi @ b
    v = Gi @ np.ones(3)
    wf = u + (1 - u.sum()) / v.sum() * v
    if all(lo <= x <= hi for x in wf):
        cands.append(wf)
    for k in range(3):
        i, j = [m for m in range(3) if m != k]
        for beta in (lo, hi):
            S = 1 - beta
            den = G[i, i] + G[j, j] - 2 * G[i, j]
            t = (b[i] - b[j] + beta * (G[j, k] - G[i, k])
                 + S * (G[j, j] - G[i, j])) / den
            if lo <= t <= hi and lo <= S - t <= hi:
                w = np.zeros(3)
                w[k], w[i], w[j] = beta, t, S - t
                cands.append(w)
    for k, l in ((0, 1), (0, 2), (1, 2)):
        m = [x for x in range(3) if x not in (k, l)][0]
        for bk in (lo, hi):
            for bl in (lo, hi):
                wm = 1 - bk - bl
                if lo <= wm <= hi:
                    w = np.zeros(3)
                    w[k], w[l], w[m] = bk, bl, wm
                    cands.append(w)
    best_enum = min(obj(w) for w in cands)
    assert best_enum <= best_grid + 1e-6


# ---------------------------------------------------------------------------
# WAC position kernel (R150) — conservation + bound properties
# ---------------------------------------------------------------------------


@settings(max_examples=120, deadline=None)
@given(
    qtys=st.lists(
        st.integers(min_value=-8, max_value=8).filter(lambda q: q != 0),
        min_size=1,
        max_size=40,
    ),
    prices=st.lists(
        st.floats(min_value=0.5, max_value=500, allow_nan=False),
        min_size=40,
        max_size=40,
    ),
)
def test_wac_kernel_properties(qtys, prices):
    """Share conservation (final position == Σ signed qty in EVERY branch
    of the state machine) and entry-price boundedness (the WAC blend can
    never leave the [min, max] envelope of trade prices)."""
    import pandas as pd

    from portofolio_maximizer_spark.plans.queries_trades import _wac_kernel

    n = len(qtys)
    pdf = pd.DataFrame(
        {
            "user_id": [0] * n,
            "rn": range(1, n + 1),
            "signed_qty": [float(q) for q in qtys],
            "price": prices[:n],
        }
    )
    out = _wac_kernel(pdf).iloc[0]
    assert out["shares"] == float(sum(qtys))
    if out["entry_price"] is not None and not np.isnan(out["entry_price"]):
        assert min(prices[:n]) - 1e-9 <= out["entry_price"] <= max(
            prices[:n]
        ) + 1e-9
    else:
        # flat positions carry no entry price
        assert out["shares"] == 0.0
    assert 0 <= out["n_flips"] + out["n_full_closes"] <= n


# ---------------------------------------------------------------------------
# L36 token-budget allocation — cap / conservation properties
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    avail=st.lists(
        st.integers(min_value=100, max_value=100000), min_size=1, max_size=12
    ),
    budget_x=st.floats(min_value=0.5, max_value=12.0, allow_nan=False),
)
def test_token_budget_allocation_properties(avail, budget_x):
    """Pure-numpy replica of the L36 allocation: the epoch cap is never
    exceeded, total allocation never exceeds the budget, and the
    redistribution pass only raises uncapped domains."""
    a = np.array(avail, dtype=float)
    total = a.sum()
    w = a**2.0 / (a**2.0).sum()
    budget = budget_x * total
    desired = w * budget
    emax = 4.0
    capped = desired > emax * a
    alloc1 = np.minimum(desired, emax * a)
    deficit = (desired - alloc1).sum()
    w_un = w[~capped].sum()
    alloc2 = alloc1.copy()
    if deficit > 0 and w_un > 0:
        alloc2[~capped] = np.minimum(
            alloc1[~capped] + deficit * w[~capped] / w_un,
            emax * a[~capped],
        )
    assert (alloc2 <= emax * a + 1e-6).all()
    assert alloc2.sum() <= budget + 1e-6 * max(budget, 1.0)
    assert (alloc2 + 1e-9 >= alloc1).all()
    # when nothing caps, allocation is exactly the demand
    if not capped.any():
        np.testing.assert_allclose(alloc2, desired, rtol=1e-12)
