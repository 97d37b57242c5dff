"""N-asset portfolio optimization (SURVEY §2.10 F16 / §2.4 A8).

Reference: `etl/portfolio_math.py:312-382` — scipy SLSQP long-only
Markowitz min-variance and equal-risk-contribution (risk parity) over the
full N×N covariance matrix. The closed-form 2-asset versions live in
`plans/queries_stats.py` (min_variance_pair_weights /
risk_parity_pair_weights); this module is the general-N path.

Scale split (the same split the reference makes): the O(rows) work — the
pairwise covariance aggregation — is fully distributed (self-join on the
aligned row number, one shuffle, N²/2 output rows). Only the O(N²) solve
runs on the driver: for a tradable universe N is hundreds at most, so the
collected matrix is a few KB even when the returns table is 100 TB. The
solved weight vector is re-emitted as a DataFrame for downstream joins.

Both solvers are deterministic (fixed iteration counts, no random
starts), replacing scipy's SLSQP with:
- min-variance long-only: exact active-set elimination on the KKT system
  (solve Σ⁻¹1; drop negative-weight assets; re-solve) — the textbook
  closed form the SLSQP converges to;
- risk parity: damped fixed-point iteration w_i ∝ 1/(Σw)_i (Maillard,
  Roncalli & Teïletche), run to a 1e-12 fixed point.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_long(
    series: DataFrame,
    key: str = "user_id",
    order_col: str = "rn",
    ret_col: str = "lr",
    min_obs: int = 10,
) -> DataFrame:
    """Full covariance matrix in long form (u1 <= u2, diagonal included),
    aligned on the shared row number — distributed: one self-join shuffle
    keyed on ``order_col``, partial-aggregated covariances."""
    s = series.filter(F.col(ret_col).isNotNull()).select(key, order_col, ret_col)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{order_col}") == F.col(f"b.{order_col}"))
            & (F.col(f"a.{key}") <= F.col(f"b.{key}")),
        )
        .groupBy(F.col(f"a.{key}").alias("u1"), F.col(f"b.{key}").alias("u2"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.covar_samp(f"a.{ret_col}", f"b.{ret_col}").alias("cov"),
        )
        .filter(F.col("n") > min_obs)
    )


def _collect_sigma(cov_long: DataFrame) -> tuple[list[int], np.ndarray]:
    """Materialize the long-form covariance into a dense symmetric Σ.
    Driver-side by design: N assets → N(N+1)/2 rows, KBs not GBs."""
    rows = cov_long.select("u1", "u2", "cov").collect()
    keys = sorted({r.u1 for r in rows} | {r.u2 for r in rows})
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    sigma = np.zeros((n, n))
    for r in rows:
        i, j = idx[r.u1], idx[r.u2]
        sigma[i, j] = sigma[j, i] = float(r.cov)
    return keys, sigma


def minvar_longonly(sigma: np.ndarray) -> np.ndarray:
    """Long-only minimum-variance weights by active-set elimination:
    solve w ∝ Σ⁻¹1 on the active set, drop the most negative weight,
    repeat. Exact for positive-definite Σ (what SLSQP with w≥0, Σw=1
    converges to in `etl/portfolio_math.py:312-347`)."""
    n = sigma.shape[0]
    active = list(range(n))
    while True:
        sub = sigma[np.ix_(active, active)]
        ones = np.ones(len(active))
        try:
            x = np.linalg.solve(sub, ones)
        except np.linalg.LinAlgError:
            x = np.linalg.lstsq(sub, ones, rcond=None)[0]
        w_act = x / x.sum()
        if (w_act >= -1e-12).all() or len(active) == 1:
            w = np.zeros(n)
            w[active] = np.clip(w_act, 0.0, None)
            return w / w.sum()
        active.pop(int(np.argmin(w_act)))


def riskparity(sigma: np.ndarray, iters: int = 10000, tol: float = 1e-14) -> np.ndarray:
    """Equal-risk-contribution weights via cyclical coordinate descent on
    f(w) = σ(w) − Σ b·ln(w) (Griveau-Billion et al. 2013) — converges for
    any positive-definite Σ, including negative covariances where the
    naive w_i ∝ 1/(Σw)_i fixed point oscillates. Matches the optimum of
    `etl/portfolio_math.py:349-382`'s SLSQP objective.

    At the unnormalized optimum w_i(Σw)_i = b_i·σ(w) exactly; normalizing
    to Σw_i = 1 rescales all contributions equally, so equality of risk
    contributions survives."""
    n = sigma.shape[0]
    if n == 1:
        return np.ones(1)
    b = np.ones(n) / n
    diag = np.diag(sigma)
    w = np.ones(n) / np.sqrt(max(sigma.sum(), 1e-300))
    for _ in range(iters):
        w_prev = w.copy()
        for i in range(n):
            sig = float(np.sqrt(max(w @ sigma @ w, 1e-300)))
            c = float(sigma[i] @ w - diag[i] * w[i])
            w[i] = (-c + np.sqrt(c * c + 4.0 * diag[i] * b[i] * sig)) / (2.0 * diag[i])
        if np.max(np.abs(w - w_prev)) < tol * max(1.0, float(np.max(np.abs(w)))):
            break
    return w / w.sum()


def _emit_weights(
    spark, keys: list[int], sigma: np.ndarray, w: np.ndarray, method: str
) -> DataFrame:
    # The risk decomposition is computed from the ROUNDED weights (the
    # exact values the row emits / the oracle stage sees), so the
    # verification oracle can reproduce risk_contrib and port_vol from
    # the staged weights plus an SQL-computed covariance bit-for-bit at
    # the 6-decimal grain.
    w = np.round(w, 6)
    port_var = float(w @ sigma @ w)
    port_vol = float(np.sqrt(max(port_var, 0.0)))
    mrc = sigma @ w
    rc = w * mrc / port_vol if port_vol > 0 else np.zeros_like(w)
    rows = [
        (
            int(k),
            method,
            round(float(w[i]), 6),
            round(float(rc[i]), 6),
            round(port_vol, 6),
        )
        for i, k in enumerate(keys)
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, method string, weight double, risk_contrib double, port_vol double"
    )


def min_variance_weights(series: DataFrame, **kw) -> DataFrame:
    """Distributed covariance → driver active-set solve → weights DF."""
    cov = covariance_long(series, **kw)
    keys, sigma = _collect_sigma(cov)
    w = minvar_longonly(sigma)
    return _emit_weights(series.sparkSession, keys, sigma, w, "min_variance")


def align_panel(
    series: DataFrame,
    key: str = "user_id",
    order_col: str = "rn",
    ret_col: str = "lr",
) -> DataFrame:
    """Restrict a long (asset, time, return) panel to the time points where
    EVERY asset has a non-null return — the aligned-panel discipline the
    Ledoit-Wolf estimator's single-n algebra requires. One groupBy on the
    time key + a semi-join; both shuffle on ``order_col`` only."""
    s = series.filter(F.col(ret_col).isNotNull()).select(key, order_col, ret_col)
    n_assets = s.select(key).distinct().count()
    full_t = (
        s.groupBy(order_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == n_assets)
        .select(order_col)
    )
    return s.join(full_t, order_col, "left_semi")


def ledoit_wolf_lambda(
    series: DataFrame,
    sigma_sample: np.ndarray,
    n_assets: int,
    key: str = "user_id",
    order_col: str = "rn",
    ret_col: str = "lr",
) -> float:
    """Ledoit-Wolf (2004) optimal shrinkage intensity toward μI
    (reference `etl/portfolio_math.py:266-310` via sklearn ``LedoitWolf``;
    formula re-derived from the paper — λ = β/δ with
    δ = ‖S − μI‖²_F/p and β = (Σ_k‖x_kx_kᵀ − S‖²_F)/(n²p)).

    Everything O(rows) is distributed: the only data-dependent fourth
    moment, q = Σ_k (x_k·x_k)², reduces to one per-time-point aggregate
    over centered returns (x_k is the cross-sectional return vector at
    time k). The remaining terms come from the already-collected N×N Σ.

    The single-n algebra (the (n−1)/n rescale and the β denominator)
    is only valid on a COMPLETE panel — ``sigma_sample`` built from
    pairwise-complete counts would silently bias λ per-pair. An
    incomplete panel therefore raises instead of returning a biased
    value; align with ``align_panel`` first (what
    ``min_variance_weights_shrunk`` does).
    """
    s = series.filter(F.col(ret_col).isNotNull()).select(key, order_col, ret_col)
    mu_by_asset = s.groupBy(key).agg(F.avg(ret_col).alias("_mu"))
    centered = s.join(mu_by_asset, key).select(
        order_col, (F.col(ret_col) - F.col("_mu")).alias("_c")
    )
    per_t = centered.groupBy(order_col).agg(
        F.count(F.lit(1)).alias("_n_assets"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ssq"),
    )
    row = per_t.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("_n_assets") == n_assets).cast("int")).alias("n"),
        F.sum(
            F.when(F.col("_n_assets") == n_assets, F.col("_ssq") * F.col("_ssq"))
        ).alias("q"),
    ).collect()[0]
    n_total, n = int(row["n_total"]), int(row["n"] or 0)
    if n < n_total:
        raise ValueError(
            f"ledoit_wolf_lambda requires a complete panel: {n_total - n} of "
            f"{n_total} time points are missing at least one of the "
            f"{n_assets} assets — align the panel first (align_panel)"
        )
    q = float(row["q"] or 0.0)
    if n <= 1:
        return 0.0
    p = n_assets
    # covariance_long uses the unbiased (n−1) estimator; the LW formula is
    # stated for the biased 1/n one — rescale before mixing with q.
    sb = sigma_sample * (n - 1) / n
    frob = float((sb**2).sum())
    mu = float(np.trace(sb)) / p
    delta = (frob - 2.0 * mu * float(np.trace(sb)) + p * mu * mu) / p
    beta = (q / n - frob) / (n * p)
    beta = max(0.0, min(beta, delta))
    return float(beta / delta) if delta > 0 else 0.0


def min_variance_weights_shrunk(
    series: DataFrame, shrinkage: float | None = None, **kw
) -> DataFrame:
    """Long-only min-variance on the Ledoit-Wolf-shrunk covariance
    Σ_λ = (1−λ)·S + λ·μI (reference `etl/portfolio_math.py:266-310`,
    method="ledoit_wolf"). λ is estimated from the data unless pinned via
    ``shrinkage`` (used by the monotonicity invariant tests). The λ-blend
    itself is a driver-side matrix op — Σ is N×N, KBs — while both inputs
    (pairwise covariances, the LW fourth-moment) are distributed
    aggregates.

    When λ is estimated, the panel is ALIGNED first (``align_panel``) and
    both the covariance and the fourth-moment statistic are computed from
    the same complete panel — the single-n rescale inside the λ formula
    is exact by construction instead of silently biased on ragged data
    (``ledoit_wolf_lambda`` raises on incomplete panels)."""
    key_c = kw.get("key", "user_id")
    order_c = kw.get("order_col", "rn")
    ret_c = kw.get("ret_col", "lr")
    if shrinkage is None:
        series = align_panel(series, key=key_c, order_col=order_c, ret_col=ret_c)
    cov = covariance_long(series, **kw)
    keys, sigma = _collect_sigma(cov)
    # covar_samp is the unbiased (n−1) estimator; LW is stated for the
    # biased 1/n one. The (n−1)/n rescale cancels in the weights but not
    # in λ, so rescale with the panel length used by the λ estimator.
    lam = shrinkage
    n_assets = len(keys)
    mu = float(np.trace(sigma)) / max(n_assets, 1)
    if lam is None:
        lam = ledoit_wolf_lambda(
            series,
            sigma,
            n_assets,
            key=kw.get("key", "user_id"),
            order_col=kw.get("order_col", "rn"),
            ret_col=kw.get("ret_col", "lr"),
        )
    # round λ to the emitted 6-decimal grain BEFORE blending so the
    # staged shrinkage value reproduces Σ_λ exactly in the oracle
    lam = round(float(lam), 6)
    sigma_sh = (1.0 - lam) * sigma + lam * mu * np.eye(n_assets)
    w = minvar_longonly(sigma_sh)
    out = _emit_weights(
        series.sparkSession, keys, sigma_sh, w, "min_variance_lw"
    )
    return out.withColumn("shrinkage", F.lit(float(lam)))


def risk_parity_weights(series: DataFrame, **kw) -> DataFrame:
    """Distributed covariance → driver fixed-point ERC solve → weights DF."""
    cov = covariance_long(series, **kw)
    keys, sigma = _collect_sigma(cov)
    w = riskparity(sigma)
    return _emit_weights(series.sparkSession, keys, sigma, w, "risk_parity")
