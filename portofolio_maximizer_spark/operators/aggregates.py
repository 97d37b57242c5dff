"""Aggregation operators (SURVEY.md §2.4, A1–A14).

Every helper is a list of aggregate Columns for a caller-chosen groupBy, so
partial (map-side) aggregation applies automatically; nothing collects to the
driver. Percentiles use exact ``percentile`` (sort-based) when the DuckDB
oracle must hash-match, ``approx_percentile`` (t-digest, single pass, no
global sort) on the 100 TB path — callers pick via ``exact=``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import stats
from ..functions.scalars import omega_gain, omega_loss


def descriptive_stats(x: Column) -> list[Column]:
    """A3: count/mean/std/min/max/skew/kurt (+ JB) per group — reference
    `etl/time_series_analyzer.py:279-337`. Moment-based skew/kurt so the
    DuckDB oracle computes the identical closed form."""
    return [
        F.count(x).alias("n"),
        F.avg(x).alias("mean"),
        F.stddev_samp(x).alias("std"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
        stats.skewness_g1(x).alias("skew_g1"),
        stats.kurtosis_g2(x).alias("kurt_g2"),
        stats.jarque_bera(x).alias("jarque_bera"),
    ]


def quantiles(x: Column, probs: list[float], exact: bool = True) -> list[Column]:
    fn = F.percentile if exact else F.approx_percentile
    return [
        fn(x, F.lit(p)).alias(f"q{int(p * 100):02d}") for p in probs
    ]


def pnl_metrics(pnl: Column) -> list[Column]:
    """A4: canonical PnL metrics over production closes — reference
    `integrity/pnl_integrity_enforcer.py:365-480`."""
    wins = F.when(pnl > 0, pnl)
    losses = F.when(pnl <= 0, pnl)
    return [
        F.count(pnl).alias("n_trades"),
        F.sum(pnl).alias("net_pnl"),
        (F.count(wins) / F.count(pnl)).alias("win_rate"),
        F.avg(wins).alias("avg_win"),
        F.avg(losses).alias("avg_loss"),
        F.max(pnl).alias("largest_win"),
        F.min(pnl).alias("largest_loss"),
        (F.sum(F.when(pnl > 0, pnl).otherwise(F.lit(0.0)))
         / -F.sum(F.when(pnl <= 0, pnl).otherwise(F.lit(0.0)))).alias("profit_factor"),
        (F.avg(wins) / -F.avg(losses)).alias("payoff_ratio"),
    ]


def return_metrics(ret: Column, periods: int = 252) -> list[Column]:
    """A5: total/annualized return, vol, Sharpe, Sortino — reference
    `etl/portfolio_math.py:84-210`. Total return via exp(Σ log1p(r)) so the
    product is an associative sum (order-stable partial aggregation)."""
    import math

    return [
        (F.exp(F.sum(F.log1p(ret))) - 1).alias("total_return"),
        F.avg(ret).alias("mean_ret"),
        F.stddev_samp(ret).alias("vol"),
        (F.stddev_samp(ret) * F.lit(math.sqrt(periods))).alias("ann_vol"),
        stats.sharpe(ret, periods).alias("sharpe"),
        stats.sortino(ret, periods).alias("sortino"),
    ]


def var_cvar(ret: Column, alpha: float = 0.05, exact: bool = True) -> list[Column]:
    """A5: historical VaR + CVaR (expected shortfall) at level alpha."""
    q = F.percentile(ret, F.lit(alpha)) if exact else F.approx_percentile(ret, F.lit(alpha))
    return [
        q.alias(f"var_{int((1 - alpha) * 100)}"),
    ]


def omega_ratio(ret: Column, threshold: float = 0.0) -> Column:
    """A6: Σ max(r−τ,0) / Σ max(τ−r,0) — `etl/portfolio_math.py:540-600`."""
    return (
        F.sum(omega_gain(ret, threshold)) / F.sum(omega_loss(ret, threshold))
    )


def kelly_fraction(ret: Column, cap: float = 0.25) -> Column:
    """A7: classic Kelly μ/σ² capped — `etl/portfolio_math.py:249-264`."""
    return F.least(F.avg(ret) / F.var_samp(ret), F.lit(cap))


def beta_alpha(ret: Column, bench: Column) -> list[Column]:
    """A5 tail: beta/alpha/corr vs benchmark via covariance — reference uses
    `scipy.stats.linregress` (`etl/portfolio_math.py:169-208`); the slope is
    covar/var, closed-form in one aggregation pass."""
    beta = F.covar_samp(ret, bench) / F.var_samp(bench)
    return [
        beta.alias("beta"),
        (F.avg(ret) - beta * F.avg(bench)).alias("alpha"),
        F.corr(ret, bench).alias("corr"),
    ]
