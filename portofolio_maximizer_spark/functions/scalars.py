"""Scalar column-expression helpers (§2.8 of SURVEY.md).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs — so
every expression stays inside whole-stage codegen. Each helper mirrors a
scalar idiom of the reference (citations in docstrings) but is written as a
reusable Column transformer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6_half_up(x: float) -> float:
    """Plain-float HALF-UP rounding at 6 dp — the cross-engine tie
    contract: 6dp-quantized values × finite-decimal factors land on
    exact .5e-6 midpoints, where Python ``round`` (half-even) and SQL
    ``ROUND`` (half-away) disagree. Every Python kernel and the oracle
    SQL (``FLOOR(x*1e6 + 0.5)/1e6``) must use THIS formula — it is the
    single source of truth; do not re-derive it locally."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def epoch_seconds(ts: Column) -> Column:
    """Epoch seconds (fractional) from any timestamp flavor.

    TIMESTAMP_NTZ has no direct numeric cast in Spark 4; routing through
    TIMESTAMP_LTZ works for LTZ (identity) and NTZ (session-tz reinterpret —
    the session TZ is pinned to UTC in session.py, so the instant is
    preserved). Use this instead of ``ts.cast("double")`` / ``unix_millis``
    anywhere the timestamp's parquet encoding isn't under our control.
    """
    return ts.cast("timestamp_ltz").cast("double")


def log_return(price: Column, prev_price: Column) -> Column:
    """ln(P_t / P_{t-1}) — reference `etl/portfolio_math.py:69-74`."""
    return F.log(price / prev_price)


def pct_change(cur: Column, prev: Column) -> Column:
    """Fractional change — pandas ``pct_change`` idiom."""
    return cur / prev - F.lit(1.0)


def clip(col: Column, lo: float, hi: float) -> Column:
    """Clamp — reference `forcester_ts/garch.py:155-167` clipping."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def annualize_vol(daily_std: Column, periods: int = 252) -> Column:
    """sqrt-annualization — reference `etl/portfolio_math.py:77-78`."""
    return daily_std * F.sqrt(F.lit(float(periods)))


def omega_gain(ret: Column, threshold: float = 0.0) -> Column:
    """Numerator term of the omega ratio — `etl/portfolio_math.py:540-600`."""
    return F.greatest(ret - F.lit(threshold), F.lit(0.0))


def omega_loss(ret: Column, threshold: float = 0.0) -> Column:
    return F.greatest(F.lit(threshold) - ret, F.lit(0.0))


def true_range(high: Column, low: Column, prev_close: Column) -> Column:
    """TR = max(H−L, |H−prevC|, |L−prevC|) — reference
    `models/time_series_signal_generator.py:2019-2047`.
    """
    return F.greatest(high - low, F.abs(high - prev_close), F.abs(low - prev_close))


def stable_hash(*cols: Column) -> Column:
    """Portable deterministic row hash: md5 of '|'-joined string forms.

    md5 produces identical hex in Spark and DuckDB, so derived pseudo-random
    assignments (bootstrap replicates, LSH bucketing) hash-match the oracle.
    Reference precedent: SHA-256 content hashes in
    `etl/checkpoint_manager.py:107-121`.
    """
    return F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))


def hash_unit_interval(*cols: Column) -> Column:
    """Deterministic value in [0, 1) derived from the first 6 hex digits of
    the md5 of the inputs. Used for portable seeded sampling — Spark's
    ``rand(seed)`` and DuckDB's RNG can never agree, a hash can.
    """
    return F.conv(F.substring(stable_hash(*cols), 1, 6), 16, 10).cast("double") / F.lit(
        float(16**6)
    )


def chi2_sf1(stat: Column) -> Column:
    """Survival function of χ²(1): P(X > stat) = erfc(√(stat/2)) — the
    p-value for one-dof likelihood-ratio tests (Kupiec POF,
    Christoffersen independence; reference `forcester_ts/var_backtest.py:
    81-198` emits decision-ready p-values via scipy).

    Neither Spark nor DuckDB ships erfc, so this is the Abramowitz &
    Stegun 7.1.26 rational approximation (|ε| ≤ 1.5e-7) — plain
    +,*,/,exp,sqrt arithmetic both engines evaluate the same way. Feed it
    the 6-DECIMAL-ROUNDED statistic (which already hash-matches across
    engines) so both sides start from bit-identical inputs. The SQL twin
    is ``chi2_sf1_sql``; keep the two formulas in lockstep."""
    t = 1.0 / (1.0 + 0.3275911 * F.sqrt(stat / 2.0))
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return poly * F.exp(-(stat / 2.0))


def chi2_sf1_sql(x: str) -> str:
    """DuckDB twin of ``chi2_sf1`` (same A&S 7.1.26 constants, same op
    order). ``x`` is substituted textually — pass a short column name."""
    t = f"(1.0 / (1.0 + 0.3275911 * SQRT(({x}) / 2.0)))"
    return (
        f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * (1.421413741 + "
        f"{t} * (-1.453152027 + {t} * 1.061405429)))) * EXP(-(({x}) / 2.0)))"
    )
