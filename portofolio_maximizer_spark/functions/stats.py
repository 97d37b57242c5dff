"""Statistical aggregate expressions built from raw moments.

Spark's ``skewness``/``kurtosis`` are population (g1/g2) statistics while
DuckDB's are sample-adjusted — so the descriptive-stats surface (reference
`etl/time_series_analyzer.py:279-337`) is built here from explicit moment
sums. The same closed forms run identically on both engines, which is what
makes the DuckDB differential oracle hash-stable.

Everything is a plain aggregate Column (JVM-side, codegen'd); nothing here
shuffles more than the enclosing groupBy already does, and every moment is
computed in one pass (partial aggregation map-side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _moments(x: Column) -> tuple[Column, Column, Column, Column, Column]:
    n = F.count(x).cast("double")
    m1 = F.avg(x)
    m2 = F.avg(x * x)
    m3 = F.avg(x * x * x)
    m4 = F.avg(x * x * x * x)
    return n, m1, m2, m3, m4


def pop_variance(x: Column) -> Column:
    _, m1, m2, _, _ = _moments(x)
    return m2 - m1 * m1


def skewness_g1(x: Column) -> Column:
    """Population skewness g1 = E[(x-μ)³] / σ³ from raw moments."""
    _, m1, m2, m3, _ = _moments(x)
    var = m2 - m1 * m1
    mu3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    return mu3 / F.pow(var, 1.5)


def kurtosis_g2(x: Column) -> Column:
    """Population excess kurtosis g2 = E[(x-μ)⁴]/σ⁴ − 3 from raw moments."""
    _, m1, m2, m3, m4 = _moments(x)
    var = m2 - m1 * m1
    mu4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, F.lit(4.0))
    return mu4 / (var * var) - F.lit(3.0)


def jarque_bera(x: Column) -> Column:
    """JB = n/6 · (S² + K²/4) from the moment-based S and K — reference
    `etl/time_series_analyzer.py:323-333`.
    """
    n = F.count(x).cast("double")
    s = skewness_g1(x)
    k = kurtosis_g2(x)
    return n / 6.0 * (s * s + k * k / 4.0)


def sharpe(ret: Column, periods: int = 252) -> Column:
    """Annualized Sharpe — reference `etl/portfolio_math.py:84-210`."""
    import math

    return F.avg(ret) / F.stddev_samp(ret) * F.lit(math.sqrt(periods))


def sortino(ret: Column, periods: int = 252) -> Column:
    """Annualized Sortino: mean / downside-std (negative returns only)."""
    import math

    downside = F.stddev_samp(F.when(ret < 0, ret))
    return F.avg(ret) / downside * F.lit(math.sqrt(periods))
