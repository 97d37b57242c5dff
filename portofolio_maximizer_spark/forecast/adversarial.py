"""Adversarial scenario generators — deterministic synthetic market regimes.

Reproduces the stress matrix of the reference's adversarial forecaster
suite (`scripts/run_adversarial_forecaster_suite.py:120-226`): six RMSE
scenarios (trend_seasonal, random_walk, regime_shift, vol_cluster,
jump_shock, mean_reversion_break) plus four barbell scenarios
(ngn_high_inflation, asymmetric_vol, fat_tail_crash, crisis_recovery),
each generated per (scenario, seed) from `numpy.random.default_rng(seed)`
so every run of the suite sees the identical price paths.

Spark shape: the 50-cell (scenario × seed) spec is a tiny DataFrame and
each cell's series is generated inside one Arrow-batched
``applyInPandas`` group — the generation itself is a bounded diagnostic
workload (50 × 320 points) independent of data scale; downstream metric
derivation is ordinary window/column algebra over the staged series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: the reference suite's deterministic matrix
RMSE_SCENARIOS = [
    "trend_seasonal",
    "random_walk",
    "regime_shift",
    "vol_cluster",
    "jump_shock",
    "mean_reversion_break",
]
BARBELL_SCENARIOS = [
    "ngn_high_inflation",
    "asymmetric_vol",
    "fat_tail_crash",
    "crisis_recovery",
]
SCENARIOS = RMSE_SCENARIOS + BARBELL_SCENARIOS
SEEDS = [101, 202, 303, 404, 505]
N_POINTS = 320          # DEFAULT_POINTS
HORIZON = 20            # DEFAULT_HORIZON
TRAIN_N = N_POINTS - HORIZON

SERIES_SCHEMA = "scenario string, seed int, t int, y double"


def gen_scenario(kind: str, n: int, seed: int) -> np.ndarray:
    """One synthetic price path (reference `gen_series`, `:122-226`).

    Recursions (GARCH-style vol clustering, AR mean reversion,
    multiplicative crisis walk) draw a standard-normal vector once and
    scale it through the recursion — deterministic per (kind, seed).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=float)

    if kind == "trend_seasonal":
        return (
            100.0
            + 0.18 * t
            + 3.5 * np.sin(2.0 * np.pi * t / 14.0)
            + rng.normal(0.0, 0.6, n)
        )
    if kind == "random_walk":
        return 100.0 * np.exp(np.cumsum(rng.normal(0.0002, 0.012, n)))
    if kind == "regime_shift":
        half = n // 2
        up = 100.0 + 0.22 * np.arange(half) + rng.normal(0.0, 0.4, half)
        k = np.arange(n - half, dtype=float)
        down = (
            up[-1]
            - 0.35 * k
            + 2.8 * np.sin(2.0 * np.pi * k / 9.0)
            + rng.normal(0.0, 1.2, n - half)
        )
        return np.concatenate([up, down])
    if kind == "vol_cluster":
        z = rng.normal(0.0, 1.0, n)
        eps = np.zeros(n)
        sig = 0.007
        for i in range(1, n):
            sig = np.sqrt(0.000002 + 0.12 * eps[i - 1] ** 2 + 0.84 * sig**2)
            eps[i] = 0.0001 + sig * z[i]
        return 100.0 * np.exp(np.cumsum(eps))
    if kind == "jump_shock":
        rets = rng.normal(0.00015, 0.01, n)
        at = rng.choice(np.arange(25, n - 25), size=6, replace=False)
        rets[at] += rng.choice([-0.08, -0.06, 0.06, 0.08], size=6)
        return 100.0 * np.exp(np.cumsum(rets))
    if kind == "mean_reversion_break":
        half = n // 2
        z = rng.normal(0.0, 1.0, n)
        x = np.zeros(n)
        x[0] = 100.0
        for i in range(1, half):
            x[i] = x[i - 1] + 0.18 * (102.0 - x[i - 1]) + 0.55 * z[i]
        for i in range(half, n):
            x[i] = x[i - 1] + 0.28 + 0.95 * z[i]
        return x
    if kind == "ngn_high_inflation":
        return 100.0 * np.exp(np.cumsum(rng.normal(0.0012, 0.018, n)))
    if kind == "asymmetric_vol":
        z = rng.normal(0.0, 1.0, n)
        eps = np.zeros(n)
        sig = 0.012
        for i in range(1, n):
            neg = min(eps[i - 1], 0.0)
            sig = np.sqrt(
                max(1e-8, 0.00001 + 0.25 * neg**2 + 0.70 * sig**2)
            )
            eps[i] = 0.0001 + sig * z[i]
        return 100.0 * np.exp(np.cumsum(eps))
    if kind == "fat_tail_crash":
        rets = rng.normal(0.00015, 0.010, n)
        start = n // 3
        rets[start : start + 3] += rng.choice([-0.12, -0.10, -0.08])
        return 100.0 * np.exp(np.cumsum(rets))
    if kind == "crisis_recovery":
        third = n // 3
        z = rng.normal(0.0, 1.0, n)
        p = np.zeros(n)
        p[0] = 100.0
        for i in range(1, n):
            mu, sd = (-0.005, 0.015) if i < third else (0.008, 0.015)
            p[i] = p[i - 1] * (1.0 + mu + sd * z[i])
        return np.maximum(p, 1.0)
    raise ValueError(f"unknown scenario: {kind}")


def scenario_series_table(spark: SparkSession) -> DataFrame:
    """The full (scenario × seed) series matrix as long rows
    (scenario, seed, t, y) — one applyInPandas group per cell."""
    spec = spark.createDataFrame(
        [(s, sd) for s in SCENARIOS for sd in SEEDS],
        "scenario string, seed int",
    )

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        kind = pdf["scenario"].iloc[0]
        seed = int(pdf["seed"].iloc[0])
        y = gen_scenario(kind, N_POINTS, seed)
        return pd.DataFrame(
            {
                "scenario": kind,
                "seed": seed,
                "t": np.arange(N_POINTS, dtype=np.int32),
                "y": y.astype(np.float64),
            }
        )

    return spec.groupBy("scenario", "seed").applyInPandas(gen, SERIES_SCHEMA)
