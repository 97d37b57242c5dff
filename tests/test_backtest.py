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


# ---------------------------------------------------------------------------
# Shared-cash portfolio reconciliation (reference paper_trading_engine.py:
# 1409-1580 — one cash pool across tickers)
# ---------------------------------------------------------------------------


def _trades_df(spark, rows):
    cols = [
        "user_id", "entry_rn", "exit_rn", "entry_price", "exit_price",
        "shares", "realized_pnl", "exit_reason", "bars_held", "stop_ratchets",
    ]
    pdf = pd.DataFrame(rows, columns=cols)
    from portofolio_maximizer_spark.operators.backtest import TRADES_SCHEMA

    return spark.createDataFrame(pdf, TRADES_SCHEMA)


def test_portfolio_ample_cash_passthrough(spark):
    from portofolio_maximizer_spark.operators.backtest import reconcile_portfolio_cash

    rows = [
        (1, 0, 5, 100.0, 110.0, 10.0, 100.0, "target", 5, 0),
        (2, 1, 6, 50.0, 45.0, 20.0, -100.0, "stop", 5, 0),
    ]
    out = reconcile_portfolio_cash(_trades_df(spark, rows), 1e9).toPandas()
    assert (out.fill_ratio == 1.0).all()
    assert np.allclose(out.filled_shares, out.requested_shares)
    assert np.allclose(sorted(out.realized_pnl), [-100.0, 100.0])


def test_portfolio_constrained_entry_scales(spark):
    from portofolio_maximizer_spark.operators.backtest import reconcile_portfolio_cash

    # pool = 1500: first entry costs 1000, second requests 1000 but only
    # 500 remains → fill_ratio 0.5
    rows = [
        (1, 0, 10, 100.0, 110.0, 10.0, 100.0, "target", 10, 0),
        (2, 1, 11, 100.0, 90.0, 10.0, -100.0, "stop", 10, 0),
    ]
    out = (
        reconcile_portfolio_cash(_trades_df(spark, rows), 1500.0)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out.fill_ratio.tolist() == [1.0, 0.5]
    assert out.filled_shares.tolist() == [10.0, 5.0]
    assert out.realized_pnl.tolist() == [100.0, -50.0]


def test_portfolio_exit_frees_cash_before_same_bar_entry(spark):
    from portofolio_maximizer_spark.operators.backtest import reconcile_portfolio_cash

    # trade A exits at bar 5; trade B enters at bar 5 — the exit's proceeds
    # must fund B fully (reference settles exits first)
    rows = [
        (1, 0, 5, 100.0, 120.0, 10.0, 200.0, "target", 5, 0),
        (2, 5, 9, 100.0, 110.0, 12.0, 120.0, "target", 4, 0),
    ]
    out = (
        reconcile_portfolio_cash(_trades_df(spark, rows), 1000.0)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # A spends the full 1000; at bar 5 its exit credits 1200 before B's
    # 1200-cost entry is funded
    assert out.fill_ratio.tolist() == [1.0, 1.0]


def test_portfolio_cash_never_negative(spark, sf_dir):
    from portofolio_maximizer_spark.operators.backtest import (
        reconcile_portfolio_cash,
        simulate_trades,
    )
    from portofolio_maximizer_spark.plans.queries_stats import _series

    s = _series(spark, sf_dir).select("user_id", "rn", "value")
    out = reconcile_portfolio_cash(simulate_trades(s), 5_000.0).toPandas()
    if len(out):
        assert (out.cash_after_entry >= -1e-6).all()
        assert (out.fill_ratio <= 1.0 + 1e-12).all()
        assert (out.fill_ratio >= 0.0).all()
        # every fill is pro-rata: filled = requested * ratio (both sides
        # independently rounded to 6dp → tolerance scales with shares)
        tol = 1e-6 * np.maximum(out.requested_shares.to_numpy(), 1.0) + 1e-6
        assert (
            np.abs(out.filled_shares - out.requested_shares * out.fill_ratio) <= tol
        ).all()


# ---------------------------------------------------------------------------
# LOB VWAP fill model (reference execution/lob_simulator.py:51-166)
# ---------------------------------------------------------------------------


def _run_lob(spark, prices, half_spread, depth, cfg=CFG):
    pdf = pd.DataFrame(
        {
            "user_id": 1,
            "rn": range(len(prices)),
            "value": [float(p) for p in prices],
            "half_spread": [float(h) for h in half_spread],
            "depth_notional": [float(d) for d in depth],
        }
    )
    from portofolio_maximizer_spark.operators.backtest import simulate_trades

    return simulate_trades(
        spark.createDataFrame(pdf),
        cfg,
        half_spread_col="half_spread",
        depth_col="depth_notional",
    ).toPandas()


def test_lob_fill_diverges_from_mid_under_wide_spread(spark):
    prices = [100] * 6 + [110, 118, 126, 134, 142, 150, 120]
    n = len(prices)
    out = _run_lob(spark, prices, [p * 0.01 for p in prices], [1e6] * n)
    assert len(out) >= 1
    t = out.iloc[0]
    # wide spread: buy fills above mid, sell fills below mid
    assert t.entry_price > t.entry_mid
    assert t.exit_price < t.exit_mid
    # 1% half-spread → at least ~100bps adverse on each side
    assert (t.entry_price - t.entry_mid) / t.entry_mid >= 0.009


def test_lob_slippage_bounded_by_exhaust_tail(spark):
    import numpy as np

    from portofolio_maximizer_spark.operators.backtest import lob_vwap_fill

    mid = np.array([100.0])
    hs = np.array([0.05])
    # book far too thin for the order: most fills at the exhaust tail
    vwap = lob_vwap_fill(mid, hs, np.array([500.0]), np.array([1000.0]), side=1)
    start = 100.05
    tick = 100.0 * 1e-4
    tail = start + 25 * tick
    assert start < vwap[0] <= tail
    # sell side: symmetric, floored at one tick
    vs = lob_vwap_fill(mid, hs, np.array([500.0]), np.array([1000.0]), side=-1)
    assert (start_s := 100.0 - 0.05) > vs[0] >= start_s - 25 * tick


def test_lob_zero_spread_deep_book_equals_bar_fill(spark):
    """With zero spread and a bottomless book the LOB path must reproduce
    the plain bar-price simulation (back-compat equivalence)."""
    prices = [100] * 6 + [110, 118, 126, 134, 142, 150, 120]
    n = len(prices)
    base = _run(spark, prices)
    lob = _run_lob(spark, prices, [0.0] * n, [1e12] * n)
    assert len(base) == len(lob)
    for c in ["entry_rn", "exit_rn", "shares", "exit_reason"]:
        assert list(base[c]) == list(lob[c])
    # VWAP of level-0-only fill at zero spread == mid == bar price (the
    # only residue is the first level's tick rounding at float precision)
    assert np.allclose(base.entry_price, lob.entry_price, rtol=1e-9)
    assert np.allclose(base.exit_price, lob.exit_price, rtol=1e-9)


def test_lob_vwap_vectorized_matches_scalar_walk(spark):
    """The vectorized ladder walk must equal an independent per-order
    scalar reimplementation of the reference algorithm."""
    import math

    import numpy as np

    from portofolio_maximizer_spark.operators.backtest import lob_vwap_fill

    rng = np.random.default_rng(5)
    n = 50
    mid = rng.uniform(10, 500, n)
    hs = mid * rng.uniform(0, 0.01, n)
    depth = rng.uniform(1e3, 1e6, n)
    shares = rng.uniform(1, 5000, n)
    got = lob_vwap_fill(mid, hs, depth, shares, side=1)

    levels, alpha, tick_bps, exhaust = 10, 0.8, 1.0, 25
    w = [math.exp(-alpha * i) for i in range(levels)]
    W = sum(w)
    for j in range(n):
        tick = max(mid[j] * tick_bps / 1e4, max(1e-9, mid[j] * 1e-4))
        start = max(mid[j] + hs[j], tick)
        remaining, cost = shares[j], 0.0
        for i in range(levels):
            if remaining <= 0:
                break
            px = start + i * tick
            avail = depth[j] * (w[i] / W) / px
            fill = min(remaining, avail)
            remaining -= fill
            cost += fill * px
        if remaining > 0:
            cost += remaining * (start + max(levels, exhaust) * tick)
        assert abs(got[j] - cost / shares[j]) < 1e-9 * max(1.0, cost / shares[j])


def test_lob_sub_bps_tick_honored_and_zero_depth_fills_at_start():
    """Reference parity (lob_simulator.py:104-125): tick_bps below 1.0 must
    change the ladder spacing (no silent 1bp floor), and a zero-depth book
    fills the whole order at the start price, not the exhaust tail."""
    import numpy as np

    from portofolio_maximizer_spark.operators.backtest import lob_vwap_fill

    mid = np.array([100.0])
    hs = np.array([0.05])
    depth = np.array([5000.0])
    shares = np.array([200.0])
    v_half_bp = lob_vwap_fill(mid, hs, depth, shares, side=1, tick_bps=0.5)
    v_one_bp = lob_vwap_fill(mid, hs, depth, shares, side=1, tick_bps=1.0)
    # tighter ticks → shallower walk → strictly better (lower) buy VWAP
    assert v_half_bp[0] < v_one_bp[0]
    # tick<=0 falls back to the 1bp-of-mid default
    v_zero_bp = lob_vwap_fill(mid, hs, depth, shares, side=1, tick_bps=0.0)
    assert np.isclose(v_zero_bp[0], v_one_bp[0])

    start = mid[0] + hs[0]
    v_dry = lob_vwap_fill(mid, hs, np.array([0.0]), shares, side=1)
    assert np.isclose(v_dry[0], start)


def test_paper_trading_coverage_no_violations(spark, sf_dir):
    """The F15 kernel must produce >=1 trade for EVERY eligible user
    (n >= 21 with a momentum crossing in [6, n-1]) and none for the
    ineligible — the coverage census's violation count pins the
    residual gap the per-trade induction oracle cannot see (a user
    whose trades are ALL missing has no staged rows to check)."""
    from portofolio_maximizer_spark.plans import QUERIES

    row = QUERIES["paper_trading_coverage"](spark, sf_dir).first()
    assert row.n_users > 0 and row.n_eligible > 0
    assert row.n_coverage_violations == 0, row
    assert row.first_violating_user is None
    assert row.n_with_trades == row.n_eligible


def test_lob_fills_clear_level_zero(spark, sf_dir):
    """_lob_fill_sql is bit-exact with lob_vwap_fill only for orders that
    fill within ladder level 0 (multi-level walks expose numpy-pairwise
    vs SQL-windowed summation ulps on tie-prone .5e-6 midpoints). Pin
    the precondition: every staged trade's requested shares fit within
    level-0 capacity on BOTH the entry (buy) and exit (sell) fill."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark.plans.queries_models import (
        _simulated_trades,
    )
    from portofolio_maximizer_spark.plans.queries_stats import _series

    w0 = 1.0 / sum(math.exp(-0.8 * j) for j in range(10))
    s = _series(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("rn")
    ret = F.coalesce(
        F.least(
            F.greatest(F.col("value") / F.lag("value").over(w) - 1, F.lit(-1.0)),
            F.lit(10.0),
        ),
        F.lit(0.0),
    )
    shock = F.greatest(F.abs(ret), F.lit(0.02))
    b = s.select(
        "user_id",
        "rn",
        F.col("value").alias("mid"),
        ((F.col("value") * 0.0005) * (1.0 + 20.0 * shock) / 2.0).alias("hs"),
        F.greatest(
            F.lit(1000000.0) * (1.0 - 15.0 * shock), F.lit(50000.0)
        ).alias("depth"),
    )
    t = _simulated_trades(spark, sf_dir).select(
        "user_id", "entry_rn", "exit_rn", "shares_raw"
    )

    def headroom(bar_rn, side):
        bb = b.alias("b")
        j = t.join(
            bb,
            (F.col("b.user_id") == t.user_id) & (F.col("b.rn") == bar_rn),
        )
        tick = F.col("b.mid") * 1.0 / 1e4
        start = F.greatest(F.col("b.mid") + side * F.col("b.hs"), tick)
        avail0 = F.col("b.depth") * w0 / start
        return j.select((avail0 / F.col("shares_raw")).alias("m")).agg(
            F.min("m")
        ).first()[0]

    entry_margin = headroom(t.entry_rn, +1)
    exit_margin = headroom(t.exit_rn, -1)
    assert entry_margin is not None and entry_margin > 1.0, entry_margin
    assert exit_margin is not None and exit_margin > 1.0, exit_margin
