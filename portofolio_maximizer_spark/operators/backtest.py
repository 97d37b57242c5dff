"""F15 — paper-trading execution simulation as a per-key stateful scan.

Reference: `execution/paper_trading_engine.py` (2030 LoC) — position
sizing (`:1040-1158`), exit evaluation with the trailing-stop ratchet
(`:1603-1767`, W22 `:1631-1663`), trade persistence. The path-dependent
state (open position, ratcheting stop) is inherently sequential per key —
SURVEY §7.3 item 1 — so each key runs as ONE ordered pandas scan inside
``applyInPandas``: sequential within a key, massively parallel across
keys. Portfolio-level rollups are a second, fully-relational pass over
the emitted trades (A4/`pnl_canonical_metrics` shape).

Strategy simulated (deterministic, config-driven):
- entry: k-bar momentum crosses above +threshold with no open position
  → buy ``size_frac`` of equity at next price;
- exits, checked per bar: hard stop (entry − stop_atr·ATR), trailing stop
  once profit ≥ ratchet_atr·ATR (stop ratchets to price − trail_atr·ATR,
  never down), target (entry + target_atr·ATR), time stop (max_hold
  bars), end-of-data liquidation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRADES_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("entry_rn", IntegerType()),
        StructField("exit_rn", IntegerType()),
        StructField("entry_price", DoubleType()),
        StructField("exit_price", DoubleType()),
        StructField("shares", DoubleType()),
        StructField("realized_pnl", DoubleType()),
        StructField("exit_reason", StringType()),
        StructField("bars_held", IntegerType()),
        StructField("stop_ratchets", IntegerType()),
    ]
)


@dataclass(frozen=True)
class BacktestConfig:
    momentum_k: int = 5
    entry_threshold: float = 0.02
    atr_k: int = 14
    stop_atr: float = 1.5
    target_atr: float = 3.0
    ratchet_atr: float = 1.0  # profit (in ATRs) that arms the trailing stop
    trail_atr: float = 1.0
    max_hold: int = 20
    size_frac: float = 0.25
    initial_cash: float = 10_000.0


def simulate_trades(
    series: DataFrame,
    config: BacktestConfig | None = None,
    key: str = "user_id",
    order_col: str = "rn",
    value_col: str = "value",
) -> DataFrame:
    """Run the stateful per-key simulation; returns the trades table."""
    cfg = config or BacktestConfig()

    def run(cols_np: dict) -> list[tuple]:
        order = np.argsort(cols_np[order_col], kind="stable")
        px = cols_np[value_col][order].astype(float)
        rn = cols_np[order_col][order]
        uid = int(cols_np[key][0])
        n = len(px)
        if n < cfg.momentum_k + cfg.atr_k + 2:
            return []

        adiff = np.abs(np.diff(px, prepend=px[0]))
        atr = pd.Series(adiff).rolling(cfg.atr_k, min_periods=1).mean().to_numpy()
        mom = np.full(n, np.nan)
        mom[cfg.momentum_k :] = px[cfg.momentum_k :] / px[: -cfg.momentum_k] - 1

        cash = cfg.initial_cash
        pos_shares = 0.0
        entry_i = -1
        entry_px = stop = target = 0.0
        ratchets = 0
        trades = []

        def close(i: int, reason: str) -> None:
            nonlocal cash, pos_shares, entry_i, ratchets
            pnl = (px[i] - entry_px) * pos_shares
            cash += pos_shares * px[i]
            trades.append(
                (
                    uid,
                    int(rn[entry_i]),
                    int(rn[i]),
                    round(entry_px, 6),
                    round(float(px[i]), 6),
                    round(pos_shares, 6),
                    round(float(pnl), 6),
                    reason,
                    int(i - entry_i),
                    ratchets,
                )
            )
            pos_shares = 0.0
            entry_i = -1
            ratchets = 0

        for i in range(n):
            if pos_shares > 0.0:
                # W22 ratchet: arm/raise the trailing stop on profit
                if px[i] - entry_px >= cfg.ratchet_atr * atr[entry_i]:
                    new_stop = px[i] - cfg.trail_atr * atr[entry_i]
                    if new_stop > stop:
                        stop = new_stop
                        ratchets += 1
                if px[i] <= stop:
                    close(i, "stop")
                elif px[i] >= target:
                    close(i, "target")
                elif i - entry_i >= cfg.max_hold:
                    close(i, "time")
                elif i == n - 1:
                    close(i, "liquidation")
            if (
                pos_shares == 0.0
                and i < n - 1
                and not np.isnan(mom[i])
                and mom[i] > cfg.entry_threshold
            ):
                equity = cash
                spend = equity * cfg.size_frac
                if spend > 0 and px[i] > 0:
                    pos_shares = spend / px[i]
                    cash -= spend
                    entry_i = i
                    entry_px = float(px[i])
                    stop = entry_px - cfg.stop_atr * atr[i]
                    target = entry_px + cfg.target_atr * atr[i]
                    ratchets = 0
        return trades

    from .arrowgroup import grouped_numpy

    return grouped_numpy(series, [key], TRADES_SCHEMA, run)


PORTFOLIO_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("entry_rn", IntegerType()),
        StructField("exit_rn", IntegerType()),
        StructField("entry_price", DoubleType()),
        StructField("exit_price", DoubleType()),
        StructField("requested_shares", DoubleType()),
        StructField("filled_shares", DoubleType()),
        StructField("fill_ratio", DoubleType()),
        StructField("realized_pnl", DoubleType()),
        StructField("exit_reason", StringType()),
        StructField("cash_before", DoubleType()),
        StructField("cash_after_entry", DoubleType()),
    ]
)


def reconcile_portfolio_cash(
    trades: DataFrame,
    portfolio_cash: float = 100_000.0,
) -> DataFrame:
    """Second pass over emitted trades: ONE shared cash pool across all keys
    (reference `execution/paper_trading_engine.py:1409-1580` shares a single
    portfolio cash balance across tickers, scaling orders the balance cannot
    fund).

    Entries and exits are replayed in global bar order (`entry_rn` /
    `exit_rn`, user_id tiebreak). Each entry may spend at most the current
    pool balance — a constrained entry is scaled down pro-rata
    (``fill_ratio < 1``) and its exit returns proportionally less. The pool
    is credited at each exit. Invariants: cash never negative; with ample
    cash the output trades equal the input trades (fill_ratio == 1).

    Scale note: this stage is inherently sequential (one global cash
    state), so it runs as a single ordered pandas scan — but its input is
    the *trades* table (orders of magnitude smaller than the bar table the
    per-key simulation scanned in parallel), which is exactly how the
    reference splits the work: parallel per-ticker simulation, then a
    small serial portfolio ledger replay.
    """
    cols = [f.name for f in PORTFOLIO_SCHEMA]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(["entry_rn", "user_id"]).reset_index(drop=True)
        n = len(pdf)
        uid = pdf.user_id.to_numpy()
        entry_rn = pdf.entry_rn.to_numpy()
        exit_rn = pdf.exit_rn.to_numpy()
        shares = pdf.shares.to_numpy(dtype=float)
        epx = pdf.entry_price.to_numpy(dtype=float)
        xpx = pdf.exit_price.to_numpy(dtype=float)
        # event list: (bar, kind, trade_idx); entries (kind=1) after exits
        # at the same bar would otherwise miss cash an exit frees that bar —
        # the reference settles exits first, so exits get kind=0.
        events = [(int(exit_rn[i]), 0, i) for i in range(n)] + [
            (int(entry_rn[i]), 1, i) for i in range(n)
        ]
        events.sort(key=lambda e: (e[0], e[1], uid[e[2]]))

        cash = float(portfolio_cash)
        fill = np.zeros(n)
        cash_before = np.zeros(n)
        cash_after = np.zeros(n)
        for _, kind, idx in events:
            if kind == 1:  # entry: fund as much as the pool allows
                cost = shares[idx] * epx[idx]
                cash_before[idx] = cash
                ratio = 1.0 if cost <= cash else (cash / cost if cost > 0 else 0.0)
                fill[idx] = ratio
                cash -= cost * ratio
                cash_after[idx] = cash
            else:  # exit: credit the funded fraction
                cash += fill[idx] * shares[idx] * xpx[idx]

        out = pd.DataFrame(
            {
                "user_id": pdf.user_id.astype("int64"),
                "entry_rn": pdf.entry_rn.astype("int32"),
                "exit_rn": pdf.exit_rn.astype("int32"),
                "entry_price": pdf.entry_price,
                "exit_price": pdf.exit_price,
                "requested_shares": pdf.shares,
                "filled_shares": np.round(shares * fill, 6),
                "fill_ratio": np.round(fill, 6),
                "realized_pnl": np.round((xpx - epx) * shares * fill, 6),
                "exit_reason": pdf.exit_reason,
                "cash_before": np.round(cash_before, 6),
                "cash_after_entry": np.round(cash_after, 6),
            }
        )
        return out[cols]

    from pyspark.sql import functions as F

    return (
        trades.withColumn("__pool", F.lit(0))
        .groupBy("__pool")
        .applyInPandas(lambda _, pdf: run(pdf.drop(columns="__pool")), PORTFOLIO_SCHEMA)
    )


def backtest_summary(trades: DataFrame) -> DataFrame:
    """Second pass: portfolio rollup over the trades table — pure
    relational (A4 shape), runs at any scale."""
    from pyspark.sql import functions as F

    p = F.col("realized_pnl")
    return trades.groupBy("exit_reason").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.sum(p), 6).alias("total_pnl"),
        F.round(F.avg(p), 6).alias("avg_pnl"),
        F.round(F.avg((p > 0).cast("double")), 6).alias("win_rate"),
        F.round(F.avg("bars_held"), 6).alias("avg_bars_held"),
        F.sum("stop_ratchets").alias("total_ratchets"),
    )
