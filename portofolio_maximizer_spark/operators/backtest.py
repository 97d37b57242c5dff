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

from ..functions.scalars import round6_half_up

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

# LOB-fill mode adds the mids so per-trade slippage is auditable.
LOB_TRADES_SCHEMA = StructType(
    TRADES_SCHEMA.fields
    + [
        StructField("entry_mid", DoubleType()),
        StructField("exit_mid", DoubleType()),
    ]
)

# ``with_raw=True`` appends the full-precision per-trade state the
# staged-verification oracle's induction consumes (see
# plans/queries_models.paper_trading_trades): given these raws for
# EARLIER trades, every output column of the CURRENT trade is
# re-derivable from the raw bar series alone.
RAW_STATE_FIELDS = [
    StructField("shares_raw", DoubleType()),
    StructField("entry_fill_raw", DoubleType()),
    StructField("exit_fill_raw", DoubleType()),
    StructField("cash_before_raw", DoubleType()),
]


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
    # LOB fill model (reference execution/lob_simulator.py:12-19 defaults)
    lob_levels: int = 10
    lob_tick_bps: float = 1.0
    lob_alpha: float = 0.8
    lob_exhaust_levels: int = 25


def lob_vwap_fill(
    mid: np.ndarray,
    half_spread: np.ndarray,
    depth_notional: np.ndarray,
    shares: np.ndarray,
    side: int = 1,
    levels: int = 10,
    tick_bps: float = 1.0,
    alpha: float = 0.8,
    exhaust_levels: int = 25,
) -> np.ndarray:
    """Vectorized market-order VWAP against an exponential-depth ladder
    (reference `execution/lob_simulator.py:51-166`): the order starts at
    mid ± half_spread and walks ``levels`` price ticks, each holding an
    e^(-alpha·i) share of ``depth_notional``; whatever the book cannot
    absorb fills at a deep exhaust tail. All array ops — one call prices
    a whole batch of orders, no per-order Python loop.

    side=+1 buys (walks up), side=-1 sells (walks down, floored at one
    tick). Returns the per-order VWAP; buy VWAP ≥ start ≥ mid and the
    symmetric bound for sells (invariant-tested).
    """
    mid = np.asarray(mid, dtype=float)
    hs = np.abs(np.asarray(half_spread, dtype=float))
    depth = np.asarray(depth_notional, dtype=float)
    req = np.asarray(shares, dtype=float)

    # tick fallback ONLY where tick <= 0 (reference lob_simulator.py:104-107)
    # — a configured tick_bps below 1.0 must not be silently floored away.
    tick = mid * tick_bps / 1e4
    tick = np.where(tick <= 0, np.maximum(1e-9, mid * 1e-4), tick)
    start = np.maximum(mid + side * hs, tick)

    w = np.exp(-alpha * np.arange(levels))
    w = w / w.sum()
    # price and share depth at each ladder level: (n_orders, levels)
    px = start[:, None] + side * np.arange(levels)[None, :] * tick[:, None]
    px = np.maximum(px, tick[:, None])
    avail = depth[:, None] * w[None, :] / px
    cum_before = np.concatenate(
        [np.zeros((len(mid), 1)), np.cumsum(avail, axis=1)[:, :-1]], axis=1
    )
    filled = np.clip(req[:, None] - cum_before, 0.0, avail)
    cost = (filled * px).sum(axis=1)
    # exhaust tail: residual fills max(levels, exhaust_levels) ticks out
    remaining = np.maximum(req - filled.sum(axis=1), 0.0)
    tail_px = np.maximum(
        start + side * max(levels, exhaust_levels) * tick, tick
    )
    cost = cost + remaining * tail_px
    vwap = np.where(req > 0, cost / np.where(req > 0, req, 1.0), start)
    # no book at all → fill at the start price (reference's depth_total<=0
    # early return, lob_simulator.py:117-125), not the exhaust tail
    return np.where(depth > 0, vwap, start)


def simulate_trades(
    series: DataFrame,
    config: BacktestConfig | None = None,
    key: str = "user_id",
    order_col: str = "rn",
    value_col: str = "value",
    half_spread_col: str | None = None,
    depth_col: str | None = None,
    with_raw: bool = False,
) -> DataFrame:
    """Run the stateful per-key simulation; returns the trades table.

    With ``half_spread_col`` + ``depth_col`` set, entries and exits fill
    at the LOB ladder VWAP (``lob_vwap_fill``) instead of the bar price —
    the reference's depth-walk fill model (`execution/lob_simulator.py:
    51-166` wired through `execution/paper_trading_engine.py`); exit
    TRIGGERS (stop/target/ratchet) still evaluate on the mid, as the
    reference does. The output then carries ``entry_mid``/``exit_mid``
    so slippage is auditable per trade.

    ``with_raw=True`` appends ``RAW_STATE_FIELDS`` — the UNROUNDED
    shares / entry fill / exit fill / cash-before values — so a
    staged-verification oracle can unroll the per-key cash recursion
    (each trade's sizing depends only on strictly-earlier trades' raws).
    """
    cfg = config or BacktestConfig()
    lob = half_spread_col is not None and depth_col is not None
    schema = LOB_TRADES_SCHEMA if lob else TRADES_SCHEMA
    if with_raw:
        schema = StructType(list(schema.fields) + RAW_STATE_FIELDS)

    def run(cols_np: dict) -> list[tuple]:
        order = np.argsort(cols_np[order_col], kind="stable")
        px = cols_np[value_col][order].astype(float)
        rn = cols_np[order_col][order]
        uid = int(cols_np[key][0])
        if lob:
            hs_arr = cols_np[half_spread_col][order].astype(float)
            dp_arr = cols_np[depth_col][order].astype(float)

        def fill(i: int, shares: float, side: int) -> float:
            if not lob:
                return float(px[i])
            return float(
                lob_vwap_fill(
                    px[i : i + 1],
                    hs_arr[i : i + 1],
                    dp_arr[i : i + 1],
                    np.array([shares]),
                    side=side,
                    levels=cfg.lob_levels,
                    tick_bps=cfg.lob_tick_bps,
                    alpha=cfg.lob_alpha,
                    exhaust_levels=cfg.lob_exhaust_levels,
                )[0]
            )

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
        entry_cash_before = cfg.initial_cash
        ratchets = 0
        trades = []

        # fills are tie-PRONE (6dp-quantized mids × finite-decimal spread
        # factors land on exact .5e-6 midpoints) — the shared half-up
        # helper is the same formula the oracle SQL uses
        r6half = round6_half_up

        def close(i: int, reason: str) -> None:
            nonlocal cash, pos_shares, entry_i, ratchets
            exit_px = fill(i, pos_shares, -1)
            pnl = (exit_px - entry_px) * pos_shares
            cash += pos_shares * exit_px
            row = (
                uid,
                int(rn[entry_i]),
                int(rn[i]),
                r6half(entry_px),
                r6half(exit_px),
                round(pos_shares, 6),
                round(float(pnl), 6),
                reason,
                int(i - entry_i),
                ratchets,
            )
            if lob:
                row = row + (round(float(px[entry_i]), 6), round(float(px[i]), 6))
            if with_raw:
                row = row + (
                    float(pos_shares),
                    float(entry_px),
                    float(exit_px),
                    float(entry_cash_before),
                )
            trades.append(row)
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
                    # requested shares priced at mid (reference order_value
                    # semantics); the fill VWAP walks the ladder, so the
                    # cash outlay exceeds `spend` by exactly the slippage
                    entry_cash_before = cash
                    pos_shares = spend / px[i]
                    entry_px = fill(i, pos_shares, +1)
                    cash -= pos_shares * entry_px
                    entry_i = i
                    stop = entry_px - cfg.stop_atr * atr[i]
                    target = entry_px + cfg.target_atr * atr[i]
                    ratchets = 0
        return trades

    from .arrowgroup import grouped_numpy

    return grouped_numpy(series, [key], schema, run)


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
    with_raw_fill: bool = False,
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
    schema = PORTFOLIO_SCHEMA
    if with_raw_fill:
        schema = StructType(
            list(PORTFOLIO_SCHEMA.fields) + [StructField("fill_raw", DoubleType())]
        )
    cols = [f.name for f in schema]

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
        if with_raw_fill:
            # full-precision fill for the staged-verification oracle: the
            # ledger recursion unrolls into a prefix sum over staged
            # earlier fills, so each trade's fill is re-derivable
            out["fill_raw"] = fill
        return out[cols]

    from pyspark.sql import functions as F

    return (
        trades.withColumn("__pool", F.lit(0))
        .groupBy("__pool")
        .applyInPandas(lambda _, pdf: run(pdf.drop(columns="__pool")), schema)
    )


def backtest_summary(trades: DataFrame) -> DataFrame:
    """Second pass: portfolio rollup over the trades table — pure
    relational (A4 shape), runs at any scale."""
    from pyspark.sql import functions as F

    p = F.col("realized_pnl")
    # Money sums through DECIMAL(28,6) (SURVEY §7.3 item 6, the
    # q1/q3/q5 convention): realized_pnl is 6-dp by construction
    # (np.round(..., 6) in the simulation kernel), so the decimal sum is
    # EXACT and order-independent. The double formulation was partial-
    # aggregation-order dependent and sat on a 6th-decimal rounding
    # boundary at sf0.01 (avg_pnl 18559.1995565): any change to the
    # staged file layout — like the round-13 fit fan-out — re-rolled the
    # merge order and flipped the rounding vs the oracle. The oracle SQL
    # carries the same decimal sums, so both engines now compute the
    # identical double before rounding.
    pdec = p.cast("decimal(28,6)")
    n = F.count(F.lit(1))
    return trades.groupBy("exit_reason").agg(
        n.alias("n_trades"),
        F.round(F.sum(pdec).cast("double"), 6).alias("total_pnl"),
        F.round(F.sum(pdec).cast("double") / n, 6).alias("avg_pnl"),
        F.round(F.avg((p > 0).cast("double")), 6).alias("win_rate"),
        F.round(F.avg("bars_held"), 6).alias("avg_bars_held"),
        F.sum("stop_ratchets").alias("total_ratchets"),
    )
