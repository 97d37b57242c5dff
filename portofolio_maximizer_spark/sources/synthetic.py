"""S4 — seeded synthetic OHLCV generator, fully native (no driver numpy).

Reference: `etl/synthetic_extractor.py:424-681` — seeded GBM /
regime-switching multi-asset bar generator with microstructure columns.
Here the whole generator is column expressions over ``spark.range``:

- gaussian shocks via Box-Muller on md5-hash uniforms (deterministic,
  portable, partition-layout independent — `functions/scalars.py`);
- GBM log-price = cumulative sum of drift+shock over an ordered window;
- OHLC carved from consecutive closes, volume/spread from further hashes.

``spark.range(n)`` is an embarrassingly parallel source: generating 10^12
bars shards across executors with no driver involvement — the pattern the
reference's single-process numpy loop cannot reach.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import hash_unit_interval

TWO_PI = 2.0 * math.pi


def gaussian_hash(*cols) -> "F.Column":
    """Standard normal via Box-Muller over two independent hash uniforms."""
    u1 = hash_unit_interval(F.lit("u1"), *cols)
    u2 = hash_unit_interval(F.lit("u2"), *cols)
    # guard u1=0 (log(0)) — hash interval is [0,1), shift into (0,1]
    u1 = F.lit(1.0) - u1
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(TWO_PI) * u2)


def synthetic_bars(
    spark: SparkSession,
    tickers: list[str],
    n_bars: int,
    seed: int = 42,
    s0: float = 100.0,
    mu: float = 0.0002,
    sigma: float = 0.02,
) -> DataFrame:
    """Seeded multi-asset GBM bars: (ticker, bar_id, ts, open, high, low,
    close, volume, spread). Deterministic in (tickers, n_bars, seed)."""
    base = (
        spark.range(n_bars)
        .withColumnRenamed("id", "bar_id")
        .crossJoin(
            F.broadcast(
                spark.createDataFrame([(t,) for t in tickers], "ticker string")
            )
        )
    )
    z = gaussian_hash(F.lit(seed), F.col("ticker"), F.col("bar_id"))
    step = F.lit(mu - 0.5 * sigma * sigma) + F.lit(sigma) * z
    w = (
        Window.partitionBy("ticker")
        .orderBy("bar_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    logp = F.log(F.lit(s0)) + F.sum(step).over(w)
    bars = base.select(
        "ticker",
        "bar_id",
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("bar_id") * 86400  # daily from 2024-01-01
        ).alias("ts"),
        F.exp(logp).alias("close"),
    )
    wp = Window.partitionBy("ticker").orderBy("bar_id")
    prev_close = F.coalesce(F.lag("close").over(wp), F.lit(s0))
    u_hi = hash_unit_interval(F.lit(seed), F.lit("hi"), F.col("ticker"), F.col("bar_id"))
    u_lo = hash_unit_interval(F.lit(seed), F.lit("lo"), F.col("ticker"), F.col("bar_id"))
    u_vol = hash_unit_interval(F.lit(seed), F.lit("v"), F.col("ticker"), F.col("bar_id"))
    open_ = prev_close
    hi = F.greatest(open_, F.col("close")) * (1.0 + 0.01 * u_hi)
    lo = F.least(open_, F.col("close")) * (1.0 - 0.01 * u_lo)
    # reference microstructure column set (`etl/synthetic_extractor.py:
    # 459-467`: Spread/Depth/OrderImbalance/TxnCostBps/ImpactBps) from the
    # shared model — inst_vol/shock per the reference's gbm branch
    # (inst_vol = max(|ret|, σ), shock = the gaussian driving the bar)
    z2 = gaussian_hash(F.lit(seed), F.col("ticker"), F.col("bar_id"))
    step2 = F.lit(mu - 0.5 * sigma * sigma) + F.lit(sigma) * z2
    micro = microstructure_columns(
        F.col("close"),
        F.greatest(F.abs(step2), F.lit(sigma)),
        z2,
        F.lit(seed),
        F.col("ticker"),
        F.col("bar_id"),
    )
    return bars.select(
        "ticker",
        "bar_id",
        "ts",
        F.round(open_, 6).alias("open"),
        F.round(hi, 6).alias("high"),
        F.round(lo, 6).alias("low"),
        F.round("close", 6).alias("close"),
        (F.lit(100000) + (u_vol * 900000).cast("long")).alias("volume"),
        F.round(micro["spread"], 6).alias("spread"),
        F.round(micro["slippage"], 6).alias("slippage"),
        # feeds the LOB VWAP fill model in operators/backtest.py
        F.round(micro["depth"], 2).alias("depth_notional"),
        F.round(micro["order_imbalance"], 6).alias("order_imbalance"),
        F.round(micro["txn_cost_bps"], 6).alias("txn_cost_bps"),
        F.round(micro["impact_bps"], 6).alias("impact_bps"),
    )


def microstructure_columns(
    mid: "F.Column",
    inst_vol: "F.Column",
    shock: "F.Column",
    *seed_cols: "F.Column",
    regime_widen: "F.Column | None" = None,
    order_size: float = 1.0,
) -> dict[str, "F.Column"]:
    """The reference's microstructure model
    (`etl/synthetic_data/microstructure.py:7-42`) as pure column algebra —
    default config values baked in:

    - ``spread``    = mid · 5bps · (1 + 20·inst_vol) · regime_widen
    - ``slippage``  = mid · 3bps · (1 + 10·|shock| + 0.1·order_size)
    - ``depth``     = max(1e6 · (1 − 15·inst_vol), 50k)
    - ``order_imbalance`` = N(0, 0.15) + 0.8·shock   (hash gaussian)
    - ``txn_cost_bps``    = (spread + slippage)/mid · 1e4
    - ``impact_bps``      = max(0, slippage/max(depth, 1)) · 1e4

    Deterministic in ``seed_cols`` (imbalance noise is a hash gaussian),
    so any consumer — the bar generator, the LOB-fill trade sim — derives
    the SAME book state for the same row at any partitioning."""
    spread = mid * F.lit(5.0 / 10_000.0) * (1.0 + 20.0 * inst_vol)
    if regime_widen is not None:
        spread = spread * regime_widen
    slippage = (
        mid
        * F.lit(3.0 / 10_000.0)
        * (1.0 + 10.0 * F.abs(shock) + 0.1 * F.lit(order_size))
    )
    depth = F.greatest(
        F.lit(1_000_000.0) * (1.0 - 15.0 * inst_vol), F.lit(50_000.0)
    )
    imbalance = (
        0.15 * gaussian_hash(F.lit("imb"), *seed_cols) + 0.8 * shock
    )
    txn_cost_bps = (spread + slippage) / mid * 10_000.0
    impact_bps = (
        F.greatest(slippage / F.greatest(depth, F.lit(1.0)), F.lit(0.0))
        * 10_000.0
    )
    return {
        "spread": spread,
        "slippage": slippage,
        "depth": depth,
        "order_imbalance": imbalance,
        "txn_cost_bps": txn_cost_bps,
        "impact_bps": impact_bps,
    }
