"""Risk-layer operators — the reference's `risk/` module re-expressed as
DataFrame algebra, plus the real-time portfolio monitor and the shared
residual / promotion / warm-start helpers the risk query pack wires to
tables.

Reference surfaces covered:
- `risk/barbell_policy.py:90-190` — bucket weights + projection of a raw
  weight vector into the barbell-feasible region (risk cap, per-bucket
  caps, safe-minimum redistribution, renormalisation).
- `risk/barbell_sizing.py:129-356` — bucket classification, per-bucket
  confidence multipliers, regime multipliers, soft-cap ratio penalties
  over market context (cost/gap/funding/liquidity/leverage), and the
  binary path-risk audit.
- `risk/nav_allocator.py:35-76` — NAV bucket budgets (base/min/max NAV
  fractions) re-distributed to symbols within each bucket.
- `risk/real_time_risk_manager.py:102-331` — drawdown / daily-loss /
  volatility / VaR monitoring with severity-tiered alerts.
- `risk/barbell_promotion_gate.py:248-428` — threshold checks over a
  two-arm (baseline vs barbell-sized) metrics report -> promote verdict.
- `forcester_ts/residual_diagnostics.py:19-98` — Ljung-Box + Jarque-Bera
  white-noise verdict on model residuals.
- `forcester_ts/order_learner.py:233-323` — warm-start order suggestion
  with the exact-regime -> global -> population fallback ladder and the
  skip-grid decision.

Scale notes: every projection / sizing step is column algebra over an
already-aggregated frame (segments x symbols, or per-key summaries), so
after the single fact-table shuffle the windows run on a bounded frame.
The only global window is the promotion gate's cumulative-PnL ledger,
which is the same inherently-sequential shape as `user_drawdown` /
`reconcile_portfolio_cash` (see `operators/windows.py:168` for the
two-pass running-sum scale path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Configuration constants — mirrors of /root/reference/config/barbell.yml
# (bucket multipliers, regime multipliers, soft caps, floors) with the
# bucket symbol lists and cap levels chosen so every projection branch is
# exercised at TPC-H value weights (documented per-constant below). The
# SAME constants are interpolated into the DuckDB oracle SQL in
# plans/queries_risk.py, so Spark and oracle can never drift.
# ---------------------------------------------------------------------------

# Symbol universe = the testdata's synthetic nations (3 safe / 3 core /
# 2 spec, mirroring the reference's 3/3/2 bucket lists in barbell.yml).
SAFE_SYMBOLS = ("NATION_0", "NATION_1", "NATION_2")
CORE_SYMBOLS = ("NATION_3", "NATION_4", "NATION_5")
SPEC_SYMBOLS = ("NATION_6", "NATION_7")

# Cap levels (reference defaults are safe_min=0.75/risk_max=1.0 from the
# yml; here risk_max/spec_max are tightened and safe_min loosened so that
# at ~4%-per-nation TPC-H weights the risk-scale, spec-cap AND safe-boost
# branches all fire — the branch *logic* is the reference's, verbatim).
RISK_MAX = 0.15
CORE_MAX = 0.20
SPEC_MAX = 0.04
SAFE_MIN = 0.40

BUCKET_MULT = {"safe": 1.00, "core": 0.90, "spec": 0.80, "other": 0.85}

REGIME_MULT = {
    "LIQUID_RANGEBOUND": {"safe": 1.00, "core": 0.92, "spec": 0.82},
    "MODERATE_TRENDING": {"safe": 1.00, "core": 0.96, "spec": 0.86},
    "HIGH_VOL_TRENDING": {"safe": 1.00, "core": 0.84, "spec": 0.70},
    "CRISIS": {"safe": 1.00, "core": 0.72, "spec": 0.55},
}

EDGE_CAPS = {
    "roundtrip_cost_to_edge": 0.35,
    "gap_risk_to_edge": 0.75,
    "funding_to_edge": 0.25,
    "liquidity_to_depth": 0.10,
}
FLOORS = {
    "cost": 0.55,
    "gap": 0.50,
    "funding": 0.70,
    "liquidity": 0.65,
    "leverage": 0.60,
}

# NAV bucket budgets (risk/nav_allocator.py:23-32 shape; values chosen so
# base/min/max clamps all bind somewhere across the five TPC-H segments).
NAV_BASE = {"safe": 0.60, "core": 0.25, "spec": 0.10, "other": 0.05}
NAV_MIN = {"safe": 0.50, "core": 0.05, "spec": 0.02, "other": 0.00}
NAV_MAX = {"safe": 0.90, "core": 0.30, "spec": 0.12, "other": 0.08}

# Real-time risk manager thresholds (real_time_risk_manager.py:67-86).
MAX_DRAWDOWN = 0.15
WARNING_DRAWDOWN = 0.10
MAX_DAILY_LOSS = 0.05
VOLATILITY_THRESHOLD = 0.40
# scipy.stats.norm.ppf(0.05) — hardcoded so both engines share the literal.
Z_05 = -1.6448536269514722

# Warm-start skip-grid coverage fraction (order_learner.py:283-323's
# min-observations rule; 0.7 so the two staged fit windows — 1/2 and 3/4
# of the series — land on opposite sides of the threshold).
SKIP_FRACTION = 0.7

# Promotion gate thresholds (barbell_promotion_gate.py:248-428 defaults).
MIN_TOTAL_TRADES = 30
MIN_LOSING_TRADES = 5
MIN_PAYOFF_ASYMMETRY = 1.10
MAX_WINNER_CONCENTRATION = 0.60

# Omega antifragility constants (`etl/portfolio_math.py:528-1032`): the
# NGN-calibrated daily hurdle (28% annual inflation + 3% P2P friction,
# compounded to daily over 252 trading days), the execution-drag add-on
# for the cost-adjusted rung, the finite cap standing in for infinite
# omega (the reference's score arithmetic caps at 100; its bootstrap
# uses a 1e6 sentinel), and the anti-omega gate thresholds.
TRADING_DAYS = 252
NGN_ANNUAL_INFLATION = 0.28
NGN_P2P_FRICTION = 0.03
DAILY_NGN_THRESHOLD = (
    (1.0 + NGN_ANNUAL_INFLATION + NGN_P2P_FRICTION) ** (1.0 / TRADING_DAYS) - 1.0
)
EXECUTION_DRAG = 0.0005
OMEGA_CAP = 100.0
OMEGA_INF_SENTINEL = 1.0e6
CLIFF_DROP_MAX = 0.60
ES_TAIL_PCT = 0.10
ES_EDGE_BOUND = 10.0
TRIM_FRACTION = 0.10
MIN_WINS = 3
MIN_LOSSES = 3

# Stress scenarios (portfolio_math.py:488-540 shape: additive daily
# shocks) and Sharpe risk-free rate; Kelly fat-tail params (:1033-1082).
DEFAULT_RISK_FREE_RATE = 0.02
STRESS_SCENARIOS = {
    "baseline": 0.0,
    "mild_selloff": -0.005,
    "moderate_selloff": -0.01,
    "crisis": -0.03,
    "melt_up": 0.01,
}
KELLY_LAMBDA = 0.25
KELLY_CAP = 0.20
KELLY_MIN_STAKE = 0.01
KELLY_MIN_OBS = 30

# Order-manager pre-trade gate (execution/order_manager.py:105-378
# defaults; max_trades_per_day tightened from 25 to 3 so the daily
# circuit breaker actually fires at events-table signal density, same
# rationale as the barbell cap levels). Free margin is modelled as a
# drawdown-shrinking fraction of equity: margin availability contracts
# exactly when the account is under water.
ACCOUNT_EQUITY = 100_000.0
MAX_POSITION_RISK = 0.02
MIN_CONFIDENCE = 0.50
MAX_TRADES_PER_DAY = 3
FREE_MARGIN_FRAC = 0.025
EQUITY_POSITION_FRAC = 0.06


def _in(col: Column, values: tuple[str, ...]) -> Column:
    return col.isin(*values)


def bucket_expr(symbol: Column) -> Column:
    """Barbell bucket classification (`risk/barbell_sizing.py:129-138`)."""
    return (
        F.when(_in(symbol, SAFE_SYMBOLS), "safe")
        .when(_in(symbol, CORE_SYMBOLS), "core")
        .when(_in(symbol, SPEC_SYMBOLS), "spec")
        .otherwise("other")
    )


# ---------------------------------------------------------------------------
# Barbell projection (barbell_policy.py:120-190 project_to_feasible)
# ---------------------------------------------------------------------------


def project_barbell(
    weights: DataFrame,
    segment: str = "segment",
    bucket: str = "bucket",
    w: str = "w",
) -> DataFrame:
    """Project per-(segment, symbol) weights into the barbell-feasible
    region — the reference's four-step sequence
    (`risk/barbell_policy.py:120-190`): (1) scale core+spec down to
    ``RISK_MAX``; (2) cap each risk bucket at its own maximum; (3) if
    safe < ``SAFE_MIN``, take the deficit proportionally from every
    non-safe symbol and boost safe symbols to compensate; (4)
    renormalise so the segment total is preserved. Adds column
    ``w_proj``.

    All bucket sums are windows over the segment partition of the
    already-aggregated weights frame (bounded: segments x symbols), so
    the chain is pure projection algebra on one exchange."""
    seg = Window.partitionBy(segment)
    b = F.col(bucket)

    def bsum(col: str, *buckets: str) -> Column:
        return F.sum(F.when(b.isin(*buckets), F.col(col)).otherwise(0.0)).over(seg)

    df = weights.withColumn("_total0", F.sum(w).over(seg))

    # Step 1 — global risk cap.
    risk0 = bsum(w, "core", "spec")
    df = df.withColumn(
        "_w1",
        F.when(
            b.isin("core", "spec") & (risk0 > RISK_MAX),
            F.col(w) * RISK_MAX / risk0,
        ).otherwise(F.col(w)),
    )

    # Step 2 — per-bucket caps.
    core1 = bsum("_w1", "core")
    spec1 = bsum("_w1", "spec")
    df = df.withColumn(
        "_w2",
        F.when((b == "core") & (core1 > CORE_MAX), F.col("_w1") * CORE_MAX / core1)
        .when((b == "spec") & (spec1 > SPEC_MAX), F.col("_w1") * SPEC_MAX / spec1)
        .otherwise(F.col("_w1")),
    )

    # Step 3 — safe-minimum redistribution, exactly the reference's
    # arithmetic (`barbell_policy.py:166-183`): the donor pool is the
    # ORIGINAL total minus current safe (`donor_total = total - safe`),
    # donors are scaled by max(0, 1 - deficit/donor_total) — the clamp
    # matters when the post-cap donor mass is smaller than the deficit,
    # where an unclamped factor would go negative — and safe symbols are
    # boosted by deficit/safe_current (safe is unchanged by the donor
    # scaling, so the boost denominator is the pre-boost safe sum).
    safe2 = bsum("_w2", "safe")
    donor0 = F.col("_total0") - safe2
    deficit = SAFE_MIN - safe2
    df = df.withColumn(
        "_w3",
        F.when(
            (safe2 < SAFE_MIN) & (donor0 > 0) & (safe2 > 0),
            F.when(
                b != "safe",
                F.col("_w2")
                * F.greatest(F.lit(0.0), 1.0 - deficit / donor0),
            ).otherwise(F.col("_w2") * (1.0 + deficit / safe2)),
        ).otherwise(F.col("_w2")),
    )

    # Step 4 — preserve the original segment total.
    total3 = F.sum("_w3").over(seg)
    df = df.withColumn(
        "w_proj",
        F.when(total3 > 0, F.col("_w3") * F.col("_total0") / total3).otherwise(
            F.col("_w3")
        ),
    )
    return df.drop("_total0", "_w1", "_w2", "_w3")


# ---------------------------------------------------------------------------
# Confidence sizing (barbell_sizing.py:164-356)
# ---------------------------------------------------------------------------


def ratio_penalty(ratio: Column, soft_cap: float, floor: float) -> Column:
    """Soft-cap ratio penalty (`risk/barbell_sizing.py:164-175`):
    1.0 at or under the cap, then 1/(1+excess) floored at
    ``floor``. NULL ratio (context absent) -> 1.0 (not appended)."""
    return F.when(ratio.isNull() | (ratio <= soft_cap), F.lit(1.0)).otherwise(
        F.greatest(
            F.lit(floor),
            F.least(F.lit(1.0), 1.0 / (1.0 + (ratio - soft_cap) / soft_cap)),
        )
    )


def regime_mult_expr(bucket: Column, regime: Column) -> Column:
    """Per-(regime, bucket) multiplier lookup
    (`risk/barbell_sizing.py:177-187`); 1.0 when the regime is NULL or
    the bucket is absent from the regime map."""
    expr = F.lit(1.0)
    for reg, table in REGIME_MULT.items():
        for bkt, mult in table.items():
            expr = F.when((regime == reg) & (bucket == bkt), F.lit(mult)).otherwise(
                expr
            )
    return expr


def bucket_mult_expr(bucket: Column) -> Column:
    """Per-bucket confidence multiplier (`risk/barbell_sizing.py:140-161`,
    explicit-config path)."""
    expr = F.lit(1.0)
    for bkt, mult in BUCKET_MULT.items():
        expr = F.when(bucket == bkt, F.lit(mult)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Real-time portfolio risk monitor (real_time_risk_manager.py:102-331)
# ---------------------------------------------------------------------------


def risk_alert_summary(
    series: DataFrame,
    key: str = "user_id",
    order_col: str = "rn",
    value: str = "value",
) -> DataFrame:
    """Batch replay of the per-bar risk monitor: running-peak drawdown
    vs warning/critical limits, daily-loss breaches, full-history
    annualised volatility (population std x sqrt(252) — reference uses
    ``np.std`` with ddof=0), parametric VaR(95) (0.0 below 10 return
    observations, `real_time_risk_manager.py:205-229`), and the final
    severity status (CRITICAL if any critical alert fired, else WARNING,
    else NORMAL).

    Threshold comparisons run on 6-decimal-rounded values (house hash-
    stability convention, `plans/queries.py`)."""
    w = Window.partitionBy(key).orderBy(order_col)
    peak = F.max(value).over(w.rowsBetween(Window.unboundedPreceding, 0))
    r = series.select(
        key,
        order_col,
        F.col(value).alias("_v"),
        F.round((peak - F.col(value)) / peak, 6).alias("_dd"),
        F.round(F.col(value) / F.lag(value).over(w) - 1.0, 6).alias("_ret"),
    )
    n_ret = F.count("_ret")
    vol = F.when(
        n_ret >= 2, F.round(F.stddev_pop("_ret") * F.sqrt(F.lit(252.0)), 6)
    ).otherwise(0.0)
    var95 = F.when(
        n_ret >= 10,
        F.round(F.abs(F.avg("_ret") + F.lit(Z_05) * F.stddev_pop("_ret")), 6),
    ).otherwise(0.0)
    agg = r.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.round(F.max("_dd"), 6).alias("max_drawdown"),
        F.round(F.max_by("_dd", F.col(order_col)), 6).alias("final_drawdown"),
        vol.alias("vol_annualized"),
        var95.alias("var95"),
        F.sum((F.col("_dd") >= MAX_DRAWDOWN).cast("long")).alias("n_critical_dd"),
        F.sum(
            ((F.col("_dd") >= WARNING_DRAWDOWN) & (F.col("_dd") < MAX_DRAWDOWN)).cast(
                "long"
            )
        ).alias("n_warning_dd"),
        F.sum((F.col("_ret") < -MAX_DAILY_LOSS).cast("long")).alias("n_daily_loss"),
    )
    vol_alert = F.col("vol_annualized") > VOLATILITY_THRESHOLD
    return agg.select(
        key,
        "n_bars",
        "max_drawdown",
        "final_drawdown",
        "vol_annualized",
        "var95",
        "n_critical_dd",
        "n_warning_dd",
        "n_daily_loss",
        vol_alert.alias("vol_alert"),
        F.when(
            (F.col("n_critical_dd") > 0) | (F.col("n_daily_loss") > 0), "CRITICAL"
        )
        .when((F.col("n_warning_dd") > 0) | vol_alert, "WARNING")
        .otherwise("NORMAL")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Residual white-noise verdict (residual_diagnostics.py:19-98)
# ---------------------------------------------------------------------------


def chi2_sf6(stat: Column) -> Column:
    """Survival function of chi-square with 6 dof — closed form for even
    dof: exp(-x/2) * sum_{k=0}^{2} (x/2)^k / k!."""
    h = stat / 2.0
    return F.exp(-h) * (1.0 + h + h * h / 2.0)


def white_noise_verdict(
    resid: DataFrame,
    key: str = "user_id",
    order_col: str = "rn",
    resid_col: str = "resid",
    min_n: int = 13,
) -> DataFrame:
    """Ljung-Box (lags 1..6) + Jarque-Bera on per-key model residuals
    with the combined white-noise verdict (both p > 0.05) — reference
    `forcester_ts/residual_diagnostics.py:19-98`. P-values are closed
    form: chi2(6) via the even-dof survival series, chi2(2) via
    exp(-x/2) — both expressible identically in Spark and DuckDB.

    Same lag-column + CORR autocorrelation shape as the `ljung_box`
    query (one window pass, one aggregation)."""
    wp = Window.partitionBy(key).orderBy(order_col)
    e = F.col(resid_col)
    lagged = resid.select(
        key,
        e.alias("_e"),
        *[F.lag(resid_col, k).over(wp).alias(f"_l{k}") for k in range(1, 7)],
    )
    a = (
        lagged.groupBy(key)
        .agg(
            F.count("_e").alias("n"),
            *[F.corr("_e", f"_l{k}").alias(f"_r{k}") for k in range(1, 7)],
            F.avg("_e").alias("_m1"),
            F.avg(F.col("_e") * F.col("_e")).alias("_m2"),
            F.avg(F.col("_e") * F.col("_e") * F.col("_e")).alias("_m3"),
            F.avg(F.col("_e") * F.col("_e") * F.col("_e") * F.col("_e")).alias("_m4"),
        )
        .filter(F.col("n") >= min_n)
    )
    n = F.col("n")
    lb = n * (n + 2.0) * sum(
        F.col(f"_r{k}") * F.col(f"_r{k}") / (n - k) for k in range(1, 7)
    )
    m1, m2, m3, m4 = (F.col(c) for c in ("_m1", "_m2", "_m3", "_m4"))
    c2 = m2 - m1 * m1
    c3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    c4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
    skew = c3 / F.pow(c2, 1.5)
    kurt = c4 / (c2 * c2) - 3
    jb = n / 6.0 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4)
    out = a.select(
        key,
        "n",
        F.round(lb, 6).alias("lb_stat"),
        F.round(chi2_sf6(F.round(lb, 6)), 6).alias("lb_pvalue"),
        F.round(jb, 6).alias("jb_stat"),
        F.round(F.exp(-F.round(jb, 6) / 2.0), 6).alias("jb_pvalue"),
    )
    return out.withColumn(
        "white_noise",
        (F.col("lb_pvalue") > 0.05) & (F.col("jb_pvalue") > 0.05),
    )


# ---------------------------------------------------------------------------
# Promotion gate (barbell_promotion_gate.py:248-428)
# ---------------------------------------------------------------------------


def promotion_checks(trades: DataFrame, bucket: Column) -> DataFrame:
    """Two-arm promotion evaluation: the baseline (``ts_only``) arm is the
    raw simulated trades; the ``barbell_sized`` arm scales each trade's
    PnL by its bucket confidence multiplier. Per-arm metrics (trade/loss
    support, profit factor, cumulative-PnL max drawdown, worst-decile
    expected shortfall, payoff asymmetry, winner concentration) feed the
    reference's threshold checks -> one row per check plus the final
    ``promote`` row (all required checks pass). The omega-antifragility
    trio (monotonicity/cliff/right-tail) needs the reference's separate
    candidate-backtest harness and is out of scope — documented, not
    silently passed.

    Ledger note: the cumulative-PnL drawdown is one global ordered
    window — same inherently-sequential shape as
    ``reconcile_portfolio_cash``."""
    # PnL is DECIMAL end-to-end so every sum (totals, ledger cumulative,
    # win/loss pools) is order-independent — the same convention as the
    # q3/q5 money sums (r3 one-ulp hash lesson). The bucket scaling is a
    # DECIMAL(18,6) x DECIMAL(3,2) exact multiply (-> DECIMAL(22,8)), not
    # a double product re-round, so the two engines cannot disagree on a
    # half-ulp rounding of the scaled PnL.
    mult_dec = bucket_mult_expr(bucket).cast("decimal(3,2)")
    pnl6 = F.round(F.col("realized_pnl"), 6).cast("decimal(18,6)")
    base = trades.select(
        F.lit("ts_only").alias("arm"),
        F.col("user_id"),
        F.col("entry_rn"),
        F.col("exit_rn"),
        pnl6.cast("decimal(22,8)").alias("pnl"),
    )
    sized = trades.select(
        F.lit("barbell_sized").alias("arm"),
        F.col("user_id"),
        F.col("entry_rn"),
        F.col("exit_rn"),
        (pnl6 * mult_dec).cast("decimal(22,8)").alias("pnl"),
    )
    both = base.unionByName(sized)

    ledger = Window.partitionBy("arm").orderBy("exit_rn", "user_id", "entry_rn")
    cum = F.sum("pnl").over(ledger.rowsBetween(Window.unboundedPreceding, 0))
    run_peak = F.max(cum).over(ledger.rowsBetween(Window.unboundedPreceding, 0))
    decile = F.ntile(10).over(
        Window.partitionBy("arm").orderBy("pnl", "user_id", "entry_rn")
    )
    enriched = both.select(
        "arm",
        "pnl",
        (run_peak - cum).alias("dd"),
        decile.alias("decile"),
    )
    zero = F.lit(0).cast("decimal(22,8)")
    wins = F.sum(F.when(F.col("pnl") > 0, F.col("pnl")).otherwise(zero))
    losses = F.sum(F.when(F.col("pnl") < 0, F.col("pnl")).otherwise(zero))
    n_wins = F.sum((F.col("pnl") > 0).cast("long"))
    n_losses = F.sum((F.col("pnl") < 0).cast("long"))
    es_sum = F.sum(F.when(F.col("decile") == 1, F.col("pnl")).otherwise(zero))
    es_n = F.sum((F.col("decile") == 1).cast("long"))
    per_arm = enriched.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum((F.col("pnl") < 0).cast("long")).alias("losing"),
        F.sum("pnl").cast("double").alias("total_pnl"),
        F.round(
            wins.cast("double")
            / F.greatest(F.abs(losses).cast("double"), F.lit(1e-9)),
            6,
        ).alias("profit_factor"),
        F.max("dd").cast("double").alias("max_drawdown"),
        F.round(es_sum.cast("double") / F.greatest(es_n, F.lit(1)), 6).alias(
            "expected_shortfall"
        ),
        F.round(
            (wins.cast("double") / F.greatest(n_wins, F.lit(1)))
            / F.greatest(
                F.abs(losses).cast("double") / F.greatest(n_losses, F.lit(1)),
                F.lit(1e-9),
            ),
            6,
        ).alias("payoff_asymmetry"),
        F.round(
            F.max(F.when(F.col("pnl") > 0, F.col("pnl")).otherwise(zero)).cast(
                "double"
            )
            / F.greatest(wins.cast("double"), F.lit(1e-9)),
            6,
        ).alias("winner_concentration"),
    )

    def arm(col: str, which: str) -> Column:
        return F.max(F.when(F.col("arm") == which, F.col(col)))

    wide = per_arm.groupBy().agg(
        *[
            arm(c, "ts_only").alias(f"base_{c}")
            for c in (
                "n_trades",
                "losing",
                "total_pnl",
                "profit_factor",
                "max_drawdown",
                "expected_shortfall",
            )
        ],
        *[
            arm(c, "barbell_sized").alias(f"bb_{c}")
            for c in (
                "n_trades",
                "losing",
                "total_pnl",
                "profit_factor",
                "max_drawdown",
                "expected_shortfall",
                "payoff_asymmetry",
                "winner_concentration",
            )
        ],
    )
    d_pnl = F.round(F.col("bb_total_pnl") - F.col("base_total_pnl"), 6)
    d_pf = F.round(F.col("bb_profit_factor") - F.col("base_profit_factor"), 6)
    d_dd = F.round(F.col("bb_max_drawdown") - F.col("base_max_drawdown"), 6)
    checks = [
        (
            "trade_support",
            F.col("bb_n_trades") >= MIN_TOTAL_TRADES,
            F.col("bb_n_trades").cast("double"),
            float(MIN_TOTAL_TRADES),
        ),
        (
            "loss_support",
            F.col("bb_losing") >= MIN_LOSING_TRADES,
            F.col("bb_losing").cast("double"),
            float(MIN_LOSING_TRADES),
        ),
        ("pnl_delta", (d_pnl > 0) | (d_pf > 0), d_pnl, 0.0),
        ("drawdown_regression", d_dd <= 0, d_dd, 0.0),
        (
            "expected_shortfall_regression",
            F.col("bb_expected_shortfall") >= F.col("base_expected_shortfall"),
            F.round(
                F.col("bb_expected_shortfall") - F.col("base_expected_shortfall"), 6
            ),
            0.0,
        ),
        (
            "payoff_asymmetry_effective",
            F.col("bb_payoff_asymmetry") >= MIN_PAYOFF_ASYMMETRY,
            F.col("bb_payoff_asymmetry"),
            MIN_PAYOFF_ASYMMETRY,
        ),
        (
            "winner_concentration",
            F.col("bb_winner_concentration") <= MAX_WINNER_CONCENTRATION,
            F.col("bb_winner_concentration"),
            MAX_WINNER_CONCENTRATION,
        ),
    ]
    rows = [
        F.struct(
            F.lit(name).alias("check_name"),
            passed.alias("passed"),
            observed.alias("observed"),
            F.lit(threshold).alias("threshold"),
        )
        for name, passed, observed, threshold in checks
    ]
    all_pass = checks[0][1]
    for _, passed, _, _ in checks[1:]:
        all_pass = all_pass & passed
    promote = F.struct(
        F.lit("promote").alias("check_name"),
        all_pass.alias("passed"),
        F.lit(None).cast("double").alias("observed"),
        F.lit(0.0).alias("threshold"),
    )
    return (
        wide.select(F.explode(F.array(*rows, promote)).alias("c"))
        .select("c.check_name", "c.passed", "c.observed", "c.threshold")
    )


# ---------------------------------------------------------------------------
# Warm-start order suggestion (order_learner.py:233-323)
# ---------------------------------------------------------------------------


def warmstart_suggest(
    fits: DataFrame,
    current: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Suggest a cached model order for each key's CURRENT regime with
    the reference's fallback ladder (`order_learner.py:233-281`):
    latest fit in the exact (key, regime) -> latest fit for the key in
    ANY regime (GLOBAL) -> population-modal order for the regime.
    ``skip_grid`` mirrors `should_skip_grid` (`:283-323`): an exact-hit
    whose cached training size covers at least ``SKIP_FRACTION`` (70%)
    of the current window skips the grid re-fit.

    ``fits``: key, regime, fitted_at (int), best_p, aic, n_obs.
    ``current``: key, regime, n_obs.

    Joins are keyed on the key column (co-partitioned with the cache
    table); the population fallback is a regime-level aggregate small
    enough to broadcast at any scale."""
    # The three lookup frames all derive from `fits`, and in the query
    # pack `current` shares that lineage too — name-based (USING) joins
    # on shared-lineage frames hit Spark's self-join attribute-ambiguity
    # trap (the equality can resolve to one side's attribute and silently
    # stop filtering). Renamed join keys + explicit conditions are immune.
    latest_exact = Window.partitionBy(key, "regime").orderBy(
        F.col("fitted_at").desc(), F.col("aic").asc(), F.col("best_p").asc()
    )
    exact = (
        fits.withColumn("_rk", F.row_number().over(latest_exact))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(key).alias("_ek"),
            F.col("regime").alias("_er"),
            F.col("best_p").alias("exact_p"),
            F.col("aic").alias("exact_aic"),
            F.col("n_obs").alias("exact_n_obs"),
        )
    )
    latest_any = Window.partitionBy(key).orderBy(
        F.col("fitted_at").desc(), F.col("aic").asc(), F.col("best_p").asc()
    )
    glob = (
        fits.withColumn("_rk", F.row_number().over(latest_any))
        .filter(F.col("_rk") == 1)
        .select(F.col(key).alias("_gk"), F.col("best_p").alias("global_p"))
    )
    pop_rank = Window.partitionBy("regime").orderBy(
        F.col("_cnt").desc(), F.col("best_p").asc()
    )
    pop = (
        fits.groupBy("regime", "best_p")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_rk", F.row_number().over(pop_rank))
        .filter(F.col("_rk") == 1)
        .select(F.col("regime").alias("_pr"), F.col("best_p").alias("pop_p"))
    )
    out = (
        current.alias("c")
        .join(
            exact.alias("e"),
            (F.col(f"c.{key}") == F.col("e._ek"))
            & (F.col("c.regime") == F.col("e._er")),
            how="left",
        )
        .join(glob.alias("g"), F.col(f"c.{key}") == F.col("g._gk"), how="left")
        .join(pop.alias("p"), F.col("c.regime") == F.col("p._pr"), how="left")
    )
    suggested = F.coalesce(F.col("exact_p"), F.col("global_p"), F.col("pop_p"))
    source = (
        F.when(F.col("exact_p").isNotNull(), "regime")
        .when(F.col("global_p").isNotNull(), "global")
        .when(F.col("pop_p").isNotNull(), "population")
        .otherwise("none")
    )
    skip = F.coalesce(
        F.col("exact_p").isNotNull()
        & (F.col("exact_n_obs") >= SKIP_FRACTION * F.col("n_obs")),
        F.lit(False),
    )
    return out.select(
        F.col(key),
        F.col("regime").alias("current_regime"),
        suggested.alias("suggested_p"),
        source.alias("source"),
        skip.alias("skip_grid"),
        F.round(F.col("exact_aic"), 6).alias("cache_aic"),
    )


# ---------------------------------------------------------------------------
# Omega hurdle-ladder derivation (portfolio_math.py:637-756)
# ---------------------------------------------------------------------------


def omega_ladder_derive(curve: DataFrame) -> DataFrame:
    """Derive the robustness summary from sentinel-coded ladder omegas —
    the reference's omega_robustness_summary (`etl/portfolio_math.py:
    637-756`) with ``OMEGA_INF_SENTINEL`` standing in for infinity
    (loss == 0 <-> sentinel by construction; emitting real Inf would
    break the value hash, where inf - inf compares as NaN).

    Input columns: omega_zero / omega_hurdle / omega_cost (rounded,
    capped at the sentinel). Appends:
    - monotonicity_ok over CONSECUTIVE FINITE ladder points (infinite
      rungs are dropped from the sequence, exactly like the reference's
      finite_points filter — so z->c adjacency applies when h is
      infinite);
    - above_hurdle_margin (NULL when the hurdle omega is infinite);
    - cliff_drop_ratio / cliff_ok: inf->inf = no cliff (0.0, ok);
      inf->finite = maximum cliff (1.0, fail); finite z > 1e-9 uses
      (z - h)/z with an infinite h treated as no drop; degenerate z
      yields NULLs;
    - robustness_score: weighted strengths on values capped at
      ``OMEGA_CAP`` (the reference's score-arithmetic cap), halved on
      non-monotonicity and halved again ONLY when cliff_ok is
      explicitly False (a NULL cliff does not penalise)."""
    z, h, c = (
        F.col("omega_zero"),
        F.col("omega_hurdle"),
        F.col("omega_cost"),
    )
    zf = z < OMEGA_INF_SENTINEL
    hf = h < OMEGA_INF_SENTINEL
    cf = c < OMEGA_INF_SENTINEL
    pair_zh = ~(zf & hf) | (h <= z + 1e-9)
    pair_hc = ~(hf & cf) | (c <= h + 1e-9)
    pair_zc = ~(zf & cf & ~hf) | (c <= z + 1e-9)
    mono = pair_zh & pair_hc & pair_zc
    margin = F.when(hf, F.round(h - 1.0, 6))
    cliff = (
        F.when(~zf & ~hf, F.lit(0.0))
        .when(~zf & hf, F.lit(1.0))
        .when(
            zf & (z > 1e-9),
            F.round(
                F.least(
                    F.greatest(
                        (z - F.when(hf, h).otherwise(z)) / z, F.lit(0.0)
                    ),
                    F.lit(1.0),
                ),
                6,
            ),
        )
    )
    cliff_ok = F.when(cliff.isNotNull(), cliff <= CLIFF_DROP_MAX)

    def cap(x):
        return F.least(F.greatest(x, F.lit(0.0)), F.lit(OMEGA_CAP))

    def clip01(x):
        return F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))

    zc, hc_, cc = cap(z), cap(h), cap(c)
    score = (
        0.40 * clip01(hc_ - 1.0)
        + 0.30 * clip01(cc - 1.0)
        + 0.20 * clip01(cc / F.greatest(hc_, F.lit(1e-6)))
        + 0.10 * clip01(hc_ / F.greatest(zc, F.lit(1e-6)))
    )
    score = score * F.when(mono, 1.0).otherwise(0.5)
    score = score * F.when(cliff_ok.eqNullSafe(F.lit(False)), 0.5).otherwise(
        1.0
    )
    return curve.select(
        "*",
        mono.alias("monotonicity_ok"),
        margin.alias("above_hurdle_margin"),
        cliff.alias("cliff_drop_ratio"),
        cliff_ok.alias("cliff_ok"),
        F.round(clip01(score), 6).alias("robustness_score"),
    )
