"""Query pack 12 — adversarial forecaster suite (SURVEY §2.12 R135-R137).

The reference's CI stress gate (`scripts/run_adversarial_forecaster_suite
.py`) runs a deterministic synthetic-regime matrix through its forecaster
stack and folds the per-run metrics into (a) legacy RMSE threshold checks
and (b) the primary barbell-objective gate (omega at the NGN hurdle,
terminal directional accuracy, CI coverage, profit factor). The engine
equivalent keeps the exact matrix (10 scenarios × 5 seeds, 320 points,
horizon 20, `numpy.default_rng` per cell), the exact metric/gate algebra,
and — round 7 — the engine's REAL forecasting kernels under the
reference's own adversarial config (`mk_cfg`, `:264-277`): the
Hannan–Rissanen ARIMA grid (the suite pins SARIMAX non-seasonal/compact),
the full skew-t GARCH(p,q) ladder with the R38 price-path enrichment, and
SAMoSSA's SSA R-forecast + residual AR (`forecast/adversarial.py:
kernel_forecast_table`). The ensemble is the equal-weight mean of the
three kernel forecasts with the mean of their CIs (the reference's
no-validation-scores fallback weighting); the random-walk baseline stays
the last train value.

STAGED-VERIFICATION oracle: the generated series matrix AND the kernel
forecasts are staged once per (code version, dataset); every downstream
value — ensemble blend, RMSEs, ratios, terminal DA, synthetic trade
returns, drawdowns, omega, profit factor, every gate verdict — is
re-derived independently by DuckDB from the staged rows
(`tests/test_adversarial.py` pins the staged forecasts against the
kernels run directly). The suite is a bounded diagnostic (17 000 rows end
to end) by construction, exactly like the reference's: its cost is
invariant to data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..forecast.adversarial import (
    HORIZON,
    TRAIN_N,
    kernel_forecast_table,
    scenario_series_table,
)
from .queries import query, r6, stage_cached

#: daily NGN hurdle — (1 + 28% inflation + 3% P2P friction)^(1/252) − 1,
#: reference `etl/portfolio_math.py:530-537`
_TAU = (1.0 + 0.28 + 0.03) ** (1.0 / 252.0) - 1.0
_CAPITAL_BASE_USD = 25000.0
# legacy RMSE thresholds — `_load_thresholds` defaults (`:845-860`)
_MAX_AVG_RATIO = 1.2
_MAX_WORSE_RW_RATE = 0.3
# canonical barbell thresholds (quant_success_config.yml, `:713-737`)
_MIN_TDA_PASS_RATE = 0.45
_MIN_CI_COVERAGE = 0.25
_MIN_PROFIT_FACTOR = 0.8

_LAST = TRAIN_N - 1
_HN = HORIZON - 1

# Shared oracle prelude: per-run metric frame re-derived from the staged
# series + staged kernel forecasts. Window-in-window splits (logc → peak)
# follow the DuckDB CTE convention.
_ADV_SQL = f"""
    ser AS (
      SELECT scenario, CAST(seed AS INT) AS seed, CAST(t AS INT) AS t, y
      FROM read_parquet('__ORACLE_STAGE__/adversarial_series/*.parquet')
    ),
    fc AS (
      SELECT scenario, CAST(seed AS INT) AS seed, CAST(h AS INT) AS h,
             p_sarimax, p_garch, p_samossa,
             (p_sarimax + p_garch + p_samossa) / 3.0 AS p_ens,
             (lo_sarimax + lo_garch + lo_samossa) / 3.0 AS lo,
             (hi_sarimax + hi_garch + hi_samossa) / 3.0 AS hi
      FROM read_parquet('__ORACLE_STAGE__/adversarial_forecasts/*.parquet')
    ),
    tr AS (
      SELECT scenario, seed,
             MAX(CASE WHEN t = {_LAST} THEN y END) AS y_last
      FROM ser WHERE t < {TRAIN_N} GROUP BY scenario, seed
    ),
    p3 AS (
      SELECT s.scenario, s.seed, s.t - {TRAIN_N} AS h, s.y, tr.y_last,
             f.p_sarimax, f.p_garch, f.p_samossa, f.p_ens, f.lo, f.hi
      FROM ser s
      JOIN tr ON tr.scenario = s.scenario AND tr.seed = s.seed
      JOIN fc f ON f.scenario = s.scenario AND f.seed = s.seed
               AND f.h = s.t - {TRAIN_N} + 1
      WHERE s.t >= {TRAIN_N}
    ),
    dd1 AS (
      SELECT scenario, seed, h,
             y / LAG(y) OVER (PARTITION BY scenario, seed ORDER BY h) - 1.0
               AS r
      FROM p3
    ),
    dd2 AS (
      SELECT scenario, seed, h,
             SUM(LN(1.0 + r)) OVER (PARTITION BY scenario, seed
                                    ORDER BY h) AS logc
      FROM dd1 WHERE r IS NOT NULL
    ),
    dd3 AS (
      SELECT scenario, seed,
             EXP(logc - MAX(logc) OVER (PARTITION BY scenario, seed
                                        ORDER BY h)) - 1.0 AS dd
      FROM dd2
    ),
    mdd AS (
      SELECT scenario, seed, ABS(MIN(dd)) AS max_dd
      FROM dd3 GROUP BY scenario, seed
    ),
    ra AS (
      SELECT scenario, seed,
             SQRT(AVG(POWER(y - p_sarimax, 2))) AS rmse_sarimax,
             SQRT(AVG(POWER(y - p_garch, 2)))   AS rmse_garch,
             SQRT(AVG(POWER(y - p_samossa, 2))) AS rmse_samossa,
             SQRT(AVG(POWER(y - p_ens, 2)))     AS rmse_ens,
             SQRT(AVG(POWER(y - y_last, 2)))    AS rmse_rw,
             MAX(CASE WHEN h = 0 THEN y END)      AS y_t0,
             MAX(CASE WHEN h = {_HN} THEN y END)  AS y_tn,
             MAX(CASE WHEN h = 0 THEN p_ens END)  AS fc0,
             MAX(CASE WHEN h = {_HN} THEN p_ens END) AS fcn,
             MAX(CASE WHEN h = {_HN} THEN lo END) AS lo_n,
             MAX(CASE WHEN h = {_HN} THEN hi END) AS hi_n,
             MAX(y_last) AS entry
      FROM p3 GROUP BY scenario, seed
    ),
    runs AS (
      SELECT ra.*, m.max_dd,
             LEAST(rmse_sarimax, rmse_garch, rmse_samossa) AS best_single,
             rmse_ens / LEAST(rmse_sarimax, rmse_garch, rmse_samossa)
               AS ratio,
             (y_tn - entry) / entry AS actual_return,
             CASE WHEN SIGN(fcn - fc0) = 0 OR SIGN(y_tn - y_t0) = 0
                  THEN 0.0
                  WHEN SIGN(fcn - fc0) = SIGN(y_tn - y_t0) THEN 1.0
                  ELSE 0.0 END AS terminal_da,
             SIGN(fcn - fc0) * (y_tn - entry) / entry AS trade_return,
             CASE WHEN lo_n <= y_tn AND y_tn <= hi_n THEN 1.0
                  ELSE 0.0 END AS ci_coverage
      FROM ra JOIN mdd m ON m.scenario = ra.scenario AND m.seed = ra.seed
    )
"""


def _adv_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run metric frame (one row per scenario × seed) over the staged
    series + staged kernel forecasts — the Spark mirror of the oracle's
    ``runs`` CTE.

    Plan shape: the staged scans shuffle once on (scenario, seed) for the
    window math; every aggregate is map-side combinable; the frame joins
    are keyed on the 50-cell matrix so AQE broadcasts them.
    """
    ser = stage_cached(
        spark, sf_dir, "adversarial_series",
        lambda: scenario_series_table(spark),
    )
    # the kernel fits consume the staged series read-back (bit-identical
    # doubles) instead of regenerating the matrix a second time
    fc_raw = stage_cached(
        spark, sf_dir, "adversarial_forecasts",
        lambda: kernel_forecast_table(spark, ser),
    )
    fc = fc_raw.select(
        "scenario", "seed", "h",
        "p_sarimax", "p_garch", "p_samossa",
        (
            (F.col("p_sarimax") + F.col("p_garch") + F.col("p_samossa"))
            / 3.0
        ).alias("p_ens"),
        (
            (F.col("lo_sarimax") + F.col("lo_garch") + F.col("lo_samossa"))
            / 3.0
        ).alias("lo"),
        (
            (F.col("hi_sarimax") + F.col("hi_garch") + F.col("hi_samossa"))
            / 3.0
        ).alias("hi"),
    )
    tr = (
        ser.filter(F.col("t") < TRAIN_N)
        .groupBy("scenario", "seed")
        .agg(F.max(F.when(F.col("t") == _LAST, F.col("y"))).alias("y_last"))
    )
    p3 = (
        ser.filter(F.col("t") >= TRAIN_N)
        .withColumn("h", F.col("t") - TRAIN_N + 1)
        .join(tr, ["scenario", "seed"])
        .join(fc, ["scenario", "seed", "h"])
        .select(
            "scenario", "seed",
            (F.col("h") - 1).alias("h"),
            "y", "y_last",
            "p_sarimax", "p_garch", "p_samossa", "p_ens", "lo", "hi",
        )
    )
    wh = Window.partitionBy("scenario", "seed").orderBy("h")
    dd1 = p3.select(
        "scenario", "seed", "h",
        (F.col("y") / F.lag("y").over(wh) - 1.0).alias("r"),
    ).filter(F.col("r").isNotNull())
    dd2 = dd1.select(
        "scenario", "seed", "h",
        F.sum(F.log(1.0 + F.col("r"))).over(wh).alias("logc"),
    )
    dd3 = dd2.select(
        "scenario", "seed",
        (F.exp(F.col("logc") - F.max("logc").over(wh)) - 1.0).alias("dd"),
    )
    mdd = dd3.groupBy("scenario", "seed").agg(
        F.abs(F.min("dd")).alias("max_dd")
    )

    def _rmse(pred):
        return F.sqrt(F.avg(F.pow(F.col("y") - pred, 2)))

    ra = p3.groupBy("scenario", "seed").agg(
        _rmse(F.col("p_sarimax")).alias("rmse_sarimax"),
        _rmse(F.col("p_garch")).alias("rmse_garch"),
        _rmse(F.col("p_samossa")).alias("rmse_samossa"),
        _rmse(F.col("p_ens")).alias("rmse_ens"),
        _rmse(F.col("y_last")).alias("rmse_rw"),
        F.max(F.when(F.col("h") == 0, F.col("y"))).alias("y_t0"),
        F.max(F.when(F.col("h") == _HN, F.col("y"))).alias("y_tn"),
        F.max(F.when(F.col("h") == 0, F.col("p_ens"))).alias("fc0"),
        F.max(F.when(F.col("h") == _HN, F.col("p_ens"))).alias("fcn"),
        F.max(F.when(F.col("h") == _HN, F.col("lo"))).alias("lo_n"),
        F.max(F.when(F.col("h") == _HN, F.col("hi"))).alias("hi_n"),
        F.max("y_last").alias("entry"),
    )
    best = F.least("rmse_sarimax", "rmse_garch", "rmse_samossa")
    p_dir = F.signum(F.col("fcn") - F.col("fc0"))
    a_dir = F.signum(F.col("y_tn") - F.col("y_t0"))
    aret = (F.col("y_tn") - F.col("entry")) / F.col("entry")
    return ra.join(mdd, ["scenario", "seed"]).select(
        "*",
        best.alias("best_single"),
        (F.col("rmse_ens") / best).alias("ratio"),
        aret.alias("actual_return"),
        F.when((p_dir == 0) | (a_dir == 0), 0.0)
        .when(p_dir == a_dir, 1.0)
        .otherwise(0.0)
        .alias("terminal_da"),
        (p_dir * aret).alias("trade_return"),
        F.when(
            (F.col("lo_n") <= F.col("y_tn"))
            & (F.col("y_tn") <= F.col("hi_n")),
            1.0,
        )
        .otherwise(0.0)
        .alias("ci_coverage"),
    )


@query(
    "adversarial_scenario_matrix",
    oracle=f"""
    WITH {_ADV_SQL}
    SELECT scenario, seed,
           ROUND(rmse_sarimax, 6) AS rmse_sarimax,
           ROUND(rmse_garch, 6)   AS rmse_garch,
           ROUND(rmse_samossa, 6) AS rmse_samossa,
           ROUND(rmse_ens, 6)     AS rmse_ens,
           ROUND(rmse_rw, 6)      AS rmse_rw,
           ROUND(ratio, 6)      AS ratio_vs_best,
           ratio > 1.0          AS under_best,
           rmse_ens > rmse_rw   AS worse_than_rw,
           terminal_da,
           ROUND(actual_return, 6) AS actual_return,
           ROUND(trade_return, 6)  AS trade_return,
           ci_coverage,
           ROUND(max_dd, 6) AS max_drawdown
    FROM runs
    """,
)
def adversarial_scenario_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R135: one row per (scenario, seed) stress run — the reference's
    per-run record (`run_adversarial_forecaster_suite.py:365-460`:
    model RMSEs for the REAL kernel stack + `compute_barbell_per_run`'s
    terminal DA, synthetic trade return, terminal CI coverage and
    test-path max drawdown)."""
    runs = _adv_runs(spark, sf_dir)
    return runs.select(
        "scenario", "seed",
        r6(F.col("rmse_sarimax")).alias("rmse_sarimax"),
        r6(F.col("rmse_garch")).alias("rmse_garch"),
        r6(F.col("rmse_samossa")).alias("rmse_samossa"),
        r6(F.col("rmse_ens")).alias("rmse_ens"),
        r6(F.col("rmse_rw")).alias("rmse_rw"),
        r6(F.col("ratio")).alias("ratio_vs_best"),
        (F.col("ratio") > 1.0).alias("under_best"),
        (F.col("rmse_ens") > F.col("rmse_rw")).alias("worse_than_rw"),
        "terminal_da",
        r6(F.col("actual_return")).alias("actual_return"),
        r6(F.col("trade_return")).alias("trade_return"),
        "ci_coverage",
        r6(F.col("max_dd")).alias("max_drawdown"),
    )


@query(
    "adversarial_suite_summary",
    oracle=f"""
    WITH {_ADV_SQL},
    g AS (
      SELECT scenario AS scope,
             CAST(COUNT(*) AS BIGINT) AS runs,
             CAST(SUM(CASE WHEN ratio > 1.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS under_best_n,
             CAST(SUM(CASE WHEN rmse_ens > rmse_rw THEN 1 ELSE 0 END)
                  AS BIGINT) AS worse_rw_n,
             AVG(ratio) AS avg_ratio_raw
      FROM runs GROUP BY scenario
      UNION ALL
      SELECT 'overall',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN ratio > 1.0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN rmse_ens > rmse_rw THEN 1 ELSE 0 END)
                  AS BIGINT),
             AVG(ratio)
      FROM runs
    )
    SELECT scope, runs, under_best_n,
           ROUND(CAST(under_best_n AS DOUBLE) / runs, 6) AS under_best_rate,
           worse_rw_n,
           ROUND(CAST(worse_rw_n AS DOUBLE) / runs, 6) AS worse_rw_rate,
           ROUND(avg_ratio_raw, 6) AS avg_ratio_vs_best,
           avg_ratio_raw > {_MAX_AVG_RATIO} AS breach_avg_ratio,
           CAST(worse_rw_n AS DOUBLE) / runs > {_MAX_WORSE_RW_RATE}
             AS breach_worse_rw,
           CASE WHEN avg_ratio_raw <= {_MAX_AVG_RATIO}
                 AND CAST(worse_rw_n AS DOUBLE) / runs
                     <= {_MAX_WORSE_RW_RATE}
                THEN 'PASS' ELSE 'FAIL' END AS rmse_gate
    FROM g
    """,
)
def adversarial_suite_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R136: the legacy RMSE rollup (`summarize`, `:532-705`) — per-
    scenario breakdown plus the overall row `evaluate_thresholds`
    (`:884-946`) gates on: under-best rate, worse-than-RW rate, mean
    ensemble-vs-best ratio vs the 1.2 / 0.3 default thresholds."""
    runs = _adv_runs(spark, sf_dir)

    def _roll(df, scope_col):
        return df.agg(
            scope_col.alias("scope"),
            F.count(F.lit(1)).cast("long").alias("runs"),
            F.sum((F.col("ratio") > 1.0).cast("int"))
            .cast("long")
            .alias("under_best_n"),
            F.sum((F.col("rmse_ens") > F.col("rmse_rw")).cast("int"))
            .cast("long")
            .alias("worse_rw_n"),
            F.avg("ratio").alias("avg_ratio_raw"),
        )

    per = runs.groupBy("scenario").agg(
        F.count(F.lit(1)).cast("long").alias("runs"),
        F.sum((F.col("ratio") > 1.0).cast("int"))
        .cast("long")
        .alias("under_best_n"),
        F.sum((F.col("rmse_ens") > F.col("rmse_rw")).cast("int"))
        .cast("long")
        .alias("worse_rw_n"),
        F.avg("ratio").alias("avg_ratio_raw"),
    ).select(F.col("scenario").alias("scope"), "runs", "under_best_n",
             "worse_rw_n", "avg_ratio_raw")
    overall = _roll(runs, F.lit("overall"))
    g = per.unionByName(overall)
    worse_rate = F.col("worse_rw_n").cast("double") / F.col("runs")
    return g.select(
        "scope", "runs", "under_best_n",
        r6(F.col("under_best_n").cast("double") / F.col("runs")).alias(
            "under_best_rate"
        ),
        "worse_rw_n",
        r6(worse_rate).alias("worse_rw_rate"),
        r6(F.col("avg_ratio_raw")).alias("avg_ratio_vs_best"),
        (F.col("avg_ratio_raw") > _MAX_AVG_RATIO).alias("breach_avg_ratio"),
        (worse_rate > _MAX_WORSE_RW_RATE).alias("breach_worse_rw"),
        F.when(
            (F.col("avg_ratio_raw") <= _MAX_AVG_RATIO)
            & (worse_rate <= _MAX_WORSE_RW_RATE),
            "PASS",
        )
        .otherwise("FAIL")
        .alias("rmse_gate"),
    )


@query(
    "adversarial_barbell_gate",
    oracle=f"""
    WITH {_ADV_SQL},
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_runs,
             CAST(COUNT(trade_return) AS BIGINT) AS n_trades,
             SUM(GREATEST(trade_return - CAST('{_TAU!r}' AS DOUBLE), 0))
               AS gain,
             SUM(GREATEST(CAST('{_TAU!r}' AS DOUBLE) - trade_return, 0))
               AS loss,
             COALESCE(AVG(CASE WHEN trade_return > 0 THEN trade_return END),
                      0.0) AS avg_win,
             ABS(COALESCE(AVG(CASE WHEN trade_return < 0
                                   THEN trade_return END), 0.0))
               AS avg_loss,
             CAST(SUM(CASE WHEN trade_return > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_wins,
             AVG(CASE WHEN terminal_da >= {_MIN_TDA_PASS_RATE}
                      THEN 1.0 ELSE 0.0 END) AS tda_pass_rate,
             AVG(terminal_da) AS mean_terminal_da,
             AVG(ci_coverage) AS mean_ci,
             AVG(max_dd) AS mean_dd,
             AVG(trade_return) AS mean_tr
      FROM runs
    )
    SELECT n_runs, n_trades,
           CASE WHEN loss > 0 THEN ROUND(gain / loss, 6) END AS omega_ratio,
           loss = 0 AND gain > 0 AS omega_infinite,
           (loss = 0 AND gain > 0) OR (loss > 0 AND gain / loss > 1.0)
             AS omega_above_1,
           CASE WHEN avg_loss > 0 THEN ROUND(avg_win / avg_loss, 6)
                WHEN avg_win > 0 THEN NULL
                ELSE 0.0 END AS profit_factor,
           avg_loss = 0 AND avg_win > 0 AS pf_infinite,
           ROUND(CAST(n_wins AS DOUBLE) / GREATEST(n_trades, 1), 6)
             AS win_rate,
           ROUND(tda_pass_rate, 6) AS tda_pass_rate,
           ROUND(mean_terminal_da, 6) AS mean_terminal_da,
           ROUND(mean_ci, 6) AS mean_ci_coverage,
           ROUND(mean_dd, 6) AS mean_max_drawdown,
           ROUND(mean_tr, 6) AS mean_trade_return,
           ROUND(mean_tr * {_CAPITAL_BASE_USD}, 6) AS expected_profit_usd,
           (loss = 0 AND gain > 0) OR (loss > 0 AND gain / loss > 1.0)
             AS gate_omega,
           tda_pass_rate >= {_MIN_TDA_PASS_RATE} AS gate_tda,
           mean_ci >= {_MIN_CI_COVERAGE} AS gate_ci,
           (avg_loss = 0 AND avg_win > 0)
             OR (avg_loss > 0 AND avg_win / avg_loss >= {_MIN_PROFIT_FACTOR})
             AS gate_pf,
           CASE WHEN ((loss = 0 AND gain > 0)
                      OR (loss > 0 AND gain / loss > 1.0))
                 AND tda_pass_rate >= {_MIN_TDA_PASS_RATE}
                 AND mean_ci >= {_MIN_CI_COVERAGE}
                 AND ((avg_loss = 0 AND avg_win > 0)
                      OR (avg_loss > 0
                          AND avg_win / avg_loss >= {_MIN_PROFIT_FACTOR}))
                THEN 'PASS' ELSE 'FAIL' END AS barbell_status
    FROM agg
    """,
)
def adversarial_barbell_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R137: the primary barbell-objective gate (`summarize_barbell` +
    `evaluate_barbell_thresholds`, `:713-1001`) — batch omega across all
    synthetic trade returns at the NGN daily hurdle
    (`etl/portfolio_math.py:535-585`), profit factor, win rate,
    terminal-DA pass rate, CI-coverage and drawdown means, the 25k-USD
    expected profit, and PASS/FAIL against the canonical thresholds
    (omega > 1, DA rate ≥ 0.45, coverage ≥ 0.25, PF ≥ 0.80). Infinite
    omega / profit factor (zero-loss batches) are emitted NULL with an
    explicit *_infinite flag, per the engine's infinity-faithful
    convention."""
    runs = _adv_runs(spark, sf_dir)
    tau = F.lit(_TAU)
    tr_col = F.col("trade_return")
    agg = runs.agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.count("trade_return").cast("long").alias("n_trades"),
        F.sum(F.greatest(tr_col - tau, F.lit(0.0))).alias("gain"),
        F.sum(F.greatest(tau - tr_col, F.lit(0.0))).alias("loss"),
        F.coalesce(
            F.avg(F.when(tr_col > 0, tr_col)), F.lit(0.0)
        ).alias("avg_win"),
        F.abs(
            F.coalesce(F.avg(F.when(tr_col < 0, tr_col)), F.lit(0.0))
        ).alias("avg_loss"),
        F.sum((tr_col > 0).cast("int")).cast("long").alias("n_wins"),
        F.avg(
            F.when(F.col("terminal_da") >= _MIN_TDA_PASS_RATE, 1.0)
            .otherwise(0.0)
        ).alias("tda_pass_rate"),
        F.avg("terminal_da").alias("mean_terminal_da"),
        F.avg("ci_coverage").alias("mean_ci"),
        F.avg("max_dd").alias("mean_dd"),
        F.avg("trade_return").alias("mean_tr"),
    )
    gain, loss = F.col("gain"), F.col("loss")
    avg_win, avg_loss = F.col("avg_win"), F.col("avg_loss")
    omega_above = ((loss == 0) & (gain > 0)) | (
        (loss > 0) & (gain / loss > 1.0)
    )
    gate_pf = ((avg_loss == 0) & (avg_win > 0)) | (
        (avg_loss > 0) & (avg_win / avg_loss >= _MIN_PROFIT_FACTOR)
    )
    gate_tda = F.col("tda_pass_rate") >= _MIN_TDA_PASS_RATE
    gate_ci = F.col("mean_ci") >= _MIN_CI_COVERAGE
    return agg.select(
        "n_runs", "n_trades",
        F.when(loss > 0, r6(gain / loss)).alias("omega_ratio"),
        ((loss == 0) & (gain > 0)).alias("omega_infinite"),
        omega_above.alias("omega_above_1"),
        F.when(avg_loss > 0, r6(avg_win / avg_loss))
        .when(avg_win > 0, F.lit(None).cast("double"))
        .otherwise(0.0)
        .alias("profit_factor"),
        ((avg_loss == 0) & (avg_win > 0)).alias("pf_infinite"),
        r6(
            F.col("n_wins").cast("double")
            / F.greatest(F.col("n_trades"), F.lit(1))
        ).alias("win_rate"),
        r6(F.col("tda_pass_rate")).alias("tda_pass_rate"),
        r6(F.col("mean_terminal_da")).alias("mean_terminal_da"),
        r6(F.col("mean_ci")).alias("mean_ci_coverage"),
        r6(F.col("mean_dd")).alias("mean_max_drawdown"),
        r6(F.col("mean_tr")).alias("mean_trade_return"),
        r6(F.col("mean_tr") * _CAPITAL_BASE_USD).alias(
            "expected_profit_usd"
        ),
        omega_above.alias("gate_omega"),
        gate_tda.alias("gate_tda"),
        gate_ci.alias("gate_ci"),
        gate_pf.alias("gate_pf"),
        F.when(
            omega_above & gate_tda & gate_ci & gate_pf, "PASS"
        )
        .otherwise("FAIL")
        .alias("barbell_status"),
    )
