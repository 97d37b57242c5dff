"""Query pack 10 — risk layer: barbell allocation, NAV budgets,
real-time risk monitoring, promotion gate, ensemble/residual
diagnostics, warm-start order cache.

Covers the reference's `risk/` module and the forecasting diagnostics
that round 4's inventory left implicit:
- `risk/barbell_policy.py:90-190` — bucket weights + feasible-region
  projection (R1, R2),
- `risk/barbell_sizing.py:129-356` — confidence sizing with soft-cap
  ratio penalties and the binary path-risk audit (R3),
- `risk/nav_allocator.py:35-76` — NAV bucket budgets (R4),
- `risk/real_time_risk_manager.py:102-331` — drawdown/daily-loss/vol/
  VaR alerting (R5),
- `risk/barbell_promotion_gate.py:248-428` — two-arm promotion checks
  (R6, staged-input oracle),
- `forcester_ts/ensemble_diagnostics.py:121-167` — ensemble error
  decomposition vs best single model (R7),
- `forcester_ts/residual_diagnostics.py:19-98` — Ljung-Box +
  Jarque-Bera white-noise verdict on model residuals (R8),
- `forcester_ts/order_learner.py:233-323` — warm-start order
  suggestion ladder + skip-grid decision (R9).

Data mapping: portfolios = customer market segments, symbols = nations
(weights = value share of orders), market context per order from its
lineitems, series = the per-user events table. Every constant is
defined ONCE in `operators/risk.py` and interpolated into both the
Spark plan and the DuckDB oracle, so the two sides cannot drift.

Scale: the fact tables shuffle once into bounded aggregates
(segments x nations, per-order, per-user); every projection/sizing step
after that is column algebra or a window over the bounded frame. The
only global ordered window is R6's cumulative-PnL ledger (same shape as
`reconcile_portfolio_cash`; two-pass running-sum path documented in
`operators/windows.py:168`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import risk as R
from ..sources.catalog import load_table
from .queries import ORACLE, literal_grid, query, r6
from .queries_stats import _S_SQL, _series, _w

# ---------------------------------------------------------------------------
# SQL fragment generators — all constants come from operators/risk.py.
# ---------------------------------------------------------------------------


def _sql_in(vals: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


_BUCKET_CASE = f"""CASE
           WHEN n_name IN {_sql_in(R.SAFE_SYMBOLS)} THEN 'safe'
           WHEN n_name IN {_sql_in(R.CORE_SYMBOLS)} THEN 'core'
           WHEN n_name IN {_sql_in(R.SPEC_SYMBOLS)} THEN 'spec'
           ELSE 'other' END"""

# Per-(segment, nation) value weights — the shared base of R1/R2/R4.
_W0_SQL = f"""
    bw AS (
      SELECT c_mktsegment AS segment, n_name AS symbol,
             {_BUCKET_CASE} AS bucket,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS notional
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3
    ),
    w0 AS (
      SELECT segment, symbol, bucket, notional,
             notional / SUM(notional) OVER (PARTITION BY segment) AS w
      FROM bw
    )"""


def _bucket_mult_sql(col: str = "bucket") -> str:
    whens = " ".join(
        f"WHEN '{b}' THEN {m}" for b, m in R.BUCKET_MULT.items()
    )
    return f"CASE {col} {whens} ELSE 1.0 END"


def _regime_mult_sql(bucket: str = "bucket", regime: str = "regime") -> str:
    clauses = []
    for reg, table in R.REGIME_MULT.items():
        for bkt, mult in table.items():
            clauses.append(
                f"WHEN {regime} = '{reg}' AND {bucket} = '{bkt}' THEN {mult}"
            )
    return "CASE " + " ".join(clauses) + " ELSE 1.0 END"


def _pen_sql(r: str, cap: float, floor: float) -> str:
    return (
        f"CASE WHEN {r} IS NULL OR {r} <= {cap} THEN 1.0 "
        f"ELSE GREATEST({floor}, LEAST(1.0, "
        f"1.0 / (1.0 + ({r} - {cap}) / {cap}))) END"
    )


def _weights_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark mirror of _W0_SQL: per-(segment, nation) value weights.
    orders shuffles once on the group keys; customer/nation are
    AQE-broadcast dims (unhinted — AQE decides, co-partitioned shuffle
    at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    bw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("symbol"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("notional")
        )
        .withColumn("bucket", R.bucket_expr(F.col("symbol")))
    )
    seg = Window.partitionBy("segment")
    return bw.withColumn("w", F.col("notional") / F.sum("notional").over(seg))


# ---------------------------------------------------------------------------
# R1 — barbell bucket weights + concentration check
# ---------------------------------------------------------------------------


@query(
    "barbell_bucket_weights",
    oracle=f"""
    WITH {_W0_SQL}
    SELECT segment,
           COUNT(*) AS n_symbols,
           ROUND(SUM(CASE WHEN bucket = 'safe' THEN w ELSE 0 END), 6) AS w_safe,
           ROUND(SUM(CASE WHEN bucket = 'core' THEN w ELSE 0 END), 6) AS w_core,
           ROUND(SUM(CASE WHEN bucket = 'spec' THEN w ELSE 0 END), 6) AS w_spec,
           ROUND(SUM(CASE WHEN bucket = 'other' THEN w ELSE 0 END), 6) AS w_other,
           ROUND(MAX(w), 6) AS max_position_pct,
           ROUND(MAX(w), 6) > 0.40 AS concentration_alert,
           ROUND(SUM(CASE WHEN bucket IN ('core', 'spec') THEN w ELSE 0 END), 6)
             <= {R.RISK_MAX} AS risk_within_cap
    FROM w0
    GROUP BY segment
    """,
)
def barbell_bucket_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: safe/core/spec/other bucket weights per portfolio segment
    (`risk/barbell_policy.py:100-118` bucket_weights) plus the 40%
    single-position concentration alert
    (`risk/real_time_risk_manager.py:284-316`) and the raw risk-cap
    feasibility flag. One orders shuffle -> bounded segment x nation
    aggregate -> per-segment rollup."""
    w0 = _weights_frame(spark, sf_dir)
    return w0.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_symbols"),
        *[
            r6(
                F.sum(F.when(F.col("bucket") == b, F.col("w")).otherwise(0.0))
            ).alias(f"w_{b}")
            for b in ("safe", "core", "spec", "other")
        ],
        r6(F.max("w")).alias("max_position_pct"),
        (r6(F.max("w")) > 0.40).alias("concentration_alert"),
        (
            r6(
                F.sum(
                    F.when(
                        F.col("bucket").isin("core", "spec"), F.col("w")
                    ).otherwise(0.0)
                )
            )
            <= R.RISK_MAX
        ).alias("risk_within_cap"),
    )


# ---------------------------------------------------------------------------
# R2 — projection into the barbell-feasible region
# ---------------------------------------------------------------------------


@query(
    "barbell_projection",
    oracle=f"""
    WITH {_W0_SQL},
    t1 AS (
      SELECT *,
             SUM(CASE WHEN bucket IN ('core','spec') THEN w ELSE 0 END)
               OVER (PARTITION BY segment) AS risk0,
             SUM(w) OVER (PARTITION BY segment) AS total0
      FROM w0
    ),
    t1b AS (
      SELECT *, CASE WHEN bucket IN ('core','spec') AND risk0 > {R.RISK_MAX}
                     THEN w * {R.RISK_MAX} / risk0 ELSE w END AS w1
      FROM t1
    ),
    t2 AS (
      SELECT *,
             SUM(CASE WHEN bucket = 'core' THEN w1 ELSE 0 END)
               OVER (PARTITION BY segment) AS core1,
             SUM(CASE WHEN bucket = 'spec' THEN w1 ELSE 0 END)
               OVER (PARTITION BY segment) AS spec1
      FROM t1b
    ),
    t2b AS (
      SELECT *, CASE WHEN bucket = 'core' AND core1 > {R.CORE_MAX}
                     THEN w1 * {R.CORE_MAX} / core1
                     WHEN bucket = 'spec' AND spec1 > {R.SPEC_MAX}
                     THEN w1 * {R.SPEC_MAX} / spec1
                     ELSE w1 END AS w2
      FROM t2
    ),
    t3 AS (
      SELECT *,
             SUM(CASE WHEN bucket = 'safe' THEN w2 ELSE 0 END)
               OVER (PARTITION BY segment) AS safe2
      FROM t2b
    ),
    t3b AS (
      SELECT *, CASE WHEN safe2 < {R.SAFE_MIN} AND (total0 - safe2) > 0
                          AND safe2 > 0
                     THEN CASE WHEN bucket <> 'safe'
                          THEN w2 * GREATEST(0.0,
                                    1.0 - ({R.SAFE_MIN} - safe2)
                                          / (total0 - safe2))
                          ELSE w2 * (1.0 + ({R.SAFE_MIN} - safe2) / safe2) END
                     ELSE w2 END AS w3
      FROM t3
    ),
    t4 AS (
      SELECT *, CASE WHEN SUM(w3) OVER (PARTITION BY segment) > 0
                     THEN w3 * total0 / SUM(w3) OVER (PARTITION BY segment)
                     ELSE w3 END AS w_proj
      FROM t3b
    )
    SELECT segment, bucket, COUNT(*) AS n_symbols,
           ROUND(SUM(w), 6) AS w_before,
           ROUND(SUM(w_proj), 6) AS w_after
    FROM t4
    GROUP BY segment, bucket
    """,
)
def barbell_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: project raw segment weights into the barbell-feasible region
    (`risk/barbell_policy.py:120-190` project_to_feasible): risk-cap
    scale -> per-bucket caps -> safe-minimum redistribution ->
    renormalisation, each step a window over the bounded
    segment x nation aggregate. Symbol-level agreement with a
    pure-python replica of the reference algorithm, non-negativity,
    total preservation and the safe floor are asserted in
    tests/test_risk.py (the risk cap itself can be slightly exceeded
    after the safe-boost renormalisation — a reference property
    reproduced faithfully, see the test)."""
    w0 = _weights_frame(spark, sf_dir)
    proj = R.project_barbell(w0)
    return proj.groupBy("segment", "bucket").agg(
        F.count(F.lit(1)).alias("n_symbols"),
        r6(F.sum("w")).alias("w_before"),
        r6(F.sum("w_proj")).alias("w_after"),
    )


# ---------------------------------------------------------------------------
# R3 — confidence sizing with soft-cap ratio penalties + path-risk audit
# ---------------------------------------------------------------------------

_CAPS = R.EDGE_CAPS
_FLOORS = R.FLOORS

_CTX_SQL = f"""
    la AS (
      SELECT l_orderkey,
             AVG(l_discount) AS edge,
             10000.0 * AVG(l_tax) AS cost_bps,
             (MAX(l_extendedprice) - MIN(l_extendedprice))
               / SUM(l_extendedprice) AS gap_risk,
             AVG(l_quantity) / 10.0 AS funding_bpd,
             COUNT(*) AS horizon,
             SUM(l_extendedprice) AS depth_notional,
             1.0 + MAX(l_linenumber) / 10.0 AS leverage
      FROM lineitem GROUP BY l_orderkey
    ),
    ctx AS (
      SELECT o.o_orderkey,
             {_BUCKET_CASE} AS bucket,
             CASE o_orderpriority
                  WHEN '1-URGENT' THEN 'CRISIS'
                  WHEN '2-HIGH' THEN 'HIGH_VOL_TRENDING'
                  WHEN '3-MEDIUM' THEN 'MODERATE_TRENDING'
                  WHEN '4-NOT SPECIFIED' THEN 'LIQUID_RANGEBOUND'
                  ELSE NULL END AS regime,
             LEAST(CAST(o_totalprice AS DOUBLE) / 500000.0, 1.0) AS base_conf,
             la.edge, la.edge * 10000.0 AS edge_bps, la.cost_bps, la.gap_risk,
             la.funding_bpd, la.horizon, la.depth_notional, la.leverage,
             CAST(o_totalprice AS DOUBLE) / 20.0 AS order_notional
      FROM orders o
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN la ON la.l_orderkey = o.o_orderkey
    ),
    rat AS (
      SELECT *,
             CASE WHEN edge_bps > 0 THEN ROUND(cost_bps / edge_bps, 6) END
               AS r_cost,
             CASE WHEN edge > 0 THEN ROUND(gap_risk / edge, 6) END AS r_gap,
             CASE WHEN edge_bps > 0
                  THEN ROUND(funding_bpd * horizon / edge_bps, 6) END AS r_fund,
             CASE WHEN depth_notional > 0
                  THEN ROUND(order_notional / depth_notional, 6) END AS r_liq,
             ROUND(leverage, 6) AS lev
      FROM ctx
    ),
    pen AS (
      SELECT *,
             {_pen_sql('r_cost', _CAPS['roundtrip_cost_to_edge'], _FLOORS['cost'])} AS p_cost,
             {_pen_sql('r_gap', _CAPS['gap_risk_to_edge'], _FLOORS['gap'])} AS p_gap,
             {_pen_sql('r_fund', _CAPS['funding_to_edge'], _FLOORS['funding'])} AS p_fund,
             {_pen_sql('r_liq', _CAPS['liquidity_to_depth'], _FLOORS['liquidity'])} AS p_liq,
             CASE WHEN lev > 1.0
                  THEN GREATEST({_FLOORS['leverage']}, LEAST(1.0, 1.0 / lev))
                  ELSE 1.0 END AS p_lev
      FROM rat
    ),
    m AS (
      SELECT *,
             GREATEST(0.0, LEAST(1.0, LEAST(
               COALESCE(p_cost, 1.0), COALESCE(p_gap, 1.0),
               COALESCE(p_fund, 1.0), COALESCE(p_liq, 1.0), p_lev)))
               AS market_mult,
             {_bucket_mult_sql()} AS bucket_mult,
             {_regime_mult_sql()} AS regime_mult
      FROM pen
    )"""


@query(
    "barbell_confidence_sizing",
    oracle=f"""
    WITH {_CTX_SQL}
    SELECT bucket, COALESCE(regime, 'NONE') AS regime,
           COUNT(*) AS n_orders,
           ROUND(AVG(base_conf), 6) AS avg_base_conf,
           ROUND(AVG(market_mult), 6) AS avg_market_mult,
           ROUND(AVG(bucket_mult * regime_mult * market_mult), 6)
             AS avg_multiplier,
           ROUND(AVG(GREATEST(0.0, LEAST(1.0,
             base_conf * bucket_mult * regime_mult * market_mult))), 6)
             AS avg_effective_conf,
           CAST(SUM(CASE WHEN
                 COALESCE(r_cost <= {_CAPS['roundtrip_cost_to_edge']}, TRUE)
             AND COALESCE(r_gap <= {_CAPS['gap_risk_to_edge']}, TRUE)
             AND COALESCE(r_fund <= {_CAPS['funding_to_edge']}, TRUE)
             AND COALESCE(r_liq <= {_CAPS['liquidity_to_depth']}, TRUE)
             AND lev <= 1.0 / {_FLOORS['leverage']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_path_ok,
           CAST(SUM(CASE WHEN r_cost > {_CAPS['roundtrip_cost_to_edge']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_cost_fail,
           CAST(SUM(CASE WHEN r_gap > {_CAPS['gap_risk_to_edge']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_fail,
           CAST(SUM(CASE WHEN r_fund > {_CAPS['funding_to_edge']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_funding_fail,
           CAST(SUM(CASE WHEN r_liq > {_CAPS['liquidity_to_depth']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_liquidity_fail,
           CAST(SUM(CASE WHEN lev > 1.0 / {_FLOORS['leverage']}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_leverage_fail
    FROM m
    GROUP BY bucket, COALESCE(regime, 'NONE')
    """,
)
def barbell_confidence_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: apply_barbell_confidence + evaluate_barbell_path_risk
    (`risk/barbell_sizing.py:164-356`): per-order market context
    (cost/gap/funding/liquidity/leverage ratios from the order's
    lineitems), soft-cap penalties floored per ratio, market multiplier
    = min of applied penalties, x bucket x regime multiplier, effective
    confidence clamped to [0,1]; plus the binary path-risk audit counts.
    Ratios are rounded to 6 decimals BEFORE every penalty/threshold
    comparison on both sides (house boundary-stability rule).

    lineitem aggregates per order (one shuffle), dims broadcast by AQE;
    the sizing itself is pure codegen column algebra — linear scan at
    any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    la = li.groupBy("l_orderkey").agg(
        F.avg("l_discount").alias("edge"),
        (10000.0 * F.avg("l_tax")).alias("cost_bps"),
        (
            (F.max("l_extendedprice") - F.min("l_extendedprice"))
            / F.sum("l_extendedprice")
        ).alias("gap_risk"),
        (F.avg("l_quantity") / 10.0).alias("funding_bpd"),
        F.count(F.lit(1)).alias("horizon"),
        F.sum("l_extendedprice").alias("depth_notional"),
        (1.0 + F.max("l_linenumber") / 10.0).alias("leverage"),
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ctx = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(la, la.l_orderkey == o.o_orderkey)
        .select(
            R.bucket_expr(F.col("n_name")).alias("bucket"),
            F.when(F.col("o_orderpriority") == "1-URGENT", "CRISIS")
            .when(F.col("o_orderpriority") == "2-HIGH", "HIGH_VOL_TRENDING")
            .when(F.col("o_orderpriority") == "3-MEDIUM", "MODERATE_TRENDING")
            .when(
                F.col("o_orderpriority") == "4-NOT SPECIFIED",
                "LIQUID_RANGEBOUND",
            )
            .alias("regime"),
            F.least(
                F.col("o_totalprice").cast("double") / 500000.0, F.lit(1.0)
            ).alias("base_conf"),
            "edge",
            (F.col("edge") * 10000.0).alias("edge_bps"),
            "cost_bps",
            "gap_risk",
            "funding_bpd",
            "horizon",
            "depth_notional",
            "leverage",
            (F.col("o_totalprice").cast("double") / 20.0).alias("order_notional"),
        )
    )
    rat = ctx.select(
        "*",
        F.when(
            F.col("edge_bps") > 0, F.round(F.col("cost_bps") / F.col("edge_bps"), 6)
        ).alias("r_cost"),
        F.when(
            F.col("edge") > 0, F.round(F.col("gap_risk") / F.col("edge"), 6)
        ).alias("r_gap"),
        F.when(
            F.col("edge_bps") > 0,
            F.round(F.col("funding_bpd") * F.col("horizon") / F.col("edge_bps"), 6),
        ).alias("r_fund"),
        F.when(
            F.col("depth_notional") > 0,
            F.round(F.col("order_notional") / F.col("depth_notional"), 6),
        ).alias("r_liq"),
        F.round(F.col("leverage"), 6).alias("lev"),
    )
    pen = rat.select(
        "*",
        R.ratio_penalty(
            F.col("r_cost"), _CAPS["roundtrip_cost_to_edge"], _FLOORS["cost"]
        ).alias("p_cost"),
        R.ratio_penalty(
            F.col("r_gap"), _CAPS["gap_risk_to_edge"], _FLOORS["gap"]
        ).alias("p_gap"),
        R.ratio_penalty(
            F.col("r_fund"), _CAPS["funding_to_edge"], _FLOORS["funding"]
        ).alias("p_fund"),
        R.ratio_penalty(
            F.col("r_liq"), _CAPS["liquidity_to_depth"], _FLOORS["liquidity"]
        ).alias("p_liq"),
        F.when(
            F.col("lev") > 1.0,
            F.greatest(
                F.lit(_FLOORS["leverage"]), F.least(F.lit(1.0), 1.0 / F.col("lev"))
            ),
        )
        .otherwise(1.0)
        .alias("p_lev"),
    )
    m = pen.select(
        "*",
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.least(
                    F.coalesce(F.col("p_cost"), F.lit(1.0)),
                    F.coalesce(F.col("p_gap"), F.lit(1.0)),
                    F.coalesce(F.col("p_fund"), F.lit(1.0)),
                    F.coalesce(F.col("p_liq"), F.lit(1.0)),
                    F.col("p_lev"),
                ),
            ),
        ).alias("market_mult"),
        R.bucket_mult_expr(F.col("bucket")).alias("bucket_mult"),
        R.regime_mult_expr(F.col("bucket"), F.col("regime")).alias("regime_mult"),
    )
    lev_cap = 1.0 / _FLOORS["leverage"]

    def ok(col: str, cap: float):
        return F.coalesce(F.col(col) <= cap, F.lit(True))

    path_ok = (
        ok("r_cost", _CAPS["roundtrip_cost_to_edge"])
        & ok("r_gap", _CAPS["gap_risk_to_edge"])
        & ok("r_fund", _CAPS["funding_to_edge"])
        & ok("r_liq", _CAPS["liquidity_to_depth"])
        & (F.col("lev") <= lev_cap)
    )
    mult = F.col("bucket_mult") * F.col("regime_mult") * F.col("market_mult")
    return m.groupBy(
        "bucket", F.coalesce(F.col("regime"), F.lit("NONE")).alias("regime")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        r6(F.avg("base_conf")).alias("avg_base_conf"),
        r6(F.avg("market_mult")).alias("avg_market_mult"),
        r6(F.avg(mult)).alias("avg_multiplier"),
        r6(
            F.avg(
                F.greatest(
                    F.lit(0.0), F.least(F.lit(1.0), F.col("base_conf") * mult)
                )
            )
        ).alias("avg_effective_conf"),
        F.sum(path_ok.cast("long")).alias("n_path_ok"),
        F.sum(
            (F.col("r_cost") > _CAPS["roundtrip_cost_to_edge"]).cast("long")
        ).alias("n_cost_fail"),
        F.sum((F.col("r_gap") > _CAPS["gap_risk_to_edge"]).cast("long")).alias(
            "n_gap_fail"
        ),
        F.sum((F.col("r_fund") > _CAPS["funding_to_edge"]).cast("long")).alias(
            "n_funding_fail"
        ),
        F.sum(
            (F.col("r_liq") > _CAPS["liquidity_to_depth"]).cast("long")
        ).alias("n_liquidity_fail"),
        F.sum((F.col("lev") > lev_cap).cast("long")).alias("n_leverage_fail"),
    )


# ---------------------------------------------------------------------------
# R4 — NAV bucket allocation
# ---------------------------------------------------------------------------


def _nav_case(table: dict[str, float], col: str = "bucket") -> str:
    whens = " ".join(f"WHEN '{b}' THEN {v}" for b, v in table.items())
    return f"CASE {col} {whens} ELSE 0.0 END"


@query(
    "nav_bucket_allocation",
    oracle=f"""
    WITH {_W0_SQL},
    br AS (
      -- DECIMAL sums: order-independent, so the 2dp rounding of
      -- target*nav cannot flip with aggregation order
      SELECT segment, bucket, COUNT(*) AS n_symbols,
             SUM(w) AS rel_w,
             CAST(SUM(SUM(CAST(notional AS DECIMAL(28,6))))
                  OVER (PARTITION BY segment) AS DOUBLE) AS nav
      FROM w0 GROUP BY segment, bucket
    )
    SELECT segment, bucket, n_symbols,
           ROUND(rel_w, 6) AS w_before,
           ROUND(CASE WHEN rel_w > 0
                 THEN LEAST(GREATEST({_nav_case(R.NAV_BASE)},
                                     {_nav_case(R.NAV_MIN)}),
                            {_nav_case(R.NAV_MAX)})
                 ELSE 0.0 END, 6) AS w_after,
           ROUND(CASE WHEN rel_w > 0
                 THEN LEAST(GREATEST({_nav_case(R.NAV_BASE)},
                                     {_nav_case(R.NAV_MIN)}),
                            {_nav_case(R.NAV_MAX)})
                 ELSE 0.0 END * nav, 2) AS bucket_nav
    FROM br
    """,
)
def nav_bucket_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: NAV bucket budgets (`risk/nav_allocator.py:35-76`
    apply_nav_allocator): per-bucket relative weights are replaced by
    the clamped NAV fraction target (base clamped to [min, max]) when
    the bucket holds any weight; symbol-level redistribution within a
    bucket is proportional, so the bucket grain IS the target fraction.
    Emitted per (segment, bucket) with the absolute bucket NAV."""
    w0 = _weights_frame(spark, sf_dir)

    def nav_expr(table: dict[str, float]):
        expr = F.lit(0.0)
        for b, v in table.items():
            expr = F.when(F.col("bucket") == b, F.lit(v)).otherwise(expr)
        return expr

    seg = Window.partitionBy("segment")
    # DECIMAL notional sums: exact and order-independent, so the 2dp
    # rounding of target*nav is stable across runs and engines
    br = (
        w0.groupBy("segment", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_symbols"),
            F.sum("w").alias("rel_w"),
            F.sum(F.col("notional").cast("decimal(28,6)")).alias(
                "bucket_notional"
            ),
        )
        .withColumn(
            "nav", F.sum("bucket_notional").over(seg).cast("double")
        )
    )
    target = F.when(
        F.col("rel_w") > 0,
        F.least(
            F.greatest(nav_expr(R.NAV_BASE), nav_expr(R.NAV_MIN)),
            nav_expr(R.NAV_MAX),
        ),
    ).otherwise(0.0)
    return br.select(
        "segment",
        "bucket",
        "n_symbols",
        r6(F.col("rel_w")).alias("w_before"),
        r6(target).alias("w_after"),
        F.round(target * F.col("nav"), 2).alias("bucket_nav"),
    )


# ---------------------------------------------------------------------------
# R5 — real-time portfolio risk alerts
# ---------------------------------------------------------------------------


@query(
    "portfolio_risk_alerts",
    oracle=f"""
    WITH sv AS (SELECT user_id, ts, event_id, value
                FROM events WHERE value > 0),
    s AS (
      SELECT user_id,
             ROW_NUMBER() OVER w AS rn,
             ROUND((MAX(value) OVER pk - value) / MAX(value) OVER pk, 6) AS dd,
             ROUND(value / LAG(value) OVER w - 1.0, 6) AS ret
      FROM sv
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             pk AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id, COUNT(*) AS n_bars,
           ROUND(MAX(dd), 6) AS max_drawdown,
           ROUND(MAX_BY(dd, rn), 6) AS final_drawdown,
           CASE WHEN COUNT(ret) >= 2
                THEN ROUND(STDDEV_POP(ret) * SQRT(252.0), 6)
                ELSE 0.0 END AS vol_annualized,
           CASE WHEN COUNT(ret) >= 10
                THEN ROUND(ABS(AVG(ret) + ({R.Z_05}) * STDDEV_POP(ret)), 6)
                ELSE 0.0 END AS var95,
           CAST(SUM(CASE WHEN dd >= {R.MAX_DRAWDOWN} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_critical_dd,
           CAST(SUM(CASE WHEN dd >= {R.WARNING_DRAWDOWN}
                          AND dd < {R.MAX_DRAWDOWN} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_warning_dd,
           CAST(SUM(CASE WHEN ret < -{R.MAX_DAILY_LOSS} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_daily_loss,
           (CASE WHEN COUNT(ret) >= 2
                 THEN ROUND(STDDEV_POP(ret) * SQRT(252.0), 6)
                 ELSE 0.0 END) > {R.VOLATILITY_THRESHOLD} AS vol_alert,
           CASE WHEN SUM(CASE WHEN dd >= {R.MAX_DRAWDOWN} THEN 1 ELSE 0 END) > 0
                  OR SUM(CASE WHEN ret < -{R.MAX_DAILY_LOSS} THEN 1 ELSE 0 END) > 0
                THEN 'CRITICAL'
                WHEN SUM(CASE WHEN dd >= {R.WARNING_DRAWDOWN}
                              AND dd < {R.MAX_DRAWDOWN} THEN 1 ELSE 0 END) > 0
                  OR (CASE WHEN COUNT(ret) >= 2
                           THEN ROUND(STDDEV_POP(ret) * SQRT(252.0), 6)
                           ELSE 0.0 END) > {R.VOLATILITY_THRESHOLD}
                THEN 'WARNING'
                ELSE 'NORMAL' END AS status
    FROM s GROUP BY user_id
    """,
)
def portfolio_risk_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: batch replay of the real-time risk monitor
    (`risk/real_time_risk_manager.py:102-331`): running-peak drawdown
    vs the 10%/15% warning/critical limits, 5% daily-loss breaches,
    full-history annualised volatility (np.std ddof=0 -> STDDEV_POP),
    parametric VaR(95) with the z = norm.ppf(0.05) literal shared by
    both engines, severity rollup to CRITICAL/WARNING/NORMAL. One
    window pass + one aggregation per user."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = ev.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.col("value"),
    )
    return R.risk_alert_summary(series, key="user_id", order_col="rn")


# ---------------------------------------------------------------------------
# R6 — barbell promotion gate (staged-input oracle)
# ---------------------------------------------------------------------------

_PROMO_GLOB = (
    "__ORACLE_STAGE__/paper_trades/*.parquet"
)

_PROMO_BUCKET = (
    "CASE WHEN user_id % 5 = 0 THEN 'safe' "
    "WHEN user_id % 5 IN (1, 2) THEN 'core' "
    "WHEN user_id % 5 = 3 THEN 'spec' ELSE 'other' END"
)


@query(
    "barbell_promotion_decision",
    oracle=f"""
    WITH t AS (
      SELECT user_id, entry_rn, exit_rn, realized_pnl,
             {_PROMO_BUCKET} AS bucket
      FROM read_parquet('{_PROMO_GLOB}')
    ),
    arms AS (
      SELECT 'ts_only' AS arm, user_id, entry_rn, exit_rn,
             CAST(CAST(ROUND(realized_pnl, 6) AS DECIMAL(18,6))
                  AS DECIMAL(22,8)) AS pnl
      FROM t
      UNION ALL
      SELECT 'barbell_sized', user_id, entry_rn, exit_rn,
             CAST(CAST(ROUND(realized_pnl, 6) AS DECIMAL(18,6))
                  * CAST({_bucket_mult_sql()} AS DECIMAL(3,2))
                  AS DECIMAL(22,8))
      FROM t
    ),
    c1 AS (
      SELECT arm, user_id, entry_rn, exit_rn, pnl,
             SUM(pnl) OVER (PARTITION BY arm
               ORDER BY exit_rn, user_id, entry_rn
               ROWS UNBOUNDED PRECEDING) AS cum,
             NTILE(10) OVER (PARTITION BY arm
               ORDER BY pnl, user_id, entry_rn) AS decile
      FROM arms
    ),
    c2 AS (
      SELECT arm, pnl, decile,
             MAX(cum) OVER (PARTITION BY arm
               ORDER BY exit_rn, user_id, entry_rn
               ROWS UNBOUNDED PRECEDING) - cum AS dd
      FROM c1
    ),
    per_arm AS (
      SELECT arm,
             COUNT(*) AS n_trades,
             CAST(SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS losing,
             CAST(SUM(pnl) AS DOUBLE) AS total_pnl,
             ROUND(CAST(SUM(CASE WHEN pnl > 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END) AS DOUBLE)
               / GREATEST(CAST(ABS(SUM(CASE WHEN pnl < 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END)) AS DOUBLE),
                          1e-9), 6) AS profit_factor,
             CAST(MAX(dd) AS DOUBLE) AS max_drawdown,
             ROUND(CAST(SUM(CASE WHEN decile = 1 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END) AS DOUBLE)
               / GREATEST(SUM(CASE WHEN decile = 1 THEN 1 ELSE 0 END), 1), 6)
               AS expected_shortfall,
             ROUND((CAST(SUM(CASE WHEN pnl > 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END) AS DOUBLE)
                    / GREATEST(SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END), 1))
               / GREATEST(
                   CAST(ABS(SUM(CASE WHEN pnl < 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END)) AS DOUBLE)
                   / GREATEST(SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END), 1),
                   1e-9), 6) AS payoff_asymmetry,
             ROUND(CAST(MAX(CASE WHEN pnl > 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END) AS DOUBLE)
               / GREATEST(CAST(SUM(CASE WHEN pnl > 0 THEN pnl
                               ELSE CAST(0 AS DECIMAL(22,8)) END) AS DOUBLE),
                          1e-9), 6) AS winner_concentration
      FROM c2 GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'ts_only' THEN total_pnl END) AS base_total_pnl,
        MAX(CASE WHEN arm = 'ts_only' THEN profit_factor END) AS base_pf,
        MAX(CASE WHEN arm = 'ts_only' THEN max_drawdown END) AS base_dd,
        MAX(CASE WHEN arm = 'ts_only' THEN expected_shortfall END) AS base_es,
        MAX(CASE WHEN arm = 'barbell_sized' THEN n_trades END) AS bb_n,
        MAX(CASE WHEN arm = 'barbell_sized' THEN losing END) AS bb_losing,
        MAX(CASE WHEN arm = 'barbell_sized' THEN total_pnl END) AS bb_total_pnl,
        MAX(CASE WHEN arm = 'barbell_sized' THEN profit_factor END) AS bb_pf,
        MAX(CASE WHEN arm = 'barbell_sized' THEN max_drawdown END) AS bb_dd,
        MAX(CASE WHEN arm = 'barbell_sized' THEN expected_shortfall END)
          AS bb_es,
        MAX(CASE WHEN arm = 'barbell_sized' THEN payoff_asymmetry END)
          AS bb_payoff,
        MAX(CASE WHEN arm = 'barbell_sized' THEN winner_concentration END)
          AS bb_wc
      FROM per_arm
    ),
    checks AS (
      SELECT 'trade_support' AS check_name,
             bb_n >= {R.MIN_TOTAL_TRADES} AS passed,
             CAST(bb_n AS DOUBLE) AS observed,
             CAST({R.MIN_TOTAL_TRADES} AS DOUBLE) AS threshold FROM wide
      UNION ALL
      SELECT 'loss_support', bb_losing >= {R.MIN_LOSING_TRADES},
             CAST(bb_losing AS DOUBLE), CAST({R.MIN_LOSING_TRADES} AS DOUBLE)
      FROM wide
      UNION ALL
      SELECT 'pnl_delta',
             ROUND(bb_total_pnl - base_total_pnl, 6) > 0
               OR ROUND(bb_pf - base_pf, 6) > 0,
             ROUND(bb_total_pnl - base_total_pnl, 6), 0.0 FROM wide
      UNION ALL
      SELECT 'drawdown_regression', ROUND(bb_dd - base_dd, 6) <= 0,
             ROUND(bb_dd - base_dd, 6), 0.0 FROM wide
      UNION ALL
      SELECT 'expected_shortfall_regression', bb_es >= base_es,
             ROUND(bb_es - base_es, 6), 0.0 FROM wide
      UNION ALL
      SELECT 'payoff_asymmetry_effective',
             bb_payoff >= {R.MIN_PAYOFF_ASYMMETRY}, bb_payoff,
             {R.MIN_PAYOFF_ASYMMETRY} FROM wide
      UNION ALL
      SELECT 'winner_concentration',
             bb_wc <= {R.MAX_WINNER_CONCENTRATION}, bb_wc,
             {R.MAX_WINNER_CONCENTRATION} FROM wide
      UNION ALL
      SELECT 'promote',
             bb_n >= {R.MIN_TOTAL_TRADES}
             AND bb_losing >= {R.MIN_LOSING_TRADES}
             AND (ROUND(bb_total_pnl - base_total_pnl, 6) > 0
                  OR ROUND(bb_pf - base_pf, 6) > 0)
             AND ROUND(bb_dd - base_dd, 6) <= 0
             AND bb_es >= base_es
             AND bb_payoff >= {R.MIN_PAYOFF_ASYMMETRY}
             AND bb_wc <= {R.MAX_WINNER_CONCENTRATION},
             CAST(NULL AS DOUBLE), 0.0 FROM wide
    )
    SELECT * FROM checks
    """,
)
def barbell_promotion_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: the barbell promotion gate
    (`risk/barbell_promotion_gate.py:248-428` decide_promotion_from_
    report): baseline (ts_only) vs barbell-sized arm metrics over the
    cached paper-trading simulation, threshold checks (trade/loss
    support, PnL delta, drawdown & expected-shortfall regression,
    payoff asymmetry, winner concentration) and the final promote
    verdict. Trades are STAGED so the oracle re-derives both arms and
    every check from the raw rows — the gate logic is what gets
    differentially verified (the simulation itself stays pinned by
    scenario tests). The omega-antifragility evidence the reference
    gate additionally consumes is produced by the companion queries
    `omega_robustness_curve` (R11), `omega_bootstrap_gate` (R12) and
    `es_payoff_support_gate` (R13)."""
    from .queries_models import _simulated_trades

    # trades are staged as paper_trades inside _simulated_trades; the
    # promotion oracle reads the same staged rows
    trades = _simulated_trades(spark, sf_dir)
    bucket = (
        F.when(F.col("user_id") % 5 == 0, "safe")
        .when((F.col("user_id") % 5).isin(1, 2), "core")
        .when(F.col("user_id") % 5 == 3, "spec")
        .otherwise("other")
    )
    return R.promotion_checks(trades, bucket)


# ---------------------------------------------------------------------------
# R7 — ensemble error decomposition
# ---------------------------------------------------------------------------

_F_SQL = f"""
    f AS (
      SELECT user_id, rn, value,
             LAG(value, 1) OVER wp AS f_naive,
             AVG(value) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS f_ma3,
             AVG(value) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS f_ma10
      FROM s WINDOW wp AS (PARTITION BY user_id ORDER BY rn)
      QUALIFY rn >= 11
    )"""

_BEST_CASE = """CASE
             WHEN ROUND(rmse_ma10, 6) <= ROUND(rmse_ma3, 6)
              AND ROUND(rmse_ma10, 6) <= ROUND(rmse_naive, 6) THEN 'ma10'
             WHEN ROUND(rmse_ma3, 6) <= ROUND(rmse_naive, 6) THEN 'ma3'
             ELSE 'naive' END"""


@query(
    "ensemble_error_decomposition",
    oracle=f"""
    WITH s AS ({_S_SQL}),
    {_F_SQL},
    e AS (
      SELECT user_id, COUNT(*) AS n,
             SQRT(AVG(POWER(value - f_naive, 2))) AS rmse_naive,
             SQRT(AVG(POWER(value - f_ma3, 2))) AS rmse_ma3,
             SQRT(AVG(POWER(value - f_ma10, 2))) AS rmse_ma10
      FROM f GROUP BY user_id HAVING COUNT(*) > 10
    ),
    w AS (
      SELECT *, 1/rmse_naive + 1/rmse_ma3 + 1/rmse_ma10 AS z,
             {_BEST_CASE} AS best_model,
             LEAST(rmse_naive, rmse_ma3, rmse_ma10) AS best_rmse
      FROM e
    ),
    j AS (
      SELECT f.user_id, w.best_model, w.best_rmse,
             f.value - ((1/w.rmse_naive)/w.z * f.f_naive
                        + (1/w.rmse_ma3)/w.z * f.f_ma3
                        + (1/w.rmse_ma10)/w.z * f.f_ma10) AS e_ens,
             f.value - f.f_naive AS e_naive,
             f.value - f.f_ma3 AS e_ma3,
             f.value - f.f_ma10 AS e_ma10
      FROM f JOIN w ON f.user_id = w.user_id
    )
    SELECT user_id, COUNT(*) AS n,
           ANY_VALUE(best_model) AS best_model,
           ROUND(ANY_VALUE(best_rmse), 6) AS best_model_rmse,
           ROUND(SQRT(AVG(POWER(e_ens, 2))), 6) AS ensemble_rmse,
           ROUND(SQRT(AVG(POWER(e_ens, 2))) / ANY_VALUE(best_rmse), 6)
             AS rmse_ratio,
           ROUND(SQRT(AVG(POWER(e_ens, 2))) - ANY_VALUE(best_rmse), 6)
             AS excess_error,
           ROUND(POWER(AVG(e_ens), 2), 6) AS bias_squared,
           ROUND(VAR_POP(e_ens), 6) AS ensemble_variance,
           ROUND(CASE ANY_VALUE(best_model)
                 WHEN 'ma10' THEN VAR_POP(e_ma10)
                 WHEN 'ma3' THEN VAR_POP(e_ma3)
                 ELSE VAR_POP(e_naive) END, 6) AS best_model_variance,
           ROUND(VAR_POP(e_ens) - CASE ANY_VALUE(best_model)
                 WHEN 'ma10' THEN VAR_POP(e_ma10)
                 WHEN 'ma3' THEN VAR_POP(e_ma3)
                 ELSE VAR_POP(e_naive) END, 6) AS excess_variance
    FROM j GROUP BY user_id
    """,
)
def ensemble_error_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: ensemble error decomposition vs the best single model
    (`forcester_ts/ensemble_diagnostics.py:121-167`
    compute_error_decomposition): inverse-RMSE-weighted ensemble errors
    split into bias-squared + population variance (the identity
    ensemble_rmse^2 = bias^2 + variance is asserted in tests), RMSE
    ratio / excess error / excess variance vs the per-key best model
    (min RMSE, alphabetical tiebreak on rounded values). Two passes
    over the same per-key window frame: one to fit the weights, one to
    score the weighted errors — both shuffle on user_id only."""
    s = _series(spark, sf_dir)
    wp = _w()
    f = s.select(
        "user_id",
        "rn",
        "value",
        F.lag("value", 1).over(wp).alias("f_naive"),
        F.avg("value").over(_w((-3, -1))).alias("f_ma3"),
        F.avg("value").over(_w((-10, -1))).alias("f_ma10"),
    ).filter(F.col("rn") >= 11)

    def rmse(c: str):
        return F.sqrt(F.avg(F.pow(F.col("value") - F.col(c), 2)))

    e = (
        f.groupBy("user_id")
        .agg(
            rmse("f_naive").alias("rmse_naive"),
            rmse("f_ma3").alias("rmse_ma3"),
            rmse("f_ma10").alias("rmse_ma10"),
            F.count(F.lit(1)).alias("n_fit"),
        )
        .filter(F.col("n_fit") > 10)
    )
    r10, r3, rn_ = (
        F.round(F.col("rmse_ma10"), 6),
        F.round(F.col("rmse_ma3"), 6),
        F.round(F.col("rmse_naive"), 6),
    )
    w = e.select(
        "user_id",
        "rmse_naive",
        "rmse_ma3",
        "rmse_ma10",
        (
            1 / F.col("rmse_naive") + 1 / F.col("rmse_ma3") + 1 / F.col("rmse_ma10")
        ).alias("z"),
        F.when((r10 <= r3) & (r10 <= rn_), "ma10")
        .when(r3 <= rn_, "ma3")
        .otherwise("naive")
        .alias("best_model"),
        F.least("rmse_naive", "rmse_ma3", "rmse_ma10").alias("best_rmse"),
    )
    j = f.join(w, "user_id").select(
        "user_id",
        "best_model",
        "best_rmse",
        (
            F.col("value")
            - (
                (1 / F.col("rmse_naive")) / F.col("z") * F.col("f_naive")
                + (1 / F.col("rmse_ma3")) / F.col("z") * F.col("f_ma3")
                + (1 / F.col("rmse_ma10")) / F.col("z") * F.col("f_ma10")
            )
        ).alias("e_ens"),
        (F.col("value") - F.col("f_naive")).alias("e_naive"),
        (F.col("value") - F.col("f_ma3")).alias("e_ma3"),
        (F.col("value") - F.col("f_ma10")).alias("e_ma10"),
    )
    best_var = (
        F.when(
            F.first("best_model") == "ma10", F.var_pop("e_ma10")
        )
        .when(F.first("best_model") == "ma3", F.var_pop("e_ma3"))
        .otherwise(F.var_pop("e_naive"))
    )
    ens_rmse = F.sqrt(F.avg(F.pow(F.col("e_ens"), 2)))
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("best_model").alias("best_model"),
        r6(F.first("best_rmse")).alias("best_model_rmse"),
        r6(ens_rmse).alias("ensemble_rmse"),
        r6(ens_rmse / F.first("best_rmse")).alias("rmse_ratio"),
        r6(ens_rmse - F.first("best_rmse")).alias("excess_error"),
        r6(F.pow(F.avg("e_ens"), 2)).alias("bias_squared"),
        r6(F.var_pop("e_ens")).alias("ensemble_variance"),
        r6(best_var).alias("best_model_variance"),
        r6(F.var_pop("e_ens") - best_var).alias("excess_variance"),
    )


# ---------------------------------------------------------------------------
# R8 — residual white-noise verdict
# ---------------------------------------------------------------------------


@query(
    "residual_white_noise",
    oracle=f"""
    WITH s AS ({_S_SQL}),
    {_F_SQL},
    r AS (SELECT user_id, rn, value - f_ma3 AS resid FROM f),
    l AS (
      SELECT user_id, resid,
             LAG(resid, 1) OVER wp AS l1, LAG(resid, 2) OVER wp AS l2,
             LAG(resid, 3) OVER wp AS l3, LAG(resid, 4) OVER wp AS l4,
             LAG(resid, 5) OVER wp AS l5, LAG(resid, 6) OVER wp AS l6
      FROM r WINDOW wp AS (PARTITION BY user_id ORDER BY rn)
    ),
    a AS (
      SELECT user_id, COUNT(resid) AS n,
             CORR(resid, l1) AS r1, CORR(resid, l2) AS r2,
             CORR(resid, l3) AS r3, CORR(resid, l4) AS r4,
             CORR(resid, l5) AS r5, CORR(resid, l6) AS r6,
             AVG(resid) AS m1, AVG(resid*resid) AS m2,
             AVG(resid*resid*resid) AS m3,
             AVG(resid*resid*resid*resid) AS m4
      FROM l GROUP BY user_id HAVING COUNT(resid) >= 13
    ),
    st AS (
      SELECT user_id, n,
             ROUND(n * (n + 2.0) * (
               r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3) +
               r4*r4/(n-4) + r5*r5/(n-5) + r6*r6/(n-6)), 6) AS lb_stat,
             ROUND(n / 6.0 * (
               POWER((m3 - 3*m1*m2 + 2*m1*m1*m1)
                     / POWER(m2 - m1*m1, 1.5), 2)
               + POWER((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*m1*m1*m1*m1)
                       / POWER(m2 - m1*m1, 2) - 3, 2) / 4), 6) AS jb_stat
      FROM a
    ),
    p AS (
      SELECT user_id, n, lb_stat,
             ROUND(EXP(-lb_stat/2.0)
                   * (1.0 + lb_stat/2.0 + lb_stat*lb_stat/8.0), 6)
               AS lb_pvalue,
             jb_stat,
             ROUND(EXP(-jb_stat/2.0), 6) AS jb_pvalue
      FROM st
    )
    SELECT user_id, n, lb_stat, lb_pvalue, jb_stat, jb_pvalue,
           lb_pvalue > 0.05 AND jb_pvalue > 0.05 AS white_noise
    FROM p
    """,
)
def residual_white_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: the shared residual diagnostic
    (`forcester_ts/residual_diagnostics.py:19-98` run_residual_
    diagnostics): Ljung-Box (lags 1..6) + Jarque-Bera on the MA(3)
    forecaster's residuals per key, with closed-form chi-square
    p-values (chi2(6) even-dof series, chi2(2) = exp(-x/2)) and the
    combined white-noise verdict (both p > 0.05). Same one-window +
    one-agg shape as the `ljung_box` query."""
    s = _series(spark, sf_dir)
    f = s.select(
        "user_id",
        "rn",
        "value",
        F.avg("value").over(_w((-3, -1))).alias("f_ma3"),
    ).filter(F.col("rn") >= 11)
    resid = f.select(
        "user_id", "rn", (F.col("value") - F.col("f_ma3")).alias("resid")
    )
    return R.white_noise_verdict(resid)


# ---------------------------------------------------------------------------
# R9 — warm-start order suggestion ladder
# ---------------------------------------------------------------------------


@query(
    "order_warmstart_suggest",
    oracle=f"""
    WITH s AS ({_S_SQL}),
    obs AS (
      SELECT user_id, lr,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS idx,
             COUNT(*) OVER (PARTITION BY user_id) AS n_full,
             STDDEV_SAMP(lr) OVER (PARTITION BY user_id) AS sd_full
      FROM s WHERE lr IS NOT NULL
    ),
    arms AS (
      SELECT user_id, 1 AS fitted_at, lr, idx, n_full, sd_full FROM obs
      WHERE idx <= FLOOR(n_full / 2.0)
      UNION ALL
      SELECT user_id, 2 AS fitted_at, lr, idx, n_full, sd_full FROM obs
      WHERE idx <= FLOOR(3.0 * n_full / 4.0)
    ),
    lagd AS (
      SELECT user_id, fitted_at, lr, n_full, sd_full,
             LAG(lr, 1) OVER wp AS l1, LAG(lr, 2) OVER wp AS l2
      FROM arms WINDOW wp AS (PARTITION BY user_id, fitted_at ORDER BY idx)
    ),
    m AS (
      SELECT user_id, fitted_at, COUNT(lr) AS n_obs,
             VAR_POP(lr) AS c0, CORR(lr, l1) AS rho1, CORR(lr, l2) AS rho2,
             STDDEV_SAMP(lr) AS sd, ANY_VALUE(sd_full) AS sd_full
      FROM lagd GROUP BY user_id, fitted_at
      HAVING COUNT(lr) >= 12 AND VAR_POP(lr) > 0
             AND ABS(CORR(lr, l1)) < 1.0
    ),
    yw AS (
      SELECT *,
             c0 * (1 - rho1*rho1) AS sig1,
             (rho2 - rho1*rho1) / (1 - rho1*rho1) AS phi2,
             rho1 * (1 - rho2) / (1 - rho1*rho1) AS phi1
      FROM m
    ),
    aic AS (
      SELECT user_id, fitted_at, n_obs, sd, sd_full,
             CASE WHEN sig1 > 0 THEN n_obs * LN(sig1) + 4.0 END AS aic1,
             CASE WHEN c0 * (1 - phi1*rho1 - phi2*rho2) > 0
                  THEN n_obs * LN(c0 * (1 - phi1*rho1 - phi2*rho2)) + 6.0
             END AS aic2
      FROM yw
    ),
    fits AS (
      SELECT user_id, fitted_at, n_obs,
             CASE WHEN aic2 IS NOT NULL
                       AND (aic1 IS NULL OR ROUND(aic2, 6) < ROUND(aic1, 6))
                  THEN 2 ELSE 1 END AS best_p,
             ROUND(CASE WHEN aic2 IS NOT NULL
                        AND (aic1 IS NULL OR ROUND(aic2, 6) < ROUND(aic1, 6))
                   THEN aic2 ELSE aic1 END, 6) AS aic,
             CASE WHEN ROUND(sd / sd_full, 6) < 0.9 THEN 'LIQUID_RANGEBOUND'
                  WHEN ROUND(sd / sd_full, 6) <= 1.1 THEN 'MODERATE_TRENDING'
                  ELSE 'HIGH_VOL_TRENDING' END AS regime
      FROM aic WHERE aic1 IS NOT NULL
    ),
    rec AS (
      SELECT user_id, STDDEV_SAMP(lr) AS sd, COUNT(*) AS n_rec,
             ANY_VALUE(sd_full) AS sd_full, ANY_VALUE(n_full) AS n_full
      FROM obs WHERE idx > FLOOR(3.0 * n_full / 4.0)
      GROUP BY user_id
      HAVING COUNT(*) >= 5 AND STDDEV_SAMP(lr) IS NOT NULL
             AND ANY_VALUE(sd_full) > 0
    ),
    cur AS (
      SELECT user_id,
             CASE WHEN ROUND(sd / sd_full, 6) < 0.9 THEN 'LIQUID_RANGEBOUND'
                  WHEN ROUND(sd / sd_full, 6) <= 1.1 THEN 'MODERATE_TRENDING'
                  ELSE 'HIGH_VOL_TRENDING' END AS regime,
             n_full AS n_obs
      FROM rec
    ),
    exact AS (
      SELECT user_id, regime, best_p AS exact_p, aic AS exact_aic,
             n_obs AS exact_n
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, regime
                  ORDER BY fitted_at DESC, aic ASC, best_p ASC) AS rk
            FROM fits) WHERE rk = 1
    ),
    gsel AS (
      SELECT user_id, best_p AS global_p
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY fitted_at DESC, aic ASC, best_p ASC) AS rk
            FROM fits) WHERE rk = 1
    ),
    pop AS (
      SELECT regime, best_p AS pop_p
      FROM (SELECT regime, best_p, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY regime
                     ORDER BY COUNT(*) DESC, best_p ASC) AS rk
            FROM fits GROUP BY regime, best_p) WHERE rk = 1
    )
    SELECT cur.user_id, cur.regime AS current_regime,
           COALESCE(exact_p, global_p, pop_p) AS suggested_p,
           CASE WHEN exact_p IS NOT NULL THEN 'regime'
                WHEN global_p IS NOT NULL THEN 'global'
                WHEN pop_p IS NOT NULL THEN 'population'
                ELSE 'none' END AS source,
           COALESCE(exact_p IS NOT NULL
                    AND exact_n >= {R.SKIP_FRACTION} * cur.n_obs, FALSE)
             AS skip_grid,
           exact_aic AS cache_aic
    FROM cur
    LEFT JOIN exact ON cur.user_id = exact.user_id
                   AND cur.regime = exact.regime
    LEFT JOIN gsel ON cur.user_id = gsel.user_id
    LEFT JOIN pop ON cur.regime = pop.regime
    """,
)
def order_warmstart_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9: warm-start order cache (`forcester_ts/order_learner.py:
    160-323`): a fits history (two nested training windows per key,
    AR(1)/AR(2) chosen by closed-form Yule-Walker AIC, regime = the
    window's vol relative to the key's full-series vol) queried with
    the reference's fallback ladder — exact (key, regime) latest fit ->
    latest fit in ANY regime (GLOBAL) -> population-modal order for the
    regime — plus the skip-grid decision (cached fit covers >=
    SKIP_FRACTION of the current window). The current regime comes from
    the most recent quarter, so regime shifts genuinely exercise the
    global fallback. Everything is per-key maps + key-partitioned
    joins; the population table is regime-cardinality (broadcast)."""
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    wu = Window.partitionBy("user_id")
    obs = s.select(
        "user_id",
        "lr",
        F.row_number().over(Window.partitionBy("user_id").orderBy("rn")).alias(
            "idx"
        ),
        F.count(F.lit(1)).over(wu).alias("n_full"),
        F.stddev_samp("lr").over(wu).alias("sd_full"),
    )
    arms = obs.filter(
        F.col("idx") <= F.floor(F.col("n_full") / 2.0)
    ).withColumn("fitted_at", F.lit(1)).unionByName(
        obs.filter(
            F.col("idx") <= F.floor(3.0 * F.col("n_full") / 4.0)
        ).withColumn("fitted_at", F.lit(2))
    )
    wp = Window.partitionBy("user_id", "fitted_at").orderBy("idx")
    lagd = arms.select(
        "user_id",
        "fitted_at",
        "lr",
        "sd_full",
        F.lag("lr", 1).over(wp).alias("l1"),
        F.lag("lr", 2).over(wp).alias("l2"),
    )
    m = (
        lagd.groupBy("user_id", "fitted_at")
        .agg(
            F.count("lr").alias("n_obs"),
            F.var_pop("lr").alias("c0"),
            F.corr("lr", "l1").alias("rho1"),
            F.corr("lr", "l2").alias("rho2"),
            F.stddev_samp("lr").alias("sd"),
            F.first("sd_full").alias("sd_full"),
        )
        .filter(
            (F.col("n_obs") >= 12)
            & (F.col("c0") > 0)
            & (F.abs(F.col("rho1")) < 1.0)
        )
    )
    c0, rho1, rho2 = F.col("c0"), F.col("rho1"), F.col("rho2")
    sig1 = c0 * (1 - rho1 * rho1)
    phi2 = (rho2 - rho1 * rho1) / (1 - rho1 * rho1)
    phi1 = rho1 * (1 - rho2) / (1 - rho1 * rho1)
    sig2 = c0 * (1 - phi1 * rho1 - phi2 * rho2)
    aic = m.select(
        "user_id",
        "fitted_at",
        "n_obs",
        "sd",
        "sd_full",
        F.when(sig1 > 0, F.col("n_obs") * F.log(sig1) + 4.0).alias("aic1"),
        F.when(sig2 > 0, F.col("n_obs") * F.log(sig2) + 6.0).alias("aic2"),
    )
    pick2 = F.col("aic2").isNotNull() & (
        F.col("aic1").isNull()
        | (F.round(F.col("aic2"), 6) < F.round(F.col("aic1"), 6))
    )

    def regime_case(sd_col: str, full_col: str):
        ratio = F.round(F.col(sd_col) / F.col(full_col), 6)
        return (
            F.when(ratio < 0.9, "LIQUID_RANGEBOUND")
            .when(ratio <= 1.1, "MODERATE_TRENDING")
            .otherwise("HIGH_VOL_TRENDING")
        )

    fits = aic.filter(F.col("aic1").isNotNull()).select(
        "user_id",
        "fitted_at",
        "n_obs",
        F.when(pick2, 2).otherwise(1).alias("best_p"),
        F.round(F.when(pick2, F.col("aic2")).otherwise(F.col("aic1")), 6).alias(
            "aic"
        ),
        regime_case("sd", "sd_full").alias("regime"),
    )
    rec = (
        obs.filter(F.col("idx") > F.floor(3.0 * F.col("n_full") / 4.0))
        .groupBy("user_id")
        .agg(
            F.stddev_samp("lr").alias("sd"),
            F.count(F.lit(1)).alias("n_rec"),
            F.first("sd_full").alias("sd_full"),
            F.first("n_full").alias("n_full"),
        )
        .filter(
            (F.col("n_rec") >= 5)
            & F.col("sd").isNotNull()
            & (F.col("sd_full") > 0)
        )
    )
    cur = rec.select(
        "user_id",
        regime_case("sd", "sd_full").alias("regime"),
        F.col("n_full").alias("n_obs"),
    )
    # The reference's order cache is a MATERIALIZED store (SQLite table,
    # `order_learner.py:109-158`); materialize the bounded per-key fits
    # history the same way. This also sidesteps a Spark plan-reuse
    # anomaly: composing the suggest joins over the shared
    # window-over-union lineage duplicates every output row (verified
    # sf0.001: 30 rows instead of 15; correct with lineage broken).
    fits = fits.localCheckpoint(eager=True)
    cur = cur.localCheckpoint(eager=True)
    return R.warmstart_suggest(fits, cur)


# ---------------------------------------------------------------------------
# R11 — omega robustness across the hurdle ladder
# ---------------------------------------------------------------------------

@query("omega_robustness_curve")
def omega_robustness_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: omega across the hurdle ladder (zero -> NGN hurdle ->
    cost-adjusted) with the reference's robustness scoring
    (`etl/portfolio_math.py:540-756`): monotonicity over consecutive
    FINITE ladder points, the cliff-drop guard with its inf->finite
    maximum-cliff rule, above-hurdle margin, and the weighted score
    (0.4 hurdle-strength + 0.3 drag-strength + 0.2 retention + 0.1
    threshold-stability on values capped at the reference's 100.0
    score cap, halved on non-monotonicity and halved again only on an
    explicit cliff failure). Infinite omega (zero losses above the
    threshold) is sentinel-coded as 1e6 — the reference's own bootstrap
    sentinel — so the derivation branches on infinity exactly while the
    emitted values stay hashable. Derivation logic lives in
    `operators/risk.py:omega_ladder_derive` (unit-tested against a
    pure-python replica of the reference, including the infinite
    cases). One aggregation per key — linear."""
    th, tc = R.DAILY_NGN_THRESHOLD, R.DAILY_NGN_THRESHOLD + R.EXECUTION_DRAG
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())

    def gl(tau: float):
        g = F.sum(F.greatest(F.col("lr") - tau, F.lit(0.0)))
        l = F.sum(F.greatest(F.lit(tau) - F.col("lr"), F.lit(0.0)))
        return g, l

    gz, lz = gl(0.0)
    gh, lh = gl(th)
    gc, lc = gl(tc)

    def omega(g, l):
        return F.round(
            F.when(
                l > 0, F.least(g / l, F.lit(R.OMEGA_INF_SENTINEL))
            ).otherwise(R.OMEGA_INF_SENTINEL),
            6,
        )

    a = (
        s.groupBy("user_id")
        .agg(
            F.count("lr").alias("n"),
            omega(gz, lz).alias("omega_zero"),
            omega(gh, lh).alias("omega_hurdle"),
            omega(gc, lc).alias("omega_cost"),
        )
        .filter(F.col("n") >= 10)
    )
    return R.omega_ladder_derive(a)


# DuckDB oracle for R11 — same float literals via repr interpolation;
# the derivation CTEs mirror operators/risk.py:omega_ladder_derive.
_TH_R = repr(R.DAILY_NGN_THRESHOLD)
_TC_R = repr(R.DAILY_NGN_THRESHOLD + R.EXECUTION_DRAG)
_SENT = repr(R.OMEGA_INF_SENTINEL)

ORACLE["omega_robustness_curve"] = f"""
    WITH s AS ({_S_SQL}),
    g AS (
      SELECT user_id, COUNT(lr) AS n,
             SUM(GREATEST(lr - 0.0, 0)) AS gz,
             SUM(GREATEST(0.0 - lr, 0)) AS lz,
             SUM(GREATEST(lr - {_TH_R}, 0)) AS gh,
             SUM(GREATEST({_TH_R} - lr, 0)) AS lh,
             SUM(GREATEST(lr - {_TC_R}, 0)) AS gc,
             SUM(GREATEST({_TC_R} - lr, 0)) AS lc2
      FROM s WHERE lr IS NOT NULL
      GROUP BY user_id HAVING COUNT(lr) >= 10
    ),
    o AS (
      SELECT user_id, n,
             ROUND(CASE WHEN lz > 0 THEN LEAST(gz / lz, {_SENT})
                   ELSE {_SENT} END, 6) AS omega_zero,
             ROUND(CASE WHEN lh > 0 THEN LEAST(gh / lh, {_SENT})
                   ELSE {_SENT} END, 6) AS omega_hurdle,
             ROUND(CASE WHEN lc2 > 0 THEN LEAST(gc / lc2, {_SENT})
                   ELSE {_SENT} END, 6) AS omega_cost
      FROM g
    ),
    d AS (
      SELECT *,
             omega_zero < {_SENT} AS zf,
             omega_hurdle < {_SENT} AS hf,
             omega_cost < {_SENT} AS cf
      FROM o
    ),
    e AS (
      SELECT *,
             ((NOT (zf AND hf)) OR omega_hurdle <= omega_zero + 1e-9)
             AND ((NOT (hf AND cf)) OR omega_cost <= omega_hurdle + 1e-9)
             AND ((NOT (zf AND cf AND NOT hf))
                  OR omega_cost <= omega_zero + 1e-9) AS monotonicity_ok,
             CASE WHEN hf THEN ROUND(omega_hurdle - 1.0, 6) END
               AS above_hurdle_margin,
             CASE WHEN NOT zf AND NOT hf THEN 0.0
                  WHEN NOT zf AND hf THEN 1.0
                  WHEN zf AND omega_zero > 1e-9
                  THEN ROUND(LEAST(GREATEST(
                    (omega_zero - CASE WHEN hf THEN omega_hurdle
                                       ELSE omega_zero END) / omega_zero,
                    0.0), 1.0), 6)
             END AS cliff_drop_ratio
      FROM d
    ),
    f AS (
      SELECT *,
             CASE WHEN cliff_drop_ratio IS NOT NULL
                  THEN cliff_drop_ratio <= {R.CLIFF_DROP_MAX} END AS cliff_ok,
             (0.40 * LEAST(GREATEST(
                 LEAST(GREATEST(omega_hurdle, 0.0), {R.OMEGA_CAP}) - 1.0,
                 0.0), 1.0)
              + 0.30 * LEAST(GREATEST(
                 LEAST(GREATEST(omega_cost, 0.0), {R.OMEGA_CAP}) - 1.0,
                 0.0), 1.0)
              + 0.20 * LEAST(GREATEST(
                 LEAST(GREATEST(omega_cost, 0.0), {R.OMEGA_CAP})
                 / GREATEST(LEAST(GREATEST(omega_hurdle, 0.0),
                                  {R.OMEGA_CAP}), 1e-6), 0.0), 1.0)
              + 0.10 * LEAST(GREATEST(
                 LEAST(GREATEST(omega_hurdle, 0.0), {R.OMEGA_CAP})
                 / GREATEST(LEAST(GREATEST(omega_zero, 0.0),
                                  {R.OMEGA_CAP}), 1e-6), 0.0), 1.0))
               AS raw_score
      FROM e
    )
    SELECT user_id, n, omega_zero, omega_hurdle, omega_cost,
           monotonicity_ok, above_hurdle_margin, cliff_drop_ratio, cliff_ok,
           ROUND(LEAST(GREATEST(raw_score
             * CASE WHEN monotonicity_ok THEN 1.0 ELSE 0.5 END
             * CASE WHEN cliff_ok IS NOT NULL AND NOT cliff_ok THEN 0.5
                    ELSE 1.0 END, 0.0), 1.0), 6) AS robustness_score
    FROM f
"""


# ---------------------------------------------------------------------------
# R12 — omega bootstrap CI (anti-omega failure mode 2: right tail)
# ---------------------------------------------------------------------------


@query("omega_bootstrap_gate")
def omega_bootstrap_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: bootstrap confidence interval around the per-key omega at the
    NGN hurdle — the reference's right-tail test
    (`etl/portfolio_math.py:758-851` omega_bootstrap_ci): a single lucky
    fat-tail winner can inflate the point omega, so the barbell claim
    must survive the CI lower bound >= 1.0. Resampling uses the repo's
    deterministic universal-hash draws (same family as
    `bootstrap_mean_ci`: one md5 per row, affine integer mixes per
    replicate — a ~half subsample rather than the reference's
    with-replacement draw, documented deviation shared by A12). Infinite
    omega is replaced by the reference's own 1e6 sentinel. The replicate
    fan-out dies in map-side partial aggregation: the shuffle carries
    (key x replicate) rows only."""
    from .queries_finance import _BOOT_P, _BOOT_PARAMS

    th = R.DAILY_NGN_THRESHOLD
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    x = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("user_id").cast("string"),
                        F.col("rn").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BOOT_P
    )
    base = s.select("user_id", "lr", x.alias("x"))

    def omega_agg():
        g = F.sum(F.greatest(F.col("lr") - th, F.lit(0.0)))
        l = F.sum(F.greatest(F.lit(th) - F.col("lr"), F.lit(0.0)))
        return F.round(
            F.when(l > 0, F.least(g / l, F.lit(R.OMEGA_INF_SENTINEL))).otherwise(
                R.OMEGA_INF_SENTINEL
            ),
            6,
        )

    point = (
        base.groupBy("user_id")
        .agg(F.count("lr").alias("n"), omega_agg().alias("omega_point"))
        .filter(F.col("n") >= 10)
    )
    params = literal_grid(
        spark,
        [(r, a, b) for r, (a, b) in enumerate(_BOOT_PARAMS)],
        "rep int, a long, b long",
    )
    reps = (
        base.crossJoin(F.broadcast(params))
        .filter((F.col("a") * F.col("x") + F.col("b")) % _BOOT_P < _BOOT_P // 2)
        .groupBy("user_id", "rep")
        .agg(omega_agg().alias("rep_omega"))
    )
    ci = reps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.round(F.percentile("rep_omega", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("rep_omega", F.lit(0.975)), 6).alias("ci_hi"),
    )
    return point.join(ci, "user_id").select(
        "user_id",
        "n",
        "omega_point",
        "n_reps",
        "ci_lo",
        "ci_hi",
        (F.col("ci_lo") >= 1.0).alias("right_tail_ok"),
        F.round(F.col("ci_hi") - F.col("ci_lo"), 6).alias("ci_width"),
    )


def _omega_sql_sent(gain: str, loss: str) -> str:
    return (
        f"ROUND(CASE WHEN {loss} > 0 THEN LEAST({gain} / {loss}, 1000000.0) "
        f"ELSE 1000000.0 END, 6)"
    )


def _boot_values() -> str:
    from .queries_finance import _BOOT_VALUES

    return _BOOT_VALUES


ORACLE["omega_bootstrap_gate"] = f"""
    WITH s AS ({_S_SQL}),
    x AS (
      SELECT user_id, lr,
             ('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR) || '|'
                             || CAST(rn AS VARCHAR)), 1, 8))::BIGINT
               % 2147483647 AS x
      FROM s WHERE lr IS NOT NULL
    ),
    pt AS (
      SELECT user_id, COUNT(lr) AS n,
             {_omega_sql_sent(
                 f"SUM(GREATEST(lr - {repr(R.DAILY_NGN_THRESHOLD)}, 0))",
                 f"SUM(GREATEST({repr(R.DAILY_NGN_THRESHOLD)} - lr, 0))")}
               AS omega_point
      FROM x GROUP BY user_id HAVING COUNT(lr) >= 10
    ),
    params(rep, a, b) AS (VALUES {_boot_values()}),
    reps AS (
      SELECT e.user_id, p.rep,
             {_omega_sql_sent(
                 f"SUM(GREATEST(lr - {repr(R.DAILY_NGN_THRESHOLD)}, 0))",
                 f"SUM(GREATEST({repr(R.DAILY_NGN_THRESHOLD)} - lr, 0))")}
               AS rep_omega
      FROM x e CROSS JOIN params p
      WHERE (p.a * e.x + p.b) % 2147483647 < 1073741823
      GROUP BY e.user_id, p.rep
    ),
    ci AS (
      SELECT user_id, COUNT(*) AS n_reps,
             ROUND(QUANTILE_CONT(rep_omega, 0.025), 6) AS ci_lo,
             ROUND(QUANTILE_CONT(rep_omega, 0.975), 6) AS ci_hi
      FROM reps GROUP BY user_id
    )
    SELECT pt.user_id, pt.n, pt.omega_point, ci.n_reps, ci.ci_lo, ci.ci_hi,
           ci.ci_lo >= 1.0 AS right_tail_ok,
           ROUND(ci.ci_hi - ci.ci_lo, 6) AS ci_width
    FROM pt JOIN ci ON pt.user_id = ci.user_id
"""


# ---------------------------------------------------------------------------
# R13 — ES-to-edge + support-aware payoff asymmetry (anti-omega modes 3+)
# ---------------------------------------------------------------------------


@query("es_payoff_support_gate")
def es_payoff_support_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: the remaining anti-omega evidence
    (`etl/portfolio_math.py:852-1032`): expected shortfall as a multiple
    of the expected daily edge (left tail bounded iff |ES|/edge <= 10,
    edge = positive-return mean proxy) and support-aware payoff
    asymmetry (raw avg-win/avg-loss, 10%-trimmed variant, winner
    concentration, the 3-win/3-loss support gate, and the effective
    ratio = min(raw, trimmed) when supported else 0). Tail membership
    uses per-key ranks; boundary ties share the same value so every
    tail/trim MEAN is order-independent. Infinite ratios are capped at
    the reference's 1e6 sentinel (hash-stability). Linear: two ranked
    window passes + one aggregation per key."""
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    wu = Window.partitionBy("user_id")
    asc = Window.partitionBy("user_id").orderBy("lr", "rn")
    ranked = s.select(
        "user_id",
        "lr",
        "rn",
        F.row_number().over(asc).alias("rk_asc"),
        F.count(F.lit(1)).over(wu).alias("n"),
    ).filter(F.col("n") >= 5)
    tail_n = F.greatest(F.lit(1), F.floor(F.col("n") * R.ES_TAIL_PCT))
    es = ranked.groupBy("user_id").agg(
        F.first("n").alias("n"),
        F.round(
            F.avg(F.when(F.col("rk_asc") <= tail_n, F.col("lr"))), 6
        ).alias("es_raw"),
    )

    wdesc = Window.partitionBy("user_id").orderBy(F.col("lr").desc(), "rn")
    wins = (
        s.filter(F.col("lr") > 0)
        .select(
            "user_id",
            "lr",
            F.row_number().over(wdesc).alias("rk"),
            F.count(F.lit(1)).over(wu).alias("nw"),
        )
    )
    trim_w = F.floor(F.col("nw") * R.TRIM_FRACTION)
    wagg = wins.groupBy("user_id").agg(
        F.first("nw").alias("n_wins"),
        F.sum("lr").alias("gross_profit"),
        F.avg("lr").alias("avg_win"),
        F.max("lr").alias("max_win"),
        F.sum(F.when(F.col("rk") > trim_w, F.col("lr"))).alias("trim_win_sum"),
        F.sum((F.col("rk") > trim_w).cast("long")).alias("trim_win_n"),
    )
    ldesc = Window.partitionBy("user_id").orderBy(F.col("lr").asc(), "rn")
    losses = (
        s.filter(F.col("lr") < 0)
        .select(
            "user_id",
            (-F.col("lr")).alias("al"),
            F.row_number().over(ldesc).alias("rk"),
            F.count(F.lit(1)).over(wu).alias("nl"),
        )
    )
    trim_l = F.floor(F.col("nl") * R.TRIM_FRACTION)
    lagg = losses.groupBy("user_id").agg(
        F.first("nl").alias("n_losses"),
        F.avg("al").alias("avg_loss"),
        F.sum(F.when(F.col("rk") > trim_l, F.col("al"))).alias("trim_loss_sum"),
        F.sum((F.col("rk") > trim_l).cast("long")).alias("trim_loss_n"),
    )
    j = es.join(wagg, "user_id", "left").join(lagg, "user_id", "left")
    n_wins = F.coalesce(F.col("n_wins"), F.lit(0))
    n_losses = F.coalesce(F.col("n_losses"), F.lit(0))
    edge = F.col("avg_win")
    ratio = F.when(
        edge.isNotNull(),
        F.round(F.abs(F.col("es_raw")) / F.greatest(edge, F.lit(1e-12)), 6),
    )
    sent = F.lit(R.OMEGA_INF_SENTINEL)
    payoff_raw = F.round(
        F.when(
            (n_losses == 0) | F.col("avg_loss").isNull(),
            F.when(n_wins > 0, sent).otherwise(0.0),
        ).otherwise(
            F.coalesce(F.col("avg_win"), F.lit(0.0))
            / F.greatest(F.col("avg_loss"), F.lit(1e-12))
        ),
        6,
    )
    trim_avg_win = F.col("trim_win_sum") / F.greatest(
        F.col("trim_win_n"), F.lit(1)
    )
    trim_avg_loss = F.col("trim_loss_sum") / F.greatest(
        F.col("trim_loss_n"), F.lit(1)
    )
    trimmed = F.round(
        F.when(
            (n_losses == 0) | (F.coalesce(F.col("trim_loss_n"), F.lit(0)) == 0),
            F.when(
                F.coalesce(F.col("trim_win_n"), F.lit(0)) > 0, sent
            ).otherwise(0.0),
        )
        .when(F.coalesce(F.col("trim_win_n"), F.lit(0)) == 0, 0.0)
        .otherwise(trim_avg_win / F.greatest(trim_avg_loss, F.lit(1e-12))),
        6,
    )
    wc = F.round(
        F.when(
            n_wins > 0,
            F.col("max_win") / F.greatest(F.col("gross_profit"), F.lit(1e-12)),
        ).otherwise(0.0),
        6,
    )
    support = (
        (n_wins >= R.MIN_WINS)
        & (n_losses >= R.MIN_LOSSES)
        & (wc <= R.MAX_WINNER_CONCENTRATION)
    )
    return j.select(
        "user_id",
        "n",
        "es_raw",
        ratio.alias("es_to_edge"),
        F.when(ratio.isNotNull(), ratio <= R.ES_EDGE_BOUND).alias(
            "es_bounded"
        ),
        n_wins.alias("n_wins"),
        n_losses.alias("n_losses"),
        payoff_raw.alias("payoff_asymmetry"),
        wc.alias("winner_concentration"),
        trimmed.alias("trimmed_payoff"),
        support.alias("support_ok"),
        F.round(
            F.when(support, F.least(payoff_raw, trimmed)).otherwise(0.0), 6
        ).alias("payoff_effective"),
    )


ORACLE["es_payoff_support_gate"] = f"""
    WITH s AS ({_S_SQL}),
    v AS (SELECT user_id, lr, rn FROM s WHERE lr IS NOT NULL),
    ranked AS (
      SELECT user_id, lr,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY lr, rn)
               AS rk_asc,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM v
    ),
    es AS (
      SELECT user_id, ANY_VALUE(n) AS n,
             ROUND(AVG(CASE WHEN rk_asc <= GREATEST(1, FLOOR(n * {R.ES_TAIL_PCT}))
                       THEN lr END), 6) AS es_raw
      FROM ranked WHERE n >= 5 GROUP BY user_id
    ),
    w AS (
      SELECT user_id, lr,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY lr DESC, rn)
               AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS nw
      FROM v WHERE lr > 0
    ),
    wagg AS (
      SELECT user_id, ANY_VALUE(nw) AS n_wins, SUM(lr) AS gross_profit,
             AVG(lr) AS avg_win, MAX(lr) AS max_win,
             SUM(CASE WHEN rk > FLOOR(nw * {R.TRIM_FRACTION}) THEN lr END)
               AS trim_win_sum,
             CAST(SUM(CASE WHEN rk > FLOOR(nw * {R.TRIM_FRACTION})
                      THEN 1 ELSE 0 END) AS BIGINT) AS trim_win_n
      FROM w GROUP BY user_id
    ),
    l AS (
      SELECT user_id, -lr AS al,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY lr ASC, rn)
               AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS nl
      FROM v WHERE lr < 0
    ),
    lagg AS (
      SELECT user_id, ANY_VALUE(nl) AS n_losses, AVG(al) AS avg_loss,
             SUM(CASE WHEN rk > FLOOR(nl * {R.TRIM_FRACTION}) THEN al END)
               AS trim_loss_sum,
             CAST(SUM(CASE WHEN rk > FLOOR(nl * {R.TRIM_FRACTION})
                      THEN 1 ELSE 0 END) AS BIGINT) AS trim_loss_n
      FROM l GROUP BY user_id
    ),
    j AS (
      SELECT es.user_id, es.n, es.es_raw,
             COALESCE(wagg.n_wins, 0) AS n_wins,
             COALESCE(lagg.n_losses, 0) AS n_losses,
             wagg.gross_profit, wagg.avg_win, wagg.max_win,
             wagg.trim_win_sum, COALESCE(wagg.trim_win_n, 0) AS trim_win_n,
             lagg.avg_loss, lagg.trim_loss_sum,
             COALESCE(lagg.trim_loss_n, 0) AS trim_loss_n
      FROM es
      LEFT JOIN wagg ON es.user_id = wagg.user_id
      LEFT JOIN lagg ON es.user_id = lagg.user_id
    ),
    m AS (
      SELECT *,
             CASE WHEN avg_win IS NOT NULL
                  THEN ROUND(ABS(es_raw) / GREATEST(avg_win, 1e-12), 6)
             END AS es_to_edge,
             ROUND(CASE WHEN n_losses = 0 OR avg_loss IS NULL
                   THEN CASE WHEN n_wins > 0 THEN 1000000.0 ELSE 0.0 END
                   ELSE COALESCE(avg_win, 0.0) / GREATEST(avg_loss, 1e-12)
                   END, 6) AS payoff_asymmetry,
             ROUND(CASE
                   WHEN n_losses = 0 OR trim_loss_n = 0
                   THEN CASE WHEN trim_win_n > 0 THEN 1000000.0 ELSE 0.0 END
                   WHEN trim_win_n = 0 THEN 0.0
                   ELSE (trim_win_sum / GREATEST(trim_win_n, 1))
                        / GREATEST(trim_loss_sum / GREATEST(trim_loss_n, 1),
                                   1e-12)
                   END, 6) AS trimmed_payoff,
             ROUND(CASE WHEN n_wins > 0
                   THEN max_win / GREATEST(gross_profit, 1e-12)
                   ELSE 0.0 END, 6) AS winner_concentration
      FROM j
    )
    SELECT user_id, n, es_raw, es_to_edge,
           CASE WHEN es_to_edge IS NOT NULL
                THEN es_to_edge <= {R.ES_EDGE_BOUND} END AS es_bounded,
           n_wins, n_losses, payoff_asymmetry, winner_concentration,
           trimmed_payoff,
           (n_wins >= {R.MIN_WINS} AND n_losses >= {R.MIN_LOSSES}
            AND winner_concentration <= {R.MAX_WINNER_CONCENTRATION})
             AS support_ok,
           ROUND(CASE WHEN (n_wins >= {R.MIN_WINS}
                            AND n_losses >= {R.MIN_LOSSES}
                            AND winner_concentration
                                <= {R.MAX_WINNER_CONCENTRATION})
                 THEN LEAST(payoff_asymmetry, trimmed_payoff)
                 ELSE 0.0 END, 6) AS payoff_effective
    FROM m
"""


# ---------------------------------------------------------------------------
# R14 — split drift diagnostics (PSI) for the train/val/test split
# ---------------------------------------------------------------------------


@query("split_drift_psi")
def split_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: Population Stability Index drift between the training split
    and each holdout split — reference `etl/split_diagnostics.py:25-80`
    (PSI over 10 train-decile bins with the 1e-9 smoothing, mean/std
    deltas, volatility ratio). Splits are the portable md5 80/10/10
    assignment (the same family as L26's dedup-aware split); bins come
    from the train split's exact deciles (broadcast cut row — the W8
    global-quantile pattern), with values and cuts rounded to 6 decimals
    before the bin comparison on both sides so an interpolation ulp
    cannot flip a bin. One pass for cuts, one for binning — linear."""
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    from ..functions.scalars import hash_unit_interval

    u = hash_unit_interval(F.col("event_id"))
    sp = (
        F.when(u < 0.8, "train").when(u < 0.9, "validation").otherwise("test")
    )
    v = s.select(F.round(F.col("lr"), 6).alias("lr"), sp.alias("split"))
    cuts = (
        v.filter(F.col("split") == "train")
        .agg(
            *[
                F.round(F.percentile("lr", F.lit(k / 10.0)), 6).alias(f"c{k}")
                for k in range(1, 10)
            ]
        )
    )
    binned = v.crossJoin(F.broadcast(cuts)).select(
        "split",
        "lr",
        sum(
            (F.col("lr") >= F.col(f"c{k}")).cast("int") for k in range(1, 10)
        ).alias("bin"),
    )
    # ONE pass over the binned fact yields both the histogram and the
    # moment sums; per-split stats re-aggregate the 10-bin partials, so
    # events is scanned twice total (cuts + binning), not three times.
    # <=30 rows (split x bin) feeding FIVE downstream references — pin it
    # once (optimization round 13, guide §2.4/§3.3): without the barrier
    # every reference re-embedded the events scan + percentile crossJoin
    # subtree (1,113-line / 28-Exchange plan)
    counts = (
        binned.groupBy("split", "bin")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("lr").alias("s1"),
            F.sum(F.col("lr") * F.col("lr")).alias("s2"),
        )
        .localCheckpoint(eager=False)
    )
    n_, s1_, s2_ = F.sum("c"), F.sum("s1"), F.sum("s2")
    stats = counts.groupBy("split").agg(
        n_.alias("n"),
        (s1_ / n_).alias("mu"),
        F.sqrt((s2_ - s1_ * s1_ / n_) / (n_ - 1)).alias("sd"),
    )
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    splits = literal_grid(
        spark, [("train",), ("validation",), ("test",)], "split string"
    )
    dense = (
        splits.crossJoin(bins)
        .join(counts, ["split", "bin"], "left")
        .join(stats.select("split", "n"), "split")
        .select(
            "split",
            "bin",
            (F.coalesce(F.col("c"), F.lit(0)) / F.col("n")).alias("share"),
        )
    )
    base = dense.filter(F.col("split") == "train").select(
        F.col("bin").alias("b_bin"), F.col("share").alias("p")
    )
    cmp_ = dense.filter(F.col("split") != "train")
    psi = (
        cmp_.join(base, cmp_.bin == base.b_bin)
        .groupBy("split")
        .agg(
            F.round(
                F.sum(
                    (F.col("p") - F.col("share"))
                    * F.log((F.col("p") + 1e-9) / (F.col("share") + 1e-9))
                ),
                6,
            ).alias("psi")
        )
    )
    tr = stats.filter(F.col("split") == "train").select(
        F.col("n").alias("n_base"), F.col("mu").alias("mu0"),
        F.col("sd").alias("sd0"),
    )
    other = stats.filter(F.col("split") != "train")
    return (
        other.crossJoin(F.broadcast(tr))
        .join(psi, "split")
        .select(
            "split",
            "n_base",
            F.col("n").alias("n_cmp"),
            "psi",
            F.round(F.abs(F.col("mu0") - F.col("mu")), 6).alias("mean_delta"),
            F.round(F.abs(F.col("sd0") - F.col("sd")), 6).alias("std_delta"),
            F.round(
                F.when(F.col("sd0") > 0, F.col("sd") / F.col("sd0")).otherwise(
                    1.0
                ),
                6,
            ).alias("volatility_ratio"),
        )
    )


_PSI_CUTS = ", ".join(
    f"ROUND(QUANTILE_CONT(lr, {k / 10.0}), 6) AS c{k}" for k in range(1, 10)
)
_PSI_BIN = " + ".join(
    f"CASE WHEN lr >= c{k} THEN 1 ELSE 0 END" for k in range(1, 10)
)

ORACLE["split_drift_psi"] = f"""
    WITH s AS ({_S_SQL}),
    v AS (
      SELECT ROUND(lr, 6) AS lr,
             CASE WHEN ('0x' || SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 6))
                       ::BIGINT / 16777216.0 < 0.8 THEN 'train'
                  WHEN ('0x' || SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 6))
                       ::BIGINT / 16777216.0 < 0.9 THEN 'validation'
                  ELSE 'test' END AS split
      FROM s WHERE lr IS NOT NULL
    ),
    cuts AS (SELECT {_PSI_CUTS} FROM v WHERE split = 'train'),
    binned AS (
      SELECT split, lr, {_PSI_BIN} AS bin FROM v CROSS JOIN cuts
    ),
    counts AS (
      SELECT split, bin, COUNT(*) AS c,
             SUM(lr) AS s1, SUM(lr * lr) AS s2
      FROM binned GROUP BY split, bin
    ),
    stats AS (
      SELECT split, CAST(SUM(c) AS BIGINT) AS n, SUM(s1) / SUM(c) AS mu,
             SQRT((SUM(s2) - SUM(s1) * SUM(s1) / SUM(c)) / (SUM(c) - 1))
               AS sd
      FROM counts GROUP BY split
    ),
    bins(bin) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)),
    splits(split) AS (VALUES ('train'),('validation'),('test')),
    dense AS (
      SELECT sp.split, b.bin,
             COALESCE(c.c, 0) * 1.0 / st.n AS share
      FROM splits sp CROSS JOIN bins b
      JOIN stats st ON st.split = sp.split
      LEFT JOIN counts c ON c.split = sp.split AND c.bin = b.bin
    ),
    psi AS (
      SELECT d.split,
             ROUND(SUM((base.share - d.share)
                   * LN((base.share + 1e-9) / (d.share + 1e-9))), 6) AS psi
      FROM dense d
      JOIN (SELECT bin, share FROM dense WHERE split = 'train') base
        ON base.bin = d.bin
      WHERE d.split <> 'train'
      GROUP BY d.split
    )
    SELECT o.split,
           tr.n AS n_base, o.n AS n_cmp, psi.psi,
           ROUND(ABS(tr.mu - o.mu), 6) AS mean_delta,
           ROUND(ABS(tr.sd - o.sd), 6) AS std_delta,
           ROUND(CASE WHEN tr.sd > 0 THEN o.sd / tr.sd ELSE 1.0 END, 6)
             AS volatility_ratio
    FROM stats o
    CROSS JOIN (SELECT n, mu, sd FROM stats WHERE split = 'train') tr
    JOIN psi ON psi.split = o.split
    WHERE o.split <> 'train'
"""


# ---------------------------------------------------------------------------
# R15 — portfolio stress scenarios
# ---------------------------------------------------------------------------


@query("stress_test_scenarios")
def stress_test_scenarios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: scenario shock testing (`etl/portfolio_math.py:488-540`
    stress_test_portfolio): each named additive daily shock is applied to
    every key's return series and the stressed Sharpe (population std,
    rf = 2%/252), max drawdown on the compounded equity curve
    (exp-sum-log running max — the same closed form in both engines),
    exact 5%/1% percentile VaR and the cumulative shock loss are
    reported. The scenario dimension is a broadcast literal table; the
    facts shuffle once on (key, scenario)."""
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    scen = literal_grid(
        spark, list(R.STRESS_SCENARIOS.items()), "scenario string, shock double"
    )
    x = s.crossJoin(F.broadcast(scen)).select(
        "user_id",
        "rn",
        "scenario",
        "shock",
        (F.col("lr") + F.col("shock")).alias("r"),
    )
    w = Window.partitionBy("user_id", "scenario").orderBy("rn")
    cum = F.exp(
        F.sum(F.log(F.greatest(1.0 + F.col("r"), F.lit(1e-12)))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    runmax = F.max(cum).over(w.rowsBetween(Window.unboundedPreceding, 0))
    dd = 1.0 - cum / runmax
    e = x.select("user_id", "scenario", "shock", "r", dd.alias("dd"))
    rf_daily = R.DEFAULT_RISK_FREE_RATE / R.TRADING_DAYS
    sharpe = F.when(
        F.stddev_pop("r") > 1e-8,
        (F.avg("r") - rf_daily)
        / F.stddev_pop("r")
        * F.sqrt(F.lit(float(R.TRADING_DAYS))),
    ).otherwise(0.0)
    return e.groupBy("user_id", "scenario").agg(
        F.first("shock").alias("shock_magnitude"),
        F.count(F.lit(1)).alias("n"),
        F.round(sharpe, 6).alias("stressed_sharpe"),
        F.round(F.max("dd"), 6).alias("stressed_max_drawdown"),
        F.round(F.percentile("r", F.lit(0.05)), 6).alias("stressed_var_95"),
        F.round(F.percentile("r", F.lit(0.01)), 6).alias("stressed_var_99"),
        F.round(F.first("shock") * F.count(F.lit(1)), 6).alias(
            "portfolio_loss"
        ),
    )


_SCEN_VALUES = ", ".join(
    f"('{k}', {repr(v)})" for k, v in R.STRESS_SCENARIOS.items()
)
_RF_D = repr(R.DEFAULT_RISK_FREE_RATE / R.TRADING_DAYS)

ORACLE["stress_test_scenarios"] = f"""
    WITH s AS ({_S_SQL}),
    scen(scenario, shock) AS (VALUES {_SCEN_VALUES}),
    x AS (
      SELECT user_id, rn, scenario, shock, lr + shock AS r
      FROM s CROSS JOIN scen WHERE lr IS NOT NULL
    ),
    c0 AS (
      SELECT user_id, rn, scenario, shock, r,
             EXP(SUM(LN(GREATEST(1.0 + r, 1e-12))) OVER w) AS cum
      FROM x
      WINDOW w AS (PARTITION BY user_id, scenario ORDER BY rn
                   ROWS UNBOUNDED PRECEDING)
    ),
    c AS (
      SELECT user_id, scenario, shock, r, cum,
             MAX(cum) OVER (PARTITION BY user_id, scenario ORDER BY rn
                            ROWS UNBOUNDED PRECEDING) AS runmax
      FROM c0
    )
    SELECT user_id, scenario,
           ANY_VALUE(shock) AS shock_magnitude,
           COUNT(*) AS n,
           ROUND(CASE WHEN STDDEV_POP(r) > 1e-8
                 THEN (AVG(r) - {_RF_D}) / STDDEV_POP(r) * SQRT(252.0)
                 ELSE 0.0 END, 6) AS stressed_sharpe,
           ROUND(MAX(1.0 - cum / runmax), 6) AS stressed_max_drawdown,
           ROUND(QUANTILE_CONT(r, 0.05), 6) AS stressed_var_95,
           ROUND(QUANTILE_CONT(r, 0.01), 6) AS stressed_var_99,
           ROUND(ANY_VALUE(shock) * COUNT(*), 6) AS portfolio_loss
    FROM c GROUP BY user_id, scenario
"""


# ---------------------------------------------------------------------------
# R16 — fractional Kelly with fat-tail correction
# ---------------------------------------------------------------------------


@query("kelly_fat_tail_fraction")
def kelly_fat_tail_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16: fractional Kelly with the excess-kurtosis dampener
    (`etl/portfolio_math.py:1033-1082` fractional_kelly_fat_tail):
    f* = [(mu - rf) / sigma^2] x [1 / (1 + max(kappa - 3, 0) / 4)] x
    0.25, clipped to [0, 0.20], with the 0.01 minimum stake below 30
    observations. kappa is pandas' bias-corrected G2 excess kurtosis,
    expanded from raw power sums identically in both engines (the same
    rationale as the `jarque_bera` closed form). rf = the NGN daily
    hurdle, matching the reference default. One aggregation per key."""
    s = _series(spark, sf_dir).filter(F.col("lr").isNotNull())
    lr = F.col("lr")
    m = (
        s.groupBy("user_id")
        .agg(
            F.count(lr).alias("n"),
            F.avg(lr).alias("mu"),
            F.var_samp(lr).alias("sigma2"),
            F.avg(lr * lr).alias("m2"),
            F.avg(lr * lr * lr).alias("m3"),
            F.avg(lr * lr * lr * lr).alias("m4"),
        )
        # the G2 denominator needs n >= 4 and positive variance; keys
        # below that would split NULL (Spark) vs Inf (DuckDB ieee mode)
        .filter((F.col("n") >= 5) & (F.col("sigma2") > 0))
    )
    n = F.col("n").cast("double")
    mu, m2, m3, m4 = (F.col(c) for c in ("mu", "m2", "m3", "m4"))
    # central fourth moment sum from raw power sums
    sum4 = n * (
        m4 - 4 * mu * m3 + 6 * mu * mu * m2 - 3 * mu * mu * mu * mu
    )
    s2 = F.col("sigma2")
    g2 = (
        n * (n + 1) / ((n - 1) * (n - 2) * (n - 3)) * sum4 / (s2 * s2)
        - 3 * (n - 1) * (n - 1) / ((n - 2) * (n - 3))
    )
    rf = R.DAILY_NGN_THRESHOLD
    full = (mu - rf) / s2
    corr = 1.0 / (1.0 + F.greatest(g2 - 3.0, F.lit(0.0)) / 4.0)
    f_star = F.least(
        F.greatest(full * corr * R.KELLY_LAMBDA, F.lit(0.0)),
        F.lit(R.KELLY_CAP),
    )
    return m.select(
        "user_id",
        "n",
        F.round(mu, 6).alias("mu"),
        F.round(s2, 6).alias("sigma2"),
        F.round(g2, 6).alias("excess_kurtosis"),
        F.round(
            F.when(F.col("n") < R.KELLY_MIN_OBS, R.KELLY_MIN_STAKE)
            .when(s2 == 0.0, 0.0)
            .otherwise(f_star),
            6,
        ).alias("kelly_fraction"),
    )


ORACLE["kelly_fat_tail_fraction"] = f"""
    WITH s AS ({_S_SQL}),
    m AS (
      SELECT user_id, COUNT(lr) AS n, AVG(lr) AS mu, VAR_SAMP(lr) AS sigma2,
             AVG(lr*lr) AS m2, AVG(lr*lr*lr) AS m3, AVG(lr*lr*lr*lr) AS m4
      FROM s WHERE lr IS NOT NULL GROUP BY user_id
      HAVING COUNT(lr) >= 5 AND VAR_SAMP(lr) > 0
    ),
    k AS (
      SELECT user_id, n, mu, sigma2,
             CAST(n AS DOUBLE) * (n + 1) / ((n - 1.0) * (n - 2) * (n - 3))
               * (n * (m4 - 4*mu*m3 + 6*mu*mu*m2 - 3*mu*mu*mu*mu))
               / (sigma2 * sigma2)
             - 3.0 * (n - 1) * (n - 1) / ((n - 2.0) * (n - 3)) AS g2
      FROM m
    )
    SELECT user_id, n, ROUND(mu, 6) AS mu, ROUND(sigma2, 6) AS sigma2,
           ROUND(g2, 6) AS excess_kurtosis,
           ROUND(CASE WHEN n < {R.KELLY_MIN_OBS} THEN {R.KELLY_MIN_STAKE}
                 WHEN sigma2 = 0.0 THEN 0.0
                 ELSE LEAST(GREATEST(
                   (mu - {repr(R.DAILY_NGN_THRESHOLD)}) / sigma2
                   * (1.0 / (1.0 + GREATEST(g2 - 3.0, 0.0) / 4.0))
                   * {R.KELLY_LAMBDA}, 0.0), {R.KELLY_CAP}) END, 6)
             AS kelly_fraction
    FROM k
"""


# ---------------------------------------------------------------------------
# R17 — order-manager pre-trade check gate
# ---------------------------------------------------------------------------


def _ptg_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal pre-trade decision frame shared by the R17 gate and the
    run-execution summary: every non-HOLD signal with its check flags
    (confidence / cash / position / daily / risk), pass verdict, sized
    volume and the signal's expected-return edge."""
    s = _series(spark, sf_dir)
    wp = _w()
    pos = R.EQUITY_POSITION_FRAC
    pre = s.select(
        "user_id",
        "ts",
        "rn",
        "value",
        "lr",
        (F.col("value") / F.lag("value").over(wp) - 1.0).alias("r"),
    )
    eq_ret = F.round(pos * F.coalesce(F.col("r"), F.lit(0.0)), 6)
    pre = pre.withColumn("eq_ret", eq_ret)
    curve = F.exp(
        F.sum(F.log(F.greatest(1.0 + F.col("eq_ret"), F.lit(1e-12)))).over(
            wp.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    pre = pre.withColumn("curve", curve)
    runmax = F.max("curve").over(wp.rowsBetween(Window.unboundedPreceding, 0))
    pre = pre.withColumn(
        "dd_eq", F.round((runmax - F.col("curve")) / runmax, 6)
    )
    feat = pre.select(
        "user_id",
        "ts",
        "rn",
        "value",
        "lr",
        "eq_ret",
        "curve",
        "dd_eq",
        F.avg("value").over(_w((-4, 0))).alias("ma5"),
        F.stddev_samp("lr").over(_w((-19, 0))).alias("vol20"),
    ).filter(F.col("rn") >= 21)
    breach = (
        (F.col("dd_eq") >= R.MAX_DRAWDOWN)
        | (F.col("eq_ret") < -R.MAX_DAILY_LOSS)
    ).cast("long")
    feat = feat.withColumn(
        "risk_blocked", F.sum(breach).over(_w((-19, 0))) > 0
    )
    er = F.round((F.col("ma5") - F.col("value")) / F.col("value") - 0.002, 6)
    vol = F.round(F.col("vol20"), 6)
    sig = feat.select(
        "user_id",
        "ts",
        "rn",
        "value",
        "curve",
        "risk_blocked",
        er.alias("er"),
        F.when((er > 0.01) & (er / vol > 0.5), "BUY")
        .when((er < -0.01) & (-er / vol > 0.5), "SELL")
        .otherwise("HOLD")
        .alias("action"),
        F.round(F.least(F.abs(er) / vol, F.lit(1.0)), 6).alias("confidence"),
    ).filter(F.col("action") != "HOLD")
    conf = F.col("confidence")
    notional = F.greatest(
        F.lit(0.0),
        F.lit(R.ACCOUNT_EQUITY * R.MAX_POSITION_RISK)
        * F.when(conf > 0, conf).otherwise(R.MIN_CONFIDENCE),
    )
    free_margin = F.lit(R.ACCOUNT_EQUITY * R.FREE_MARGIN_FRAC) * F.col("curve")
    conf_ok = conf >= R.MIN_CONFIDENCE
    cash_ok = F.round(free_margin, 6) >= F.round(notional, 6)
    pos_ok = (
        F.round(notional, 6) <= R.ACCOUNT_EQUITY * R.MAX_POSITION_RISK * 1.2
    )
    risk_ok = ~F.col("risk_blocked")
    # The reference's daily counter increments only on EXECUTED trades
    # (`order_manager.py:201`), so the daily check sees the number of
    # prior signals that cleared every other gate — not the raw signal
    # rank. Execution requires eligibility AND budget, and the budget
    # only shrinks on execution, so executed-before = min(prior
    # eligible, limit) and the check reduces to prior-eligible < limit.
    eligible = conf_ok & cash_ok & pos_ok & risk_ok
    prior_elig = F.sum(eligible.cast("long")).over(
        Window.partitionBy("user_id", F.to_date("ts"))
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    checks = sig.withColumn("notional", notional).withColumn(
        "daily_ok", F.coalesce(prior_elig, F.lit(0)) < R.MAX_TRADES_PER_DAY
    )
    return checks.select(
        "*",
        conf_ok.alias("conf_ok"),
        cash_ok.alias("cash_ok"),
        pos_ok.alias("pos_ok"),
        risk_ok.alias("risk_ok"),
        (eligible & F.col("daily_ok")).alias("passed"),
        F.greatest(
            F.lit(1.0),
            F.floor(F.col("notional") / F.greatest(F.col("value"), F.lit(1e-6))),
        ).alias("volume"),
    )


@query("pretrade_check_gate")
def pretrade_check_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: the order lifecycle's pre-trade checks
    (`execution/order_manager.py:305-378`) per non-HOLD signal:
    confidence >= 0.50, free margin covers the confidence-scaled 2%%
    target notional, the 1.2x position-risk cap, the daily trade
    circuit breaker (rank within the signal's calendar day), and the
    risk manager's status gate. The account state is an EQUITY curve —
    the instrument's simple returns scaled by the 10%% position
    fraction and compounded (exp-sum-log, clamped) — because the
    monitor and margin watch the ACCOUNT, not the raw instrument (the
    raw synthetic series spends 96%% of its bars beyond the 15%%
    drawdown limit, which would block every order). The risk gate
    fires on a critical equity drawdown or equity daily-loss breach in
    the trailing 20 bars; free margin is the margin fraction of current
    equity while the target notional sizes off initial equity. At the
    6%% position fraction the gate splits three ways on sf0.01 (291
    clean passes, 2352 risk-blocked, 36 daily-limited); the cash and
    1.2x-cap checks are structural passes on this mean-reverting
    synthetic equity (they bind only under sustained decay /
    confidence > 1.2) — present for fidelity, not silently dropped.
    Signals
    come from the F14 feature chain at EVERY bar (latest-bar variant:
    `signal_generation`). Linear: one window pass + one aggregation.
    Decision frame shared with `run_execution_summary` via
    ``_ptg_decisions``."""
    checks = _ptg_decisions(spark, sf_dir)
    return checks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_signals"),
        F.sum(F.col("passed").cast("long")).alias("n_passed"),
        F.sum((~F.col("conf_ok")).cast("long")).alias("n_conf_fail"),
        F.sum((~F.col("cash_ok")).cast("long")).alias("n_cash_fail"),
        F.sum((~F.col("pos_ok")).cast("long")).alias("n_position_fail"),
        F.sum((~F.col("daily_ok")).cast("long")).alias("n_daily_fail"),
        F.sum((~F.col("risk_ok")).cast("long")).alias("n_risk_fail"),
        F.round(
            F.sum(F.when(F.col("passed"), F.col("volume")).otherwise(0.0)), 6
        ).alias("volume_passed"),
    )


_PTG_SQL = f"""
    WITH s AS ({_S_SQL}),
    pre AS (
      SELECT user_id, ts, rn, value, lr,
             ROUND({R.EQUITY_POSITION_FRAC}
               * COALESCE(value / LAG(value) OVER wp - 1.0, 0.0), 6)
               AS eq_ret
      FROM s WINDOW wp AS (PARTITION BY user_id ORDER BY rn)
    ),
    c0 AS (
      SELECT *,
             EXP(SUM(LN(GREATEST(1.0 + eq_ret, 1e-12))) OVER cw) AS curve
      FROM pre
      WINDOW cw AS (PARTITION BY user_id ORDER BY rn
                    ROWS UNBOUNDED PRECEDING)
    ),
    c1 AS (
      SELECT *,
             ROUND((MAX(curve) OVER cw - curve) / MAX(curve) OVER cw, 6)
               AS dd_eq
      FROM c0
      WINDOW cw AS (PARTITION BY user_id ORDER BY rn
                    ROWS UNBOUNDED PRECEDING)
    ),
    feat AS (
      SELECT user_id, ts, rn, value, eq_ret, curve, dd_eq,
             AVG(value) OVER w5 AS ma5,
             STDDEV_SAMP(lr) OVER w20 AS vol20
      FROM c1
      WINDOW w5 AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w20 AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    f2 AS (
      SELECT *,
             SUM(CASE WHEN dd_eq >= {R.MAX_DRAWDOWN}
                       OR eq_ret < -{R.MAX_DAILY_LOSS}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 0
               AS risk_blocked
      FROM feat WHERE rn >= 21
    ),
    sig AS (
      SELECT user_id, ts, rn, value, curve, risk_blocked,
             ROUND((ma5 - value) / value - 0.002, 6) AS er,
             CASE WHEN ROUND((ma5 - value) / value - 0.002, 6) > 0.01
                       AND ROUND((ma5 - value) / value - 0.002, 6)
                           / ROUND(vol20, 6) > 0.5 THEN 'BUY'
                  WHEN ROUND((ma5 - value) / value - 0.002, 6) < -0.01
                       AND -ROUND((ma5 - value) / value - 0.002, 6)
                           / ROUND(vol20, 6) > 0.5 THEN 'SELL'
                  ELSE 'HOLD' END AS action,
             ROUND(LEAST(ABS(ROUND((ma5 - value) / value - 0.002, 6))
                         / ROUND(vol20, 6), 1.0), 6) AS confidence
      FROM f2
    ),
    c AS (
      SELECT user_id, ts, rn, value, curve, confidence, er, risk_blocked,
             GREATEST(0.0, {R.ACCOUNT_EQUITY * R.MAX_POSITION_RISK}
               * CASE WHEN confidence > 0 THEN confidence
                      ELSE {R.MIN_CONFIDENCE} END) AS notional,
             {R.ACCOUNT_EQUITY * R.FREE_MARGIN_FRAC} * curve AS free_margin
      FROM sig WHERE action <> 'HOLD'
    ),
    k0 AS (
      SELECT *,
             confidence >= {R.MIN_CONFIDENCE} AS conf_ok,
             ROUND(free_margin, 6) >= ROUND(notional, 6) AS cash_ok,
             ROUND(notional, 6)
               <= {R.ACCOUNT_EQUITY * R.MAX_POSITION_RISK * 1.2} AS pos_ok,
             NOT risk_blocked AS risk_ok
      FROM c
    ),
    k AS (
      SELECT *,
             COALESCE(SUM(CASE WHEN conf_ok AND cash_ok AND pos_ok
                                AND risk_ok THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               < {R.MAX_TRADES_PER_DAY} AS daily_ok
      FROM k0
    )
"""


ORACLE["pretrade_check_gate"] = f"""
    {_PTG_SQL}
    SELECT user_id, COUNT(*) AS n_signals,
           CAST(SUM(CASE WHEN conf_ok AND cash_ok AND pos_ok AND daily_ok
                          AND risk_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_passed,
           CAST(SUM(CASE WHEN NOT conf_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conf_fail,
           CAST(SUM(CASE WHEN NOT cash_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cash_fail,
           CAST(SUM(CASE WHEN NOT pos_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_position_fail,
           CAST(SUM(CASE WHEN NOT daily_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_daily_fail,
           CAST(SUM(CASE WHEN NOT risk_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risk_fail,
           ROUND(SUM(CASE WHEN conf_ok AND cash_ok AND pos_ok AND daily_ok
                           AND risk_ok
                     THEN GREATEST(1.0, FLOOR(notional
                          / GREATEST(value, 1e-6)))
                     ELSE 0.0 END), 6) AS volume_passed
    FROM k GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# R24 — LLM risk-assessor fallback (deterministic rule-based assessment)
# ---------------------------------------------------------------------------

# Reference rule cuts (`ai_llm/risk_assessor.py:212-252`) rescaled to this
# corpus's return magnitudes (its 40%/20% annual-vol and -35%/-15% drawdown
# cuts are daily-equity scales; the events series runs ~500x hotter).
_RF_VOL_HIGH = 30000.0
_RF_DD_HIGH = -99.75
_RF_VOL_LOW = 15000.0
_RF_DD_LOW = -99.6
_RF_SHARPE_LOW = 4.5


@query(
    "risk_fallback_assessment",
    oracle=f"""
    WITH s AS ({_S_SQL}),
    r AS (
      SELECT user_id, rn,
             value / LAG(value) OVER (PARTITION BY user_id ORDER BY rn) - 1
               AS ret
      FROM s
    ),
    rr AS (SELECT * FROM r WHERE ret IS NOT NULL),
    m AS (
      SELECT user_id,
             STDDEV_SAMP(ret) * SQRT(252) * 100 AS vol_ann,
             CASE WHEN STDDEV_SAMP(ret) > 0
                  THEN AVG(ret) / STDDEV_SAMP(ret) * SQRT(252)
                  ELSE 0 END AS sharpe,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM rr GROUP BY user_id
    ),
    cum AS (
      SELECT user_id, rn,
             EXP(SUM(LN(1 + ret)) OVER (PARTITION BY user_id ORDER BY rn))
               AS c
      FROM rr WHERE ret > -1
    ),
    cm AS (
      SELECT user_id, c,
             MAX(c) OVER (PARTITION BY user_id ORDER BY rn) AS mx
      FROM cum
    ),
    dd AS (
      SELECT user_id, MIN((c - mx) / mx * 100) AS maxdd FROM cm
      GROUP BY user_id
    ),
    q AS (
      SELECT a.user_id,
             (lo.ret + ((a.n - 1) * 0.05 - FLOOR((a.n - 1) * 0.05))
                       * (hi.ret - lo.ret)) * 100 AS var95
      FROM m a
      JOIN (SELECT user_id, ret,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ret, rn) AS rk
            FROM rr) lo
        ON lo.user_id = a.user_id
       AND lo.rk = CAST(FLOOR((a.n - 1) * 0.05) AS BIGINT) + 1
      JOIN (SELECT user_id, ret,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ret, rn) AS rk
            FROM rr) hi
        ON hi.user_id = a.user_id
       AND hi.rk = CAST(CEIL((a.n - 1) * 0.05) AS BIGINT) + 1
    ),
    lvl AS (
      SELECT m.user_id,
             m.vol_ann, d.maxdd, q.var95, m.sharpe,
             CASE
               WHEN m.vol_ann > {_RF_VOL_HIGH} OR d.maxdd < {_RF_DD_HIGH}
                 THEN 'high'
               WHEN m.vol_ann < {_RF_VOL_LOW} AND d.maxdd > {_RF_DD_LOW}
                 AND m.sharpe > {_RF_SHARPE_LOW}
                 THEN 'low'
               ELSE 'medium'
             END AS risk_level
      FROM m JOIN dd d ON d.user_id = m.user_id
             JOIN q ON q.user_id = m.user_id
    )
    SELECT user_id,
           ROUND(vol_ann, 2) AS volatility_annual_pct,
           ROUND(maxdd, 2) AS max_drawdown_pct,
           ROUND(var95, 2) AS var_95_pct,
           ROUND(sharpe, 2) AS sharpe_ratio,
           risk_level,
           CAST(CASE risk_level WHEN 'high' THEN 80
                                WHEN 'low' THEN 40
                                ELSE 60 END AS INT) AS risk_score,
           CAST(CASE risk_level WHEN 'low' THEN 0 ELSE 1 END AS INT)
             AS n_concerns,
           CASE risk_level
             WHEN 'high' THEN 'Reduce exposure until volatility normalises'
             WHEN 'low' THEN 'Position size acceptable within risk budget'
             ELSE 'Maintain position with existing limits'
           END AS recommendation
    FROM lvl
    """,
)
def risk_fallback_assessment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24: the LLM risk assessor's deterministic FALLBACK path —
    reference `ai_llm/risk_assessor.py:135-252`: per-asset risk metrics
    (annualized pct volatility, compounded max drawdown, interpolated
    5% VaR, zero-rf Sharpe, `_compute_risk_metrics`) feeding the
    rule-based assessment the engine uses whenever the LLM endpoint is
    unavailable (`_fallback_assessment`): the high/medium/low ladder,
    its 80/60/40 risk score, concern count, and the recommendation
    strings — emitted verbatim. The endpoint path itself is out of
    charter scope; this IS the reference's documented degraded mode.

    Plan: one window pass for returns, a cumulative-product drawdown via
    log-sum prefix windows, the VaR as two order-statistic equi-joins
    (no full sort collected anywhere), one per-key aggregate; the ladder
    is a projection."""
    from pyspark.sql import Window as W

    s = _series(spark, sf_dir)
    wp = W.partitionBy("user_id").orderBy("rn")
    r = s.select(
        "user_id",
        "rn",
        (F.col("value") / F.lag("value").over(wp) - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    m = r.groupBy("user_id").agg(
        (F.stddev_samp("ret") * math.sqrt(252) * 100).alias("vol_ann"),
        F.when(
            F.stddev_samp("ret") > 0,
            F.avg("ret") / F.stddev_samp("ret") * math.sqrt(252),
        )
        .otherwise(0.0)
        .alias("sharpe"),
        F.count(F.lit(1)).alias("n"),
    )
    cum = r.filter(F.col("ret") > -1).select(
        "user_id",
        "rn",
        F.exp(F.sum(F.log(1 + F.col("ret"))).over(wp)).alias("c"),
    )
    cm = cum.select(
        "user_id", "c", F.max("c").over(wp.rowsBetween(Window.unboundedPreceding, 0)).alias("mx")
    )
    dd = cm.groupBy("user_id").agg(
        F.min((F.col("c") - F.col("mx")) / F.col("mx") * 100).alias("maxdd")
    )
    rk = r.select(
        "user_id",
        "ret",
        F.row_number().over(W.partitionBy("user_id").orderBy("ret", "rn")).alias(
            "rk"
        ),
    )
    var = (
        m.select("user_id", "n")
        .withColumn("pos", (F.col("n") - 1) * 0.05)
        .withColumn("k_lo", F.floor(F.col("pos")).cast("long"))
        .withColumn("k_hi", F.ceil(F.col("pos")).cast("long"))
        .join(
            rk.select(
                "user_id", F.col("rk").alias("rk1"), F.col("ret").alias("r_lo")
            ),
            ["user_id"],
        )
        .filter(F.col("rk1") == F.col("k_lo") + 1)
        .join(
            rk.select(
                "user_id", F.col("rk").alias("rk2"), F.col("ret").alias("r_hi")
            ),
            ["user_id"],
        )
        .filter(F.col("rk2") == F.col("k_hi") + 1)
        .select(
            "user_id",
            (
                (
                    F.col("r_lo")
                    + (F.col("pos") - F.floor(F.col("pos")))
                    * (F.col("r_hi") - F.col("r_lo"))
                )
                * 100
            ).alias("var95"),
        )
    )
    lvl = (
        m.join(dd, "user_id")
        .join(var, "user_id")
        .select(
            "user_id",
            "vol_ann",
            "maxdd",
            "var95",
            "sharpe",
            F.when(
                (F.col("vol_ann") > _RF_VOL_HIGH) | (F.col("maxdd") < _RF_DD_HIGH),
                "high",
            )
            .when(
                (F.col("vol_ann") < _RF_VOL_LOW)
                & (F.col("maxdd") > _RF_DD_LOW)
                & (F.col("sharpe") > _RF_SHARPE_LOW),
                "low",
            )
            .otherwise("medium")
            .alias("risk_level"),
        )
    )
    score = (
        F.when(F.col("risk_level") == "high", 80)
        .when(F.col("risk_level") == "low", 40)
        .otherwise(60)
    )
    rec = (
        F.when(
            F.col("risk_level") == "high",
            "Reduce exposure until volatility normalises",
        )
        .when(
            F.col("risk_level") == "low",
            "Position size acceptable within risk budget",
        )
        .otherwise("Maintain position with existing limits")
    )
    return lvl.select(
        "user_id",
        F.round("vol_ann", 2).alias("volatility_annual_pct"),
        F.round("maxdd", 2).alias("max_drawdown_pct"),
        F.round("var95", 2).alias("var_95_pct"),
        F.round("sharpe", 2).alias("sharpe_ratio"),
        "risk_level",
        score.cast("int").alias("risk_score"),
        F.when(F.col("risk_level") == "low", 0)
        .otherwise(1)
        .cast("int")
        .alias("n_concerns"),
        rec.alias("recommendation"),
    )


# ---------------------------------------------------------------------------
# Latest-run execution summary (scripts/summarize_latest_run.py)
# ---------------------------------------------------------------------------

# Reference `scripts/summarize_latest_run.py:45-140`: select the LATEST
# run, bound the execution events to the last 200 (`deque(maxlen=200)`,
# `:69-73`), census statuses, count rejection reasons (top 5,
# `most_common(5)`), and average slippage/confidence/expected-return over
# EXECUTED events only. Engine mapping: one run = one calendar day of the
# pre-trade decision frame (latest day), status = EXECUTED iff the R17
# gate passed, rejection reason = the FIRST failing check in the order
# manager's sequence (confidence → margin → position cap → daily limit →
# risk block, `execution/order_manager.py:305-378`); slippage has no
# analogue in the decision frame and is omitted rather than faked.
_RES_LIMIT = 200


@query("run_execution_summary")
def run_execution_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R149: the latest-run execution rollup — run row, EXECUTED /
    REJECTED status census with executed-only confidence and
    expected-return means, and the ranked rejection-reason table.
    Bounded: the event window is a 200-row top-k (TakeOrderedAndProject),
    every aggregate downstream operates on ≤200 rows."""
    d = _ptg_decisions(spark, sf_dir).withColumn("d", F.to_date("ts"))
    mx = d.agg(F.max("d").alias("run_date"))
    ev = (
        d.join(F.broadcast(mx), d["d"] == mx["run_date"])
        .orderBy(F.col("ts").desc(), F.col("user_id").asc(),
                 F.col("rn").desc())
        .limit(_RES_LIMIT)
    )
    reason = (
        F.when(F.col("passed"), F.lit(None).cast("string"))
        .when(~F.col("conf_ok"), "low_confidence")
        .when(~F.col("cash_ok"), "insufficient_margin")
        .when(~F.col("pos_ok"), "position_risk_cap")
        .when(~F.col("daily_ok"), "daily_trade_limit")
        .otherwise("risk_manager_block")
    )
    # ≤200 rows after the top-k; four downstream branches (run row,
    # status census, reason table, and tot's two crossJoin consumers)
    # each re-executed the whole _ptg_decisions + TakeOrdered pipeline —
    # materialize the window once (optimization round 12, guide §2.4)
    lab = ev.select(
        "run_date", "passed", "confidence", "er", reason.alias("reason")
    ).localCheckpoint()
    tot = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.first("run_date").alias("run_date"),
        F.sum((~F.col("passed")).cast("int")).cast("long").alias("n_rej"),
    )
    null_d = F.lit(None).cast("double")
    null_i = F.lit(None).cast("int")
    run_row = tot.select(
        F.lit("run").alias("kind"),
        F.col("run_date").cast("string").alias("label"),
        F.col("n_ev").alias("n"),
        null_d.alias("share"),
        null_d.alias("avg_confidence"),
        null_d.alias("avg_expected_return"),
        null_i.alias("rnk"),
    )
    status = (
        lab.groupBy(
            F.when(F.col("passed"), "EXECUTED")
            .otherwise("REJECTED")
            .alias("label")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(F.when(F.col("passed"), F.col("confidence"))).alias(
                "c_raw"
            ),
            F.avg(F.when(F.col("passed"), F.col("er"))).alias("e_raw"),
        )
        .crossJoin(F.broadcast(tot.select("n_ev")))
        .select(
            F.lit("status").alias("kind"),
            "label",
            "n",
            r6(F.col("n").cast("double") / F.col("n_ev")).alias("share"),
            F.when(F.col("label") == "EXECUTED", r6(F.col("c_raw"))).alias(
                "avg_confidence"
            ),
            F.when(F.col("label") == "EXECUTED", r6(F.col("e_raw"))).alias(
                "avg_expected_return"
            ),
            null_i.alias("rnk"),
        )
    )
    reasons = (
        lab.filter(~F.col("passed"))
        .groupBy(F.col("reason").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot.select("n_rej")))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("label").asc())
            ).cast("int"),
        )
        .filter(F.col("rnk") <= 5)
        .select(
            F.lit("rejection_reason").alias("kind"),
            "label",
            "n",
            r6(F.col("n").cast("double")
               / F.greatest(F.col("n_rej"), F.lit(1))).alias("share"),
            null_d.alias("avg_confidence"),
            null_d.alias("avg_expected_return"),
            "rnk",
        )
    )
    return run_row.unionByName(status).unionByName(reasons)


ORACLE["run_execution_summary"] = f"""
    {_PTG_SQL},
    ev0 AS (
      SELECT k.*, CAST(ts AS DATE) AS d,
             conf_ok AND cash_ok AND pos_ok AND risk_ok AND daily_ok
               AS passed
      FROM k
    ),
    mx AS (SELECT MAX(d) AS run_date FROM ev0),
    ev AS (
      SELECT * FROM (
        SELECT e.*, m.run_date,
               ROW_NUMBER() OVER (ORDER BY e.ts DESC, e.user_id ASC,
                                  e.rn DESC) AS gr
        FROM ev0 e JOIN mx m ON e.d = m.run_date)
      WHERE gr <= {_RES_LIMIT}
    ),
    lab AS (
      SELECT run_date, passed, confidence, er,
             CASE WHEN passed THEN NULL
                  WHEN NOT conf_ok THEN 'low_confidence'
                  WHEN NOT cash_ok THEN 'insufficient_margin'
                  WHEN NOT pos_ok THEN 'position_risk_cap'
                  WHEN NOT daily_ok THEN 'daily_trade_limit'
                  ELSE 'risk_manager_block' END AS reason
      FROM ev
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_ev,
             ANY_VALUE(run_date) AS run_date,
             CAST(SUM(CASE WHEN NOT passed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rej
      FROM lab
    )
    SELECT 'run' AS kind, CAST(run_date AS VARCHAR) AS label,
           n_ev AS n, CAST(NULL AS DOUBLE) AS share,
           CAST(NULL AS DOUBLE) AS avg_confidence,
           CAST(NULL AS DOUBLE) AS avg_expected_return,
           CAST(NULL AS INT) AS rnk
    FROM tot
    UNION ALL
    SELECT 'status',
           CASE WHEN passed THEN 'EXECUTED' ELSE 'REJECTED' END,
           CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_ev), 6),
           CASE WHEN passed
                THEN ROUND(AVG(CASE WHEN passed THEN confidence END), 6)
                END,
           CASE WHEN passed
                THEN ROUND(AVG(CASE WHEN passed THEN er END), 6) END,
           CAST(NULL AS INT)
    FROM lab CROSS JOIN tot t
    GROUP BY passed
    UNION ALL
    SELECT 'rejection_reason', label, n,
           ROUND(CAST(n AS DOUBLE) / GREATEST(n_rej, 1), 6),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(rnk AS INT)
    FROM (
      SELECT l.reason AS label, CAST(COUNT(*) AS BIGINT) AS n,
             ANY_VALUE(t.n_rej) AS n_rej,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l.reason ASC)
               AS rnk
      FROM lab l CROSS JOIN tot t
      WHERE NOT l.passed
      GROUP BY l.reason)
    WHERE rnk <= 5
"""
