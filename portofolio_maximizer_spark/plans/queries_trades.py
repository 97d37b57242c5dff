"""Query pack 5 — trade-integrity surface (views + PnL audit queries).

Re-creates the reference's SQL integrity layer — the three views
(`production_closed_trades`, `trade_close_linkages`, `round_trips`,
`etl/database_manager.py:1366-1425`) and the PnL-integrity checks
(`integrity/pnl_integrity_enforcer.py`) — on the driver's orders/lineitem
star schema: orders play trades, lineitems play legs, ``l_returnflag='R'``
plays the close/contamination flag.

Operators exercised: P7 production predicate (filter + NOT EXISTS),
J1 left join close→open, J2 anti join, J9 grouped-HAVING overlap,
U1 UNION ALL with anti-join fallback, A4 canonical PnL metrics with
worst-decile expected shortfall, plus CUBE grouping sets (the §2.4 note:
the reference has none; the Spark surface exposes them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .queries import query, r6


# ---------------------------------------------------------------------------
# P7 + J2 — production predicate with NOT EXISTS exclusion
# ---------------------------------------------------------------------------


@query(
    "production_closed_orders",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS total_value
    FROM orders o
    WHERE o.o_orderstatus = 'F'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def production_closed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 production-trades predicate: closed (status F) orders with no
    contaminated leg, via filter + left_anti join — reference view
    `production_closed_trades` (`etl/database_manager.py:1366-1380`:
    flag filters + NOT EXISTS synthetic-opener exclusion).

    The anti join's build side is the DISTINCT flagged-key set — far
    smaller than lineitem — and AQE picks broadcast when it fits; the
    orders scan is never shuffled twice."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    ).distinct()
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .join(flagged, "o_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact decimal sum: 2-dp money at ~1e9 magnitude exceeds what
            # a double sum can hash-match at 6 decimals (SURVEY §7.3 item 6)
            r6(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — round_trips: closes LEFT JOIN opening legs
# ---------------------------------------------------------------------------


@query(
    "round_trips",
    oracle="""
    WITH mx AS (
      SELECT l_orderkey, MAX(l_linenumber) AS maxline
      FROM lineitem GROUP BY l_orderkey
    ),
    closes AS (
      SELECT l.l_orderkey,
             SUM(l.l_quantity) AS cq,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS cnet,
             MAX(l.l_shipdate) AS cship
      FROM lineitem l
      JOIN mx ON mx.l_orderkey = l.l_orderkey AND l.l_linenumber = mx.maxline
      GROUP BY l.l_orderkey
    ),
    opens AS (
      SELECT l_orderkey,
             SUM(l_quantity) AS oq,
             SUM(l_extendedprice * (1 - l_discount)) AS onet,
             MIN(l_shipdate) AS oship
      FROM lineitem
      WHERE l_linenumber = 1 AND l_returnflag <> 'R'
      GROUP BY l_orderkey
    )
    SELECT c.l_orderkey AS orderkey,
           ROUND(c.cq, 6) AS close_qty,
           ROUND(o.oq, 6) AS open_qty,
           ROUND(c.cnet - o.onet, 6) AS gross_pnl,
           DATEDIFF('day', o.oship, c.cship) AS holding_days
    FROM closes c
    LEFT JOIN opens o ON o.l_orderkey = c.l_orderkey
    WHERE c.l_orderkey < 3000
    """,
)
def round_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 round_trips view: closing legs LEFT JOIN opening legs on the
    order key, null-preserving when every opener is disqualified —
    reference `etl/database_manager.py:1404-1425` (closes LEFT JOIN
    openers on entry_trade_id).

    Line numbers are NOT unique within an order in this data, so legs are
    AGGREGATED lots, never row-picks: close lot = all legs at the max line
    number (summed), open lot = all unflagged line-1 legs (summed) —
    deterministic under ties, which row_number/ANY_VALUE are not
    (SURVEY §7.3 item 2: determinism for the oracle)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    mx = li.groupBy("l_orderkey").agg(F.max("l_linenumber").alias("maxline"))
    closes = (
        li.join(
            mx,
            (li.l_orderkey == mx.l_orderkey) & (li.l_linenumber == mx.maxline),
        )
        .drop(mx.l_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("cq"),
            F.sum(net).alias("cnet"),
            F.max("l_shipdate").alias("cship"),
        )
    )
    opens = (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_returnflag") != "R"))
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("oq"),
            F.sum(net).alias("onet"),
            F.min("l_shipdate").alias("oship"),
        )
    )
    c, o = closes.alias("c"), opens.alias("o")
    return c.join(o, F.col("o.l_orderkey") == F.col("c.l_orderkey"), "left").select(
        F.col("c.l_orderkey").alias("orderkey"),
        r6(F.col("cq")).alias("close_qty"),
        r6(F.col("oq")).alias("open_qty"),
        r6(F.col("cnet") - F.col("onet")).alias("gross_pnl"),
        F.datediff(F.to_date("cship"), F.to_date("oship"))
        .cast("bigint")
        .alias("holding_days"),
    )


# ---------------------------------------------------------------------------
# J9 — duplicate-close overlap detection (grouped HAVING)
# ---------------------------------------------------------------------------


@query(
    "duplicate_close_overlap",
    oracle="""
    WITH opener AS (
      SELECT l_orderkey, ROUND(SUM(l_quantity), 6) AS opener_qty
      FROM lineitem WHERE l_linenumber = 1
      GROUP BY l_orderkey
    )
    SELECT l.l_orderkey AS orderkey,
           COUNT(*) AS n_closes,
           ROUND(SUM(l.l_quantity), 6) AS closed_qty,
           MAX(o.opener_qty) AS opener_qty
    FROM lineitem l
    JOIN opener o ON o.l_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R' AND l.l_linenumber > 1
    GROUP BY l.l_orderkey
    HAVING COUNT(*) > 1 AND ROUND(SUM(l.l_quantity), 6) > MAX(o.opener_qty)
    """,
)
def duplicate_close_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 duplicate-close overlap: orders whose flagged closing legs
    outnumber AND out-size the opening lot — reference
    `integrity/pnl_integrity_enforcer.py:1109-1160` (closes GROUP BY
    opener HAVING COUNT>1 AND sum(allocated) > opener shares).

    The opening lot is SUMMED per order first (line numbers are not
    unique here), so the join is 1:N and the HAVING threshold compares
    values rounded identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    opener = (
        li.filter(F.col("l_linenumber") == 1)
        .groupBy("l_orderkey")
        .agg(r6(F.sum("l_quantity")).alias("opener_qty"))
    )
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") > 1))
        .join(opener, "l_orderkey")
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_closes"),
            r6(F.sum("l_quantity")).alias("closed_qty"),
            F.max("opener_qty").alias("opener_qty"),
        )
        .filter((F.col("n_closes") > 1) & (F.col("closed_qty") > F.col("opener_qty")))
    )


# ---------------------------------------------------------------------------
# U1 — lot linkage: explicit links UNION ALL anti-join fallback
# ---------------------------------------------------------------------------


@query(
    "lot_linkage_union",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey, l_linenumber, l_partkey
      FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber > 1
        AND l_orderkey < 3000
    ),
    explicit AS (
      SELECT c.l_orderkey AS orderkey, c.l_linenumber AS close_line,
             MIN(p.l_linenumber) AS open_line, 'explicit' AS link_type
      FROM closes c
      JOIN lineitem p ON p.l_orderkey = c.l_orderkey
        AND p.l_partkey = c.l_partkey AND p.l_linenumber < c.l_linenumber
      GROUP BY c.l_orderkey, c.l_linenumber
    ),
    fallback AS (
      SELECT c.l_orderkey AS orderkey, c.l_linenumber AS close_line,
             1 AS open_line, 'fallback' AS link_type
      FROM closes c
      WHERE NOT EXISTS (
        SELECT 1 FROM explicit e
        WHERE e.orderkey = c.l_orderkey AND e.close_line = c.l_linenumber)
    )
    SELECT * FROM explicit UNION ALL SELECT * FROM fallback
    """,
)
def lot_linkage_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 trade_close_linkages view: explicit close→open links (same part
    earlier in the order) UNION ALL an anti-join fallback that links
    orphan closes to the first lot — reference `etl/database_manager.py:
    1383-1403` (explicit allocations + UNION ALL anti-join fallback)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    closes = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") > 1)
    ).select("l_orderkey", "l_linenumber", "l_partkey")
    c, p = closes.alias("c"), li.alias("p")
    explicit = (
        c.join(
            p,
            (F.col("p.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("p.l_partkey") == F.col("c.l_partkey"))
            & (F.col("p.l_linenumber") < F.col("c.l_linenumber")),
        )
        .groupBy(
            F.col("c.l_orderkey").alias("orderkey"),
            F.col("c.l_linenumber").alias("close_line"),
        )
        .agg(F.min("p.l_linenumber").alias("open_line"))
        .withColumn("link_type", F.lit("explicit"))
    )
    fallback = (
        closes.select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("close_line"),
        )
        .join(explicit.select("orderkey", "close_line"), ["orderkey", "close_line"], "left_anti")
        .select(
            "orderkey",
            "close_line",
            F.lit(1).alias("open_line"),
            F.lit("fallback").alias("link_type"),
        )
    )
    return explicit.select(
        "orderkey", "close_line", "open_line", "link_type"
    ).unionByName(fallback)


# ---------------------------------------------------------------------------
# A4 — canonical PnL metrics with worst-decile expected shortfall
# ---------------------------------------------------------------------------


@query(
    "pnl_canonical_metrics",
    oracle="""
    WITH pnl AS (
      SELECT o.o_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                   * CASE WHEN l.l_returnflag = 'R' THEN -1 ELSE 1 END), 6) AS pnl
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY o.o_orderkey
    ),
    ranked AS (
      SELECT pnl,
             ROW_NUMBER() OVER (ORDER BY pnl, o_orderkey) AS rn_asc,
             COUNT(*) OVER () AS n
      FROM pnl
    )
    SELECT COUNT(*) AS n_trades,
           ROUND(AVG(CASE WHEN pnl > 0 THEN 1.0 ELSE 0.0 END), 6) AS win_rate,
           ROUND(SUM(CASE WHEN pnl > 0 THEN pnl ELSE 0 END)
                 / NULLIF(SUM(CASE WHEN pnl < 0 THEN -pnl ELSE 0 END), 0), 6)
             AS profit_factor,
           ROUND(AVG(CASE WHEN pnl > 0 THEN pnl END), 6) AS avg_win,
           ROUND(AVG(CASE WHEN pnl < 0 THEN pnl END), 6) AS avg_loss,
           ROUND(AVG(CASE WHEN pnl > 0 THEN pnl END)
                 / NULLIF(ABS(AVG(CASE WHEN pnl < 0 THEN pnl END)), 0), 6)
             AS payoff_ratio,
           ROUND(MAX(pnl), 6) AS largest_win,
           ROUND(MIN(pnl), 6) AS largest_loss,
           ROUND(AVG(CASE WHEN rn_asc <= n // 10 THEN pnl END), 6)
             AS worst_decile_es
    FROM ranked
    """,
)
def pnl_canonical_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 canonical PnL metric suite over closed trades: win rate, profit
    factor, avg/largest win/loss, payoff ratio, worst-decile expected
    shortfall — reference `integrity/pnl_integrity_enforcer.py:365-480`.

    The decile tail uses a deterministic row_number over (pnl, key) —
    NOT ntile on raw floats — and pnl is rounded to 6 before ranking, so
    Spark and DuckDB rank the exact same numbers (SURVEY §7.3 item 6).
    The global window is one row per closed ORDER (not per line), small at
    any scale; at 100 TB the per-order pre-agg does the heavy lifting
    map-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    signed = F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.when(
        F.col("l_returnflag") == "R", -1
    ).otherwise(1)
    pnl = (
        o.filter(F.col("o_orderstatus") == "F")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(r6(F.sum(signed)).alias("pnl"))
    )
    ranked = pnl.select(
        "pnl",
        F.row_number().over(Window.orderBy("pnl", "o_orderkey")).alias("rn_asc"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    p = F.col("pnl")
    pos = F.when(p > 0, p)
    neg = F.when(p < 0, p)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_trades"),
        r6(F.avg(F.when(p > 0, 1.0).otherwise(0.0))).alias("win_rate"),
        r6(
            F.sum(F.when(p > 0, p).otherwise(0.0))
            / F.nullif(F.sum(F.when(p < 0, -p).otherwise(0.0)), F.lit(0.0))
        ).alias("profit_factor"),
        r6(F.avg(pos)).alias("avg_win"),
        r6(F.avg(neg)).alias("avg_loss"),
        r6(F.avg(pos) / F.nullif(F.abs(F.avg(neg)), F.lit(0.0))).alias(
            "payoff_ratio"
        ),
        r6(F.max(p)).alias("largest_win"),
        r6(F.min(p)).alias("largest_loss"),
        r6(
            F.avg(F.when(F.col("rn_asc") <= F.floor(F.col("n") / 10), p))
        ).alias("worst_decile_es"),
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets (§2.4 note — the Spark surface exposes them)
# ---------------------------------------------------------------------------


@query(
    "order_status_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one pass —
    SURVEY §2.4 closing note (reference has single-dim groupings only;
    grouping sets come free on the Spark surface). Partial aggregation
    covers every grouping set in the same shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r6(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
            .alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# SQL surface: the reference's views as Spark SQL views + a spark.sql query
# ---------------------------------------------------------------------------


@query(
    "sql_view_weekly_revenue",
    oracle="""
    WITH production AS (
      SELECT o.o_orderkey, o.o_orderdate
      FROM orders o
      WHERE o.o_orderstatus = 'F'
        AND NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_returnflag = 'R')
    )
    SELECT CAST(DATE_TRUNC('week', p.o_orderdate) AS DATE) AS week,
           COUNT(DISTINCT p.o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE), 6)
             AS net_revenue
    FROM production p JOIN lineitem l ON l.l_orderkey = p.o_orderkey
    GROUP BY DATE_TRUNC('week', p.o_orderdate)
    """,
)
def sql_view_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's view-over-view SQL surface on Spark SQL proper:
    registers the production-orders view (P7 shape,
    `etl/database_manager.py:1366-1380`) as a TEMP VIEW and queries it
    with ``spark.sql`` — same Catalyst plan as the DataFrame API, proving
    the engine's SQL entry point end-to-end. Weekly rollup in exact
    decimals (A14 + the decimal-sum convention)."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW production_orders AS
        SELECT o.o_orderkey, o.o_orderdate
        FROM orders o
        LEFT ANTI JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                        WHERE l_returnflag = 'R') r
          ON o.o_orderkey = r.l_orderkey
        WHERE o.o_orderstatus = 'F'
        """
    )
    return spark.sql(
        """
        SELECT CAST(DATE_TRUNC('week', p.o_orderdate) AS DATE) AS week,
               COUNT(DISTINCT p.o_orderkey) AS n_orders,
               ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE), 6)
                 AS net_revenue
        FROM production_orders p JOIN lineitem l ON l.l_orderkey = p.o_orderkey
        GROUP BY DATE_TRUNC('week', p.o_orderdate)
        """
    )
