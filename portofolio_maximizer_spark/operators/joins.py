"""Join operators (SURVEY.md §2.3, J1–J10).

The reference's joins are SQLite views + pandas index alignment; here each is
a DataFrame combinator chosen for its shuffle behavior at 100 TB:

- dimension sides are wrapped in ``broadcast()`` when small (region/nation/
  supplier-class tables) so the fact table never shuffles for them;
- the as-of join is the union+window pattern (one shuffle on the partition
  key, no range cross-product) rather than a naive inequality join, which
  Catalyst would execute as a broadcast-nested-loop;
- FIFO allocation is a running-sum interval overlap, not an iterative loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def left_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J1: closes LEFT JOIN openers — `etl/database_manager.py:1404-1425`."""
    return left.join(right, list(on), "left")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J2: NOT EXISTS — `etl/database_manager.py:1374-1379`."""
    return left.join(right, list(on), "left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J3: EXISTS — `integrity/pnl_integrity_enforcer.py:458-467`."""
    return left.join(right, list(on), "left_semi")


def align_inner(
    actual: DataFrame, pred: DataFrame, on: Sequence[str]
) -> DataFrame:
    """J4: inner index alignment before metrics — `forcester_ts/metrics.py:18-36`."""
    return actual.join(pred, list(on), "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """J6: as-of (last-value-before) join via union + ignorenulls last().

    For each left row, attach the most recent right-side values at or before
    its timestamp. Reference semantics: macro context ffill-reindexed onto the
    price index (`etl/time_series_feature_builder.py:222-234`).

    Plan shape: one union (no shuffle), one window sort per key — the same
    shuffle the downstream per-key features need anyway, so at scale this is
    strictly cheaper than a range join. Left rows tagged ``_side=1`` sort
    after right rows at equal timestamps, so an exactly-coincident right row
    is visible (inclusive as-of).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *keys, ts, *right_value_cols
    ).withColumn("_side", F.lit(0))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.unionByName(rt.select(lt.columns))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")


def pivot_wide(
    df: DataFrame, index: str, pivot_col: str, value: Column, names: Sequence[str]
) -> DataFrame:
    """J7: long→wide pivot — `backtesting/candidate_simulator.py:238-243`.

    ``names`` is passed explicitly: with the pivot domain declared, Spark
    skips the extra distinct-values job (one full scan saved — significant
    at 100 TB).
    """
    return df.groupBy(index).pivot(pivot_col, list(names)).agg(value)


def fifo_allocate(
    lots: DataFrame,
    demand: DataFrame,
    keys: Sequence[str],
    lot_order: str,
    lot_qty: str = "lot_qty",
    demand_qty: str = "demand_qty",
) -> DataFrame:
    """J8: FIFO lot matching as running-sum interval overlap.

    Each lot owns the interval [cum_before, cum_before+qty) of cumulative
    supply per key; a single demand per key consumes [0, demand_qty) and the
    allocation to each lot is the length of the interval intersection —
    closed-form, no iteration. Reference does this with a Python loop over
    open lots (`execution/paper_trading_engine.py:344-453`); the window
    version parallelizes across keys and is O(n log n) in the sort.

    Returns lots joined with ``allocated`` (0 for untouched lots).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(lot_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lots = lots.withColumn(
        "cum_before", F.coalesce(F.sum(lot_qty).over(w), F.lit(0.0))
    )
    # demand is one row per key — can be as large as the key domain, so no
    # broadcast hint; AQE picks broadcast only when it actually fits.
    joined = lots.join(demand.select(*keys, demand_qty), list(keys), "left")
    allocated = F.greatest(
        F.lit(0.0),
        F.least(F.col(lot_qty), F.coalesce(F.col(demand_qty), F.lit(0.0)) - F.col("cum_before")),
    )
    return joined.withColumn("allocated", allocated).drop(demand_qty)


def overlap_violations(
    allocations: DataFrame,
    opener_key: str,
    alloc_qty: str,
    opener_qty: str,
) -> DataFrame:
    """J9: duplicate-close overlap — GROUP BY opener HAVING COUNT>1 AND
    sum(allocated) > opener shares (`integrity/pnl_integrity_enforcer.py:1109-1160`).
    """
    return (
        allocations.groupBy(opener_key, opener_qty)
        .agg(
            F.count(F.lit(1)).alias("n_closes"),
            F.sum(alloc_qty).alias("total_allocated"),
        )
        .filter(
            (F.col("n_closes") > 1) & (F.col("total_allocated") > F.col(opener_qty))
        )
    )
