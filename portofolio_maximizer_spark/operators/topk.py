"""Sorts / limits / top-k (SURVEY.md §2.6, O1–O5).

``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
heap + driver merge of k·partitions rows, no global sort. Per-group top-1
uses row_number over the group window: one shuffle on the group key, no
self-join. Both shapes scale to 100 TB untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O2/O3: ORDER BY ... LIMIT k — `etl/database_manager.py:3379-3401`."""
    return df.orderBy(*order).limit(k)


def top_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], n: int = 1
) -> DataFrame:
    """O2/O4: best row per group (best-AIC model selection,
    `forcester_ts/sarimax.py:193-210`). Deterministic iff ``order`` is a
    total order — callers append a unique tiebreaker column."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def sorted_tail_fraction(
    df: DataFrame, value: Column, frac: float = 0.1
) -> DataFrame:
    """O5: worst-decile selection via ntile — `integrity/pnl_integrity_enforcer.py:428-431`."""
    n_buckets = int(round(1.0 / frac))
    w = Window.orderBy(value)
    return df.withColumn("_b", F.ntile(n_buckets).over(w)).filter(F.col("_b") == 1).drop("_b")
