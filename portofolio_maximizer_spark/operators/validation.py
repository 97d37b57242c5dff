"""Validation / predicate operators (SURVEY.md §2.2, P1–P9).

The reference validates with pandas scans (`etl/data_validator.py:36-90`,
`etl/preprocessor.py:79-214`); here each check is a single aggregation over
the input — all checks for a table fuse into ONE pass (one job, map-side
partials), returning a one-row DataFrame of violation counts that a caller
turns into PASS/WARN/FAIL. No collect of data rows, only of the tiny verdict.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def non_positive_count(col: Column) -> Column:
    """P2: count of values <= 0 — `etl/data_validator.py:52-61`."""
    return F.sum(F.when(col <= 0, 1).otherwise(0))


def negative_count(col: Column) -> Column:
    """P3 — `etl/data_validator.py:63-70`."""
    return F.sum(F.when(col < 0, 1).otherwise(0))


def missing_ratio(col: Column) -> Column:
    """P4: fraction of NULL/NaN — `etl/data_validator.py:72-80`."""
    bad = col.isNull() | F.isnan(col.cast("double"))
    return F.avg(bad.cast("int"))


def non_finite_count(col: Column) -> Column:
    """P6/P8: NaN or ±Inf — `etl/preprocessor.py:79-214` structural gate."""
    c = col.cast("double")
    return F.sum((F.isnan(c) | (F.abs(c) == float("inf"))).cast("int"))


def zscore_outlier_count(col: Column, sigma: float = 3.0) -> Column:
    """P5: |z| > sigma against the group mean/std — `etl/data_validator.py:1-13`.

    Aggregate-only form: count(|x−μ|>σ·s). Needs μ and s from the same group,
    so express as a subquery/window by the caller; provided here as a helper
    over a pre-computed z column.
    """
    return F.sum(F.when(F.abs(col) > sigma, 1).otherwise(0))


def validate_table(
    df: DataFrame,
    price_cols: Sequence[str] = (),
    volume_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    missing_threshold: float = 0.05,
) -> DataFrame:
    """One-pass OHLCV-style validation verdict (P2–P4, P8).

    Returns a single-row DataFrame of violation counts + a PASS/FAIL verdict,
    mirroring `etl/data_validator.py:36-90` (on_failure policy applied by the
    caller, as the reference's pipeline config does).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    fail_terms: list[Column] = []
    for c in price_cols:
        a = non_positive_count(F.col(c)).alias(f"{c}_nonpos")
        aggs.append(a)
        fail_terms.append(F.col(f"{c}_nonpos") > 0)
    for c in volume_cols:
        aggs.append(negative_count(F.col(c)).alias(f"{c}_neg"))
        fail_terms.append(F.col(f"{c}_neg") > 0)
    for c in numeric_cols:
        aggs.append(missing_ratio(F.col(c)).alias(f"{c}_missing_ratio"))
        aggs.append(non_finite_count(F.col(c)).alias(f"{c}_nonfinite"))
        fail_terms.append(F.col(f"{c}_missing_ratio") > missing_threshold)
    out = df.agg(*aggs)
    verdict = F.lit("PASS")
    for t in fail_terms:
        verdict = F.when(t, "FAIL").otherwise(verdict)
    return out.withColumn("verdict", verdict)


def structural_gate(
    df: DataFrame, keys: Sequence[str], ts: str, min_rows: int = 1
) -> DataFrame:
    """P6: duplicate keys, non-monotonic timestamps, row floor — reference
    post-preprocess gate `etl/preprocessor.py:79-214`. One aggregation after
    one window pass."""
    w = Window.partitionBy(*keys).orderBy(ts)
    flagged = df.select(
        *keys,
        ts,
        (F.lag(ts, 1).over(w) >= F.col(ts)).cast("int").alias("_nonmono"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys, ts)).alias("_dupes"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce(F.col("_nonmono"), F.lit(0))).alias("non_monotonic"),
        F.sum((F.col("_dupes") > 1).cast("int")).alias("duplicate_key_rows"),
        (F.count(F.lit(1)) >= min_rows).alias("meets_min_rows"),
    )


def production_filter(
    trades: DataFrame, synthetic_openers: DataFrame, link_col: str = "entry_trade_id"
) -> DataFrame:
    """P7: production closes = flag filter + anti-join against synthetic
    openers — `etl/database_manager.py:1366-1380`."""
    base = trades.filter(
        (F.col("is_close") == 1)
        & (F.col("is_diagnostic") == 0)
        & (F.col("is_synthetic") == 0)
        & (F.col("is_contaminated") == 0)
    )
    return base.join(synthetic_openers, [link_col], "left_anti")
