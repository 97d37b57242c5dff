"""S3 — provider failover as priority-resolved union (SURVEY §2.1).

Reference: `etl/data_source_manager.py:95-160` (providers sorted by
priority, lower number wins), `:369-437` (`_failover_extraction`: try
sources in priority order until one yields the ticker), `:175-185`
(frames tagged with their source name).

The reference fails over at FETCH time, per ticker batch. On landed
data the equivalent is declarative: tag each source's frame, union, and
keep the highest-priority row per key — one window over the union, no
driver-side retry loop. A 1000-source union is still a single shuffle
on the dedup key, and per-source health falls out of the same pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SOURCE_COL = "_source"
PRIORITY_COL = "_priority"


def tag_source(df: DataFrame, name: str, priority: int) -> DataFrame:
    """Tag a landed frame with its provider name and priority
    (`data_source_manager._tag_extracted_frame`)."""
    return df.withColumn(SOURCE_COL, F.lit(name)).withColumn(
        PRIORITY_COL, F.lit(int(priority))
    )


def failover_union(
    sources: list[tuple[str, int, DataFrame]],
    keys: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Resolve N tagged sources to one row per key: the lowest priority
    number present wins (the reference's 'fallback' mode, resolved
    set-wide instead of per fetch attempt). Deterministic: ties beyond
    (priority, source) break on ``tiebreak`` columns."""
    tagged = [tag_source(df, name, pr) for name, pr, df in sources]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    order = [F.col(PRIORITY_COL), F.col(SOURCE_COL)] + [
        F.col(c) for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def failover_health(resolved: DataFrame) -> DataFrame:
    """Per-source health of a resolved union: how many keys each
    provider actually served (`get_cache_statistics` analog)."""
    return (
        resolved.groupBy(SOURCE_COL, PRIORITY_COL)
        .agg(F.count(F.lit(1)).alias("n_keys_served"))
        .orderBy(PRIORITY_COL)
    )
