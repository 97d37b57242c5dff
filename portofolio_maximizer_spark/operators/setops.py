"""Set operations (SURVEY.md §2.7, U1–U5)."""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """U1/U2: UNION ALL by column name — `etl/database_manager.py:1383-1403`,
    per-file concat `etl/data_storage.py:134-135`."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def dedupe(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """U3: duplicate elimination — `etl/preprocessor.py:135-136`."""
    return df.dropDuplicates(list(keys)) if keys else df.distinct()


def exclude(left: DataFrame, right: DataFrame) -> DataFrame:
    """U4: EXCEPT ALL-style exclusion — `integrity/pnl_integrity_enforcer.py:374-385`."""
    return left.exceptAll(right)


def intersect_keys(frames: Sequence[DataFrame], on: Sequence[str]) -> DataFrame:
    """U5: common index across model series — `forcester_ts/ensemble.py:318-321`."""
    return reduce(lambda a, b: a.join(b.select(*on).distinct(), list(on), "inner"), frames)
