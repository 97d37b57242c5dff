"""Bucketed range join — interval containment without a nested loop.

Spark compiles a raw ``p.ts BETWEEN i.start AND i.end`` join (no equality
conjunct) to ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(N·M)
and a scale-killer. The standard fix (what Databricks' range-join hints do
under the hood) is bucketing: quantize time into fixed-width buckets,
explode each interval into the buckets it covers, give each point its
single containing bucket, equi-join on bucket (plus any key conjuncts),
then re-check the exact range predicate.

Each (point, interval) pair meets in EXACTLY one bucket — the point's —
so no dedup pass is needed. Cost: |intervals| × (span/width + 1) exploded
rows; pick ``bucket_seconds`` ≈ the typical interval span so the blow-up
is ~2× while the join stays an equi-join (shuffle- or broadcast-hash, AQE
skew-splittable at 100 TB).

Reference analog: interval/session attribution logic
(`execution/trade_reconciliation.py` window matching), re-expressed as a
relational operator instead of a per-row scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join each point to every interval containing it.

    ``points`` and ``intervals`` may share equi-``keys`` (matched
    exactly); ``start``/``end`` are inclusive timestamp bounds. Apart
    from ``keys``, the two frames' column names must be disjoint (rename
    before calling). Returns points' columns + intervals' columns with
    ``keys`` appearing once. Intervals with zero points drop out; callers
    wanting count-0 rows left-join aggregates back onto the intervals
    frame (see ``followup_orders_in_window``).
    """
    def _epoch(col: str):
        # TIMESTAMP_NTZ has no direct numeric cast in Spark 4; route via
        # LTZ (session tz is fixed, and only bucket CONSISTENCY matters —
        # the residual range predicate is evaluated on the raw timestamps)
        return F.col(col).cast("timestamp_ltz").cast("double")

    pts = points.withColumn(
        "_bucket", F.floor(_epoch(point_ts) / bucket_seconds).cast("long")
    )
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(start) / bucket_seconds).cast("long"),
                F.floor(_epoch(end) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = pts.join(ivs, ["_bucket", *keys], "inner").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    return joined.drop("_bucket")
