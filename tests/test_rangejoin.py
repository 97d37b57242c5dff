"""Bucketed range join: semantic equivalence to the naive BETWEEN join and
the plan property that justifies its existence (equi-join, no nested loop)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "tools")

from planaudit import plan_text  # noqa: E402

from portofolio_maximizer_spark.operators.rangejoin import bucketed_interval_join
from portofolio_maximizer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _fixture(spark):
    pts = spark.createDataFrame(
        [(k % 3, i, 100 + 37 * i % 900) for i, k in enumerate(range(60))],
        "key int, pid int, t long",
    ).select("key", "pid", F.timestamp_seconds("t").alias("ts"))
    ivs = spark.createDataFrame(
        [(j % 3, j, 50 + 61 * j % 700, 150 + 61 * j % 700) for j in range(20)],
        "key int, iid int, lo long, hi long",
    ).select(
        "key",
        "iid",
        F.timestamp_seconds("lo").alias("w_start"),
        F.timestamp_seconds("hi").alias("w_end"),
    )
    return pts, ivs


def test_bucketed_equals_naive(spark):
    pts, ivs = _fixture(spark)
    got = bucketed_interval_join(
        pts, ivs, "ts", "w_start", "w_end", bucket_seconds=100, keys=["key"]
    ).select("pid", "iid")
    naive = (
        pts.alias("p")
        .join(
            ivs.alias("i"),
            (F.col("p.key") == F.col("i.key"))
            & (F.col("p.ts") >= F.col("i.w_start"))
            & (F.col("p.ts") <= F.col("i.w_end")),
        )
        .select("pid", "iid")
    )
    assert naive.count() > 0  # fixture actually exercises matches
    assert (
        got.exceptAll(naive).union(naive.exceptAll(got)).count() == 0
    )


def test_followup_plan_is_equi_join(spark):
    plan = plan_text(QUERIES["followup_orders_in_window"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
