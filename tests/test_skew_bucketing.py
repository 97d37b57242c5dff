"""Skew salting and bucketed co-located joins — the charter's
partition-strategy checklist, verified at the RESULT level (salted ==
unsalted) and at the PLAN level (co-bucketed join has no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portofolio_maximizer_spark.operators.skew import salted_aggregate, salted_join
from portofolio_maximizer_spark.sources.catalog import load_table


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    salted = salted_aggregate(
        ev, keys=["event_type"], salt_by=["event_id"], n_salts=8
    )
    cols = ["event_type", "n", "min_value", "max_value"]
    assert _rows(plain, cols) == _rows(salted, cols)
    # float sums compared with tolerance (summation order differs by design)
    p = {r.event_type: r.sum_value for r in plain.collect()}
    s = {r.event_type: r.sum_value for r in salted.collect()}
    for k in p:
        assert abs(p[k] - s[k]) < 1e-6 * max(1.0, abs(p[k]))


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct().withColumn("type_tag", F.upper("event_type"))
    )
    plain = ev.join(dim, "event_type")
    salted = salted_join(
        ev, dim, key="event_type", salt_by=["event_id"], n_salts=8
    )
    cols = ["event_id", "event_type", "type_tag"]
    assert _rows(plain, cols) == _rows(salted, cols)


@pytest.mark.parametrize(
    "how", ["inner", "left", "left_semi", "left_anti"]
)
def test_salted_join_matches_plain_per_how(spark, sf_dir, how):
    """Property sweep over every replica-safe ``how``: the salted join
    must equal the plain join row-for-row — including unmatched FACT
    rows (left: NULL dim cols once) and the anti complement. The dim
    deliberately misses one key ('purchase') and carries one key absent
    from the fact ('zzz_ghost') so every how exercises its asymmetry."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .filter(F.col("event_type") != "purchase")
        .withColumn("type_tag", F.upper("event_type"))
        .unionByName(
            spark.createDataFrame(
                [("zzz_ghost", "ZZZ_GHOST")], ["event_type", "type_tag"]
            )
        )
    )
    plain = ev.join(dim, "event_type", how)
    salted = salted_join(
        ev, dim, key="event_type", salt_by=["event_id"], n_salts=8, how=how
    )
    cols = ["event_id", "event_type"]
    if how in ("inner", "left"):
        cols.append("type_tag")
    assert _rows(plain, cols) == _rows(salted, cols)


@pytest.mark.parametrize("how", ["right", "full", "outer", "right_outer"])
def test_salted_join_rejects_dim_preserving_hows(spark, sf_dir, how):
    """right/full outer would surface an unmatched dim row once PER
    REPLICA (n_salts times) — the helper must refuse, not silently
    duplicate."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct()
    with pytest.raises(ValueError, match="replica-safe"):
        salted_join(ev, dim, key="event_type", salt_by=["event_id"], how=how)


def test_salt_is_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = salted_aggregate(ev, ["event_type"], ["event_id"], 8).collect()
    b = salted_aggregate(ev, ["event_type"], ["event_id"], 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    """Write orders and customer co-bucketed on the join key."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("bktest.orders_bk")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("bktest.customer_bk")
    )
    yield "bktest.orders_bk", "bktest.customer_bk"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_bk")
    spark.sql("DROP TABLE IF EXISTS bktest.customer_bk")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    """Charter: "repartition()/bucketing for co-located joins" — a join of
    two tables bucketed on the join key must be a SortMergeJoin with NO
    Exchange on either side (bucket layout replaces the shuffle)."""
    ot, ct = bucketed_tables
    joined = (
        spark.table(ot)
        .join(spark.table(ct), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    )
    # disable broadcast so the plan must choose sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and it still returns the right rows
    plain = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert joined.count() == plain.count()


def test_skew_salted_rollup_structure_and_equality(spark, sf_dir):
    """R155's advice ladder EXECUTED: the oracle-backed
    `skew_salted_rollup` must (a) equal the plain unsalted GROUP BY
    exactly, and (b) actually carry the two-stage shuffle structure —
    one exchange keyed (user_id, _salt) for the partial pass, then a
    user_id-only exchange for the fold."""
    import re

    from portofolio_maximizer_spark.plans.queries_ops import (
        skew_salted_rollup,
    )

    got = skew_salted_rollup(spark, sf_dir)

    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
    )
    cols = [
        "user_id", "n_events", "total_value",
        "min_value", "max_value", "n_event_types",
    ]
    assert _rows(got, cols) == _rows(plain, cols)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(user_id#\d+L?, _salt#", plan), plan
    assert re.search(r"hashpartitioning\(user_id#\d+L?, \d+\)", plan), plan


def test_bucket_db_eviction_sweeps_dead_data_roots(spark, sf_dir):
    """bkt_* warehouse dirs from DEAD data roots (scalecheck replicas,
    deleted sf dirs) must be swept on the next ensure; the live sf's dir
    survives. Cross-process analog: registries evict, dirs must too."""
    import json
    import os

    from portofolio_maximizer_spark.plans import queries_ops
    from portofolio_maximizer_spark.plans.queries_ops import (
        _ensure_bucketed_pair,
    )

    # the sweep runs on the first ensure of a PROCESS; an earlier test in
    # the same session may have warmed the registry (fast path skips the
    # sweep by design) — clear it to simulate the fresh-process entry
    queries_ops._BUCKETED_READY.clear()
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    dead = os.path.join(wh, "bkt_deadbeef.db")
    os.makedirs(dead, exist_ok=True)
    with open(os.path.join(dead, "_origin.json"), "w") as f:
        json.dump({"sf_dir": "/nonexistent/replica/sf1"}, f)
    unmarked = os.path.join(wh, "bkt_feedface.db")
    os.makedirs(unmarked, exist_ok=True)

    ot, _ = _ensure_bucketed_pair(spark, sf_dir)
    live_db = ot.split(".")[0]
    assert not os.path.exists(dead), "dead-origin dir must be swept"
    assert not os.path.exists(unmarked), "marker-less dir must be swept"
    assert os.path.isdir(os.path.join(wh, f"{live_db}.db"))
    # a SECOND ensure must keep the live dir (its origin exists)
    _ensure_bucketed_pair(spark, sf_dir)
    assert os.path.isdir(os.path.join(wh, f"{live_db}.db"))


def test_bucketed_colocated_join_query_plan(spark, sf_dir):
    """R157: the oracle-backed bucketed-join query must actually be
    shuffle-free under the join — the ONLY exchange in the plan is the
    final bounded mktsegment rollup."""
    from portofolio_maximizer_spark.plans.queries_ops import (
        bucketed_colocated_join,
    )

    df = bucketed_colocated_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bloom_filtered_join_plan_structure(spark, sf_dir):
    """R158's plan contract: the runtime Bloom filter must actually be
    INJECTED — the optimized plan carries a bloom_filter_might_contain
    predicate on the lineitem (application) side fed by a
    bloom_filter_agg over the filtered orders keys — and the join must
    be a shuffle join (broadcast disabled: the pattern exists for the
    case where neither side fits)."""
    from portofolio_maximizer_spark.plans.queries_ops import (
        bloom_filtered_join,
    )

    df = bloom_filtered_join(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in optimized, optimized
    assert "bloom_filter_agg" in optimized, optimized
    assert "might_contain" in physical, physical
    assert "BroadcastHashJoin" not in physical, physical
    # and the filter is semantics-free: equals the plain join+filter
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert (
        df.agg(F.sum("n_items").cast("long")).first()[0]
        == li.join(o, li.l_orderkey == o.o_orderkey).count()
    )


def test_dpp_pruned_rollup_plan_structure(spark, sf_dir):
    """R159's plan contract: the fact-side FileScan must carry a
    dynamicpruningexpression in its PartitionFilters (runtime pruning,
    not a statically folded IN-list), and the pruning must be
    semantics-free vs the plain unpartitioned join."""
    from portofolio_maximizer_spark.plans.queries_ops import (
        dpp_pruned_rollup,
    )

    df = dpp_pruned_rollup(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in phys, phys
    # data-dependent gate: no static partition IN-list on the fact scan
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.groupBy("event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)"))
                / F.count(F.lit(1))
            ).alias("avg_value")
        )
        .filter(F.col("avg_value") > 50)
    )
    plain = ev.join(dim, "event_type")
    assert (
        df.agg(F.sum("n_events").cast("long")).first()[0] == plain.count()
    )


def test_conf_child_sessions_are_pooled(spark, sf_dir):
    """Round-10 directive #3: repeated invocations of the conf-isolated
    queries (R157 bucketed join, R158 Bloom join) must NOT spawn a new
    child session each time — one pooled session per (application,
    conf-profile), so repeated bench passes accumulate no short-lived
    session state in the JVM."""
    from portofolio_maximizer_spark.plans import queries_ops as ops

    ops._CHILD_SESSIONS.clear()
    ops.bucketed_colocated_join(spark, sf_dir).count()
    ops.bloom_filtered_join(spark, sf_dir).count()
    assert len(ops._CHILD_SESSIONS) == 2
    first = dict(ops._CHILD_SESSIONS)
    # repeat invocations: the pool neither grows nor replaces entries
    ops.bucketed_colocated_join(spark, sf_dir).count()
    ops.bloom_filtered_join(spark, sf_dir).count()
    assert len(ops._CHILD_SESSIONS) == 2
    for k, v in ops._CHILD_SESSIONS.items():
        assert first[k] is v
    # profiles are genuinely isolated from the parent session
    app = spark.sparkContext.applicationId
    child = ops._CHILD_SESSIONS[(app, "no-broadcast")]
    assert child.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert (
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
    )


def test_aqe_skew_join_plan_splits_hot_partition(spark, sf_dir):
    """R162's plan contract: after execution, the adaptive final plan
    must carry a sort-merge join marked `skew=true` — the runtime split
    of the manufactured hot partition actually happened — and the
    result must equal the plain-join rollup."""
    from portofolio_maximizer_spark.plans.queries_ops import (
        aqe_skew_join_rollup,
    )

    df = aqe_skew_join_rollup(spark, sf_dir)
    rows = {r["is_hot"]: (r["n_rows"], r["n_keys"]) for r in df.collect()}
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, final
    # semantics-free: plain join on the parent session agrees (the query
    # replicates the fact to a constant ~100k rows; mirror that here)
    ev = load_table(spark, sf_dir, "events")
    nrep = max(1, -(-100_000 // ev.count()))
    k = F.when(F.pmod(F.col("user_id"), 3) < 2, F.lit(0)).otherwise(
        F.col("user_id")
    )
    f = ev.select(k.cast("long").alias("k")).crossJoin(
        F.broadcast(spark.range(nrep).select(F.lit(1).alias("_i")))
    ).drop("_i")
    d = ev.select(k.cast("long").alias("k")).distinct()
    j = f.join(d, "k")
    plain = {
        r["is_hot"]: (r["n_rows"], r["n_keys"])
        for r in j.groupBy((F.col("k") == 0).cast("int").alias("is_hot"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
        )
        .collect()
    }
    assert rows == plain
    assert rows[1][1] == 1  # the hot side is exactly one key


def test_cbo_join_reorder_plan(spark, sf_dir):
    """R164's plan contract: with CBO + joinReorder on (and stats
    ANALYZEd), the optimized plan joins customer⋈nation INNERMOST and
    orders OUTERMOST despite the query being written orders-first; the
    same query without CBO keeps the syntactic order."""
    from portofolio_maximizer_spark.plans.queries_ops import (
        _ensure_analyzed_triple,
        cbo_join_reorder_rollup,
    )

    df = cbo_join_reorder_rollup(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    joins = [ln for ln in opt.splitlines() if "Join Inner" in ln]
    assert len(joins) == 2, opt
    # outermost join (first in tree print) is on the customer key; the
    # nation join sits inside it
    assert "o_custkey" in joins[0], joins
    assert "n_nationkey" in joins[1], joins
    # control: CBO off keeps the written order (nation join outermost)
    ot, ct, nt = _ensure_analyzed_triple(spark, sf_dir)
    plain = spark.newSession()
    plain.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o, c, n = plain.table(ot), plain.table(ct), plain.table(nt)
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .filter(n.n_name == "NATION_7")
    )
    opt2 = j._jdf.queryExecution().optimizedPlan().toString()
    joins2 = [ln for ln in opt2.splitlines() if "Join Inner" in ln]
    assert "n_nationkey" in joins2[0], joins2
    assert "o_custkey" in joins2[1], joins2
