"""Physical-plan pins for the headline queries — the properties that make
the plans survive a 100× scale-up. A correctness-green query whose plan
regressed (lost pushdown, dim no longer broadcast, all-pairs join appeared)
fails here even though its values still match the oracle."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from planaudit import audit, plan_text  # noqa: E402

from portofolio_maximizer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return plan_text(QUERIES[name](spark, SF))


def test_q1_pushdown_pruning_partial_agg(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # the shipdate predicate must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 referenced columns are read
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert read.count(",") + 1 == 7, read
    # partial + final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_broadcast_dim_joins_no_smj(spark):
    for name in ("q3_top_revenue", "q14_promo_revenue", "q19_disjunctive_revenue"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_no_cartesian_in_dedup_similarity(spark):
    for name in (
        "minhash_lsh_neardups",
        "simhash_buckets",
        "embedding_lsh_ann",
        "decontamination_overlap",
        "heavy_hitter_tokens",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_windowed_query_single_shuffle(spark):
    # one Exchange for the per-customer window partitioning, nothing more
    plan = _plan(spark, "running_customer_spend")
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_audit_clean_on_headliners(spark):
    for name in ("q1_pricing_summary", "q5_region_revenue", "events_hourly_rollup"):
        flags = audit(_plan(spark, name))
        assert not flags, (name, flags)


def test_nested_loop_adjudicator(spark):
    """The r8 BNLJ classifier: a crossJoin(broadcast(<scalar agg>)) is
    the documented scalar-attach pattern (no flag); a cross join of two
    sf-scaling frames still flags; the declared O(N²) cosine baseline
    keeps its flag."""
    from pyspark.sql import functions as F

    from planaudit import nested_loop_flags, optimized_plan_text
    from portofolio_maximizer_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events")
    scalar = ev.agg(F.sum("value").alias("tot"))
    good = ev.crossJoin(F.broadcast(scalar))
    assert nested_loop_flags(plan_text(good), optimized_plan_text(good)) == []

    docs = load_table(spark, SF, "documents").select("doc_id")
    bad = ev.crossJoin(F.broadcast(docs))
    assert nested_loop_flags(plan_text(bad), optimized_plan_text(bad)) == [
        "NESTED_LOOP_JOIN"
    ]

    baseline = QUERIES["embedding_cosine_neardups"](spark, SF)
    assert nested_loop_flags(
        plan_text(baseline), optimized_plan_text(baseline)
    ) == ["NESTED_LOOP_JOIN"]
