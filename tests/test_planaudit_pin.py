"""The soft-flag inventory pin (round-10 directive #5).

planaudit's 16 soft flags were previously documented only in prose
(VERDICT/BENCH_NOTES) — a new query adding an unexplained soft flag
changed no gate. This module carries the inventory as a TEST: the
full-registry audit (`tools/planaudit.py <sf_dir>`) now exits 1 on any
drift from `planaudit.EXPECTED_SOFT_FLAGS`, and this test asserts that
pin equals the justified inventory below. Adding (or removing) a soft
flag therefore requires editing BOTH files — the pin to make the audit
pass, and this mirror with a written justification to make pytest pass.

Since round 12 each pin value is the query's full sorted "+"-joined
soft-flag KIND-SET (e.g. a query emitting both EXCHANGES and WIDE_SCAN
would pin "EXCHANGES+WIDE_SCAN"), so a pinned query silently gaining a
second flag kind drifts loudly (round-11 ADVICE #3). Every current
entry happens to emit exactly one kind.

Every entry's justification:

- The 15 EXCHANGES entries are bounded-composition report folds: each is
  a multi-facet operational report whose every Exchange shuffles on a
  BOUNDED key (rule ids, scenario grid, provider names, the fixed
  25-ticker ladder, 10 calibration bins, ...) — per-exchange
  adjudication lives in BENCH_NOTES.md ("soft-flag adjudication",
  carried since round 9). The >12-exchange threshold exists to catch
  sf-scaling shuffle chains; these plans' exchange COUNT is fixed by the
  report's facet count, not by data volume.
- embedding_cosine_neardups is the ONE declared NESTED_LOOP: L6's exact
  all-pairs cosine baseline, kept as the recall oracle for the L2/L28/L7
  scale paths; it refuses corpora >200k vectors by contract.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from planaudit import EXPECTED_SOFT_FLAGS  # noqa: E402

JUSTIFIED_SOFT_FLAGS = {
    # -- bounded-composition EXCHANGES reports (see module docstring) --
    # Optimization round 12 removed five of the original 15 entries by
    # removing the exchanges themselves (OPTIMIZATION_r12.md):
    #   run_execution_summary     — B4.2 materialized the <=200-row
    #     top-k window once; the four downstream branches scan it.
    #   attribution_multiway_table — B4.1 materialized the shared
    #     _ola_recf helper frame once per session.
    #   dedup_savings_curve / llm_system_health_report /
    #   nav_rebalance_plan        — B6.1 shared-frame composition: the
    #     sub-query frames they re-planned inline (ngram_jaccard_
    #     neardups; llm_performance_summary + llm_signal_validation +
    #     signal_backtest_report; ticker_eligibility_classification +
    #     sleeve_promotion_plan) are built once per session and
    #     materialized at the first consumer's action, so the composite
    #     plans no longer carry the sub-pipelines' exchanges.
    # Optimization round 13 removed six MORE by removing the exchanges
    # themselves (OPTIMIZATION_r13.md, plan captures in plans/r13/):
    #   barbell_pnl_evaluation    — the baseline/barbell arm union and
    #     the metrics/delta union each re-embedded the full trade
    #     pipeline; one explode + one pivot-then-explode keep a single
    #     subtree (1,910 -> 590 plan lines, 29 -> 9 Exchanges).
    #   dashboard_snapshot        — per-trade stats regrouped through a
    #     day-grain checkpointed partial; quality+latency merged into
    #     one events pass (1,394 -> 474 lines).
    #   classifier_label_accumulation — the four census rows explode
    #     from one reference of the census aggregate instead of four
    #     unions (860 -> 356 lines).
    #   ticker_universe_summary   — normalized/deduped counts in one
    #     pass; merged_syms pinned once (634 -> 333 lines).
    #   token_budget_epoch_plan   — the |domains|-row frame pinned once
    #     under the totals/demand/redistribution chain (584 -> 355).
    #   capital_readiness_check   — R3 trade stats + R6 orphan census
    #     fold into one when()-guarded pass over a single closes-side
    #     left join (845 -> 613 lines).
    "unlinked_close_repair_plan": "EXCHANGES",
    "order_learner_health_check": "EXCHANGES",
    # -- 1-row-scalar crossJoin chains behind a checkpoint (round 13) --
    # split_drift_psi / platt_contract_audit now pin NESTED_LOOP_JOIN
    # instead of EXCHANGES: their restructures checkpoint 1-row global
    # aggregates (split: the 30-row split x bin counts feeding five
    # branches; platt: the merged hold+quality aggregate) and the
    # checkpoint's LogicalRDD hides the Aggregate node the auditor's
    # BNLJ exemption uses to prove a crossJoin side bounded. The frames
    # are single-row (global aggregates) / <=30-row by construction, so
    # every flagged join is a 1xN broadcast scalar attach at any scale.
    "split_drift_psi": "NESTED_LOOP_JOIN",
    "platt_contract_audit": "NESTED_LOOP_JOIN",
    # -- the one declared O(N^2) correctness baseline --
    "embedding_cosine_neardups": "NESTED_LOOP_JOIN",
}


def test_soft_flag_pin_matches_justified_inventory():
    assert EXPECTED_SOFT_FLAGS == JUSTIFIED_SOFT_FLAGS, (
        "planaudit's EXPECTED_SOFT_FLAGS drifted from the justified "
        "inventory — if a soft flag was deliberately added/removed, "
        "update tests/test_planaudit_pin.py with a justification"
    )


def test_soft_flag_pin_shape():
    # exactly the documented composition: 2 EXCHANGES + 3 NESTED_LOOP
    # (15 EXCHANGES before optimization round 12 removed five and round
    # 13 removed six more / re-kinded two — see JUSTIFIED_SOFT_FLAGS)
    kinds = sorted(EXPECTED_SOFT_FLAGS.values())
    assert kinds.count("EXCHANGES") == 2
    assert kinds.count("NESTED_LOOP_JOIN") == 3
    assert len(EXPECTED_SOFT_FLAGS) == 5


def test_pinned_queries_exist_in_registry():
    from portofolio_maximizer_spark.plans import QUERIES

    missing = set(EXPECTED_SOFT_FLAGS) - set(QUERIES)
    assert not missing, f"pinned queries not in registry: {missing}"
