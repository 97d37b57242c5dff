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
    "unlinked_close_repair_plan": "EXCHANGES",
    "dashboard_snapshot": "EXCHANGES",
    "classifier_label_accumulation": "EXCHANGES",
    "split_drift_psi": "EXCHANGES",
    "token_budget_epoch_plan": "EXCHANGES",
    "capital_readiness_check": "EXCHANGES",
    "barbell_pnl_evaluation": "EXCHANGES",
    "platt_contract_audit": "EXCHANGES",
    "order_learner_health_check": "EXCHANGES",
    "ticker_universe_summary": "EXCHANGES",
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
    # exactly the documented composition: 10 EXCHANGES + 1 NESTED_LOOP
    # (15 EXCHANGES before optimization round 12 removed five — see
    # JUSTIFIED_SOFT_FLAGS comments)
    kinds = sorted(EXPECTED_SOFT_FLAGS.values())
    assert kinds.count("EXCHANGES") == 10
    assert kinds.count("NESTED_LOOP_JOIN") == 1
    assert len(EXPECTED_SOFT_FLAGS) == 11


def test_pinned_queries_exist_in_registry():
    from portofolio_maximizer_spark.plans import QUERIES

    missing = set(EXPECTED_SOFT_FLAGS) - set(QUERIES)
    assert not missing, f"pinned queries not in registry: {missing}"
