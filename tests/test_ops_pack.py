"""Invariant tests for the operational-reconciliation pack (pack 11).

The oracle differential already value-checks every query; these pin the
LADDER SEMANTICS — properties that must hold for any input, the kind a
refactor could silently break while values still match a co-refactored
oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from portofolio_maximizer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def platt(spark) -> pd.DataFrame:
    return QUERIES["platt_outcome_reconciliation"](spark, SF).toPandas()


def test_platt_matched_rows_carry_outcome(platt):
    m = platt[platt.match_status == "MATCHED"]
    assert len(m) > 0
    assert m.outcome_pnl.notna().all()
    assert m.outcome_win.isin([0, 1]).all()
    assert m.matched_orderkey.notna().all()
    assert m.match_anchor.isin(["timestamp", "date_fallback"]).all()


def test_platt_unmatched_rows_carry_no_outcome(platt):
    u = platt[platt.match_status != "MATCHED"]
    assert u.outcome_pnl.isna().all()
    assert u.matched_orderkey.isna().all()
    assert u.match_anchor.isna().all()


def test_platt_status_vocabulary_and_mode_rules(platt):
    allowed = {
        "ALREADY_DONE", "HOLD_SKIPPED", "NOT_YET_ELIGIBLE", "MATCHED",
        "NO_ROW", "OPEN_ONLY_LIFECYCLE_LAG", "SYMBOL_MISMATCH",
        "TIME_MISMATCH", "MULTIPLE_ROWS",
    }
    assert set(platt.match_status.unique()) <= allowed
    # symbol mismatches can only arise on the direct-id path (mode B
    # pre-filters by symbol at fetch, reference `:497-501`)
    sym = platt[platt.match_status == "SYMBOL_MISMATCH"]
    assert (sym["mode"] == "ts_signal_id").all()
    # mode A has at most one candidate, so MULTIPLE_ROWS is mode-B-only
    multi = platt[platt.match_status == "MULTIPLE_ROWS"]
    assert (multi["mode"] == "symbol_time_fallback").all()
    # DATE_FALLBACK_USED is stamped exactly on fallback-anchored matches
    fb = platt[platt.reason_code == "DATE_FALLBACK_USED"]
    assert (fb.match_anchor == "date_fallback").all()
    assert (
        platt[platt.match_anchor == "date_fallback"].reason_code
        == "DATE_FALLBACK_USED"
    ).all()


def test_slo_gate_consistent_with_entry_frame(spark, platt):
    gate = QUERIES["date_fallback_slo_gate"](spark, SF).toPandas().iloc[0]
    assert gate.total_entries == len(platt)
    assert gate.matched_new == (platt.match_status == "MATCHED").sum()
    assert gate.timestamp_matched == (platt.match_anchor == "timestamp").sum()
    assert gate.date_fallback_matched == (
        platt.match_anchor == "date_fallback"
    ).sum()
    assert gate.still_pending == gate.pending - gate.matched_new
    if gate.matched_new:
        assert gate.timestamp_match_rate == pytest.approx(
            gate.timestamp_matched / gate.matched_new, abs=1e-6
        )
    assert gate.slo_verdict in ("PASS", "FAIL")


@pytest.fixture(scope="module")
def repair(spark) -> pd.DataFrame:
    return QUERIES["unlinked_close_repair_plan"](spark, SF).toPandas()


def test_repair_fifo_all_or_nothing(repair):
    done = repair[repair.fifo_complete == 1]
    assert len(done) > 0
    # all-or-nothing: a complete FIFO covers the close exactly
    assert (done.allocated_total == done.close_size).all()
    assert (done.n_allocations >= 1).all()
    assert done.first_entry_id.notna().all()
    incomplete = repair[repair.fifo_complete == 0]
    assert (incomplete.allocated_total == 0.0).all()
    assert (incomplete.n_allocations == 0).all()


def test_repair_ladder_semantics(repair):
    # clean-live closes never take the broad pool (reference `:291-292`)
    clean = repair[repair.clean_live == 1]
    assert not (clean.strategy == "broad_orphan_match").any()
    # the run pool is a subset of the ticker's orphan pool
    both = repair[repair.strategy.isin(
        ["current_position_run", "broad_orphan_match"])]
    assert (both.run_inventory <= both.broad_inventory + 1e-6).all()
    # refusal reason appears exactly on the clean-live refusal rung
    refused = repair[repair.repair_reason == "refused_clean_live_broad_repair"]
    assert (refused.strategy == "clean_live_no_current_run_match").all()
    assert (refused.fifo_complete == 0).all()


def test_backtest_invariants_and_independent_replay(spark):
    bt = QUERIES["llm_signal_backtest"](spark, SF).toPandas()
    assert (bt.final_value > 0).all()
    assert ((bt.max_drawdown >= 0) & (bt.max_drawdown < 1)).all()
    assert ((bt.win_rate >= 0) & (bt.win_rate <= 1)).all()
    # passed_validation is exactly the three-clause fold
    fold = (
        (bt.annual_return > 0.10)
        & (bt.alpha > 0)
        & (bt.trading_days >= 30)
    ).astype(int)
    assert (bt.passed_validation == fold).all()
    # independent pandas replay of one key's recursion
    import numpy as np

    from portofolio_maximizer_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value") > 0)
        .select("user_id", "ts", "event_id", "value", "event_type")
        .toPandas()
    )
    uid = int(bt.user_id.iloc[0])
    sub = ev[ev.user_id == uid].sort_values(["ts", "event_id"])
    import hashlib

    def u(ch, eid):
        h = hashlib.md5(f"{ch}|{eid}".encode()).hexdigest()[:6]
        return int(h, 16) / 16777216.0

    pos, cap = 0, 100_000.0
    for r in sub.itertuples():
        if r.event_type != "click":
            continue
        u1, u2 = u("act", r.event_id), u("cnf", r.event_id)
        action = "BUY" if u1 < 0.4 else ("SELL" if u1 < 0.7 else "HOLD")
        conf = 0.5 + u2 / 2
        price = r.value
        if action == "BUY" and cap >= price:
            sh = int(cap * conf * 0.95 / price)
            if sh > 0:
                pos += sh
                cap -= sh * price
        elif action == "SELL" and pos > 0:
            sell = int(pos * conf)
            if sell > 0:
                pos -= sell
                cap += sell * price
    final = cap + pos * sub.value.iloc[-1]
    got = float(bt[bt.user_id == uid].final_value.iloc[0])
    assert got == pytest.approx(final, rel=1e-9)
