"""Invariant tests for the attribution / curation / finetune / universe /
snapshot / bundle packs — structural properties the oracle differential
cannot express (ladder consistency, redaction guarantees, fail-closed
behavior), pinned against python replicas where the math is closed-form."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

Q = entrymod.queries()
SF = "/root/testdata/sf0.001"


def test_attribution_flag_consistency(spark):
    rows = Q["outcome_linkage_attribution"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.integrity_blocking == (
            r.causality_violation or r.missing_exit_reason
        )
        assert r.counts_toward_readiness_denominator == (
            not r.integrity_blocking
        )
        assert r.counts_toward_linkage_denominator == (
            r.outcome_linked and not r.integrity_blocking
        )
        # tercile labels only on analysis rows with snr
        if r.snr_tercile is not None:
            assert r.counts_toward_linkage_denominator and r.snr is not None
        # fast take-profit implies take-profit and analysis membership
        if r.fast_take_profit_hit:
            assert r.take_profit_hit and r.counts_toward_linkage_denominator
        assert r.integrity_status == (
            "HIGH" if r.integrity_blocking else "OK"
        )


def test_attribution_posterior_formula(spark):
    z = 1.959963984540054
    for r in Q["attribution_snr_terciles"](spark, SF).collect():
        for fam in ("tp", "fast"):
            s = getattr(r, f"{fam}_successes")
            f_ = getattr(r, f"{fam}_failures")
            a, b = s + 1.0, f_ + 1.0
            mean = a / (a + b)
            sd = math.sqrt((a * b) / (((a + b) * (a + b)) * (a + b + 1)))
            assert getattr(r, f"{fam}_posterior_mean") == pytest.approx(
                mean, abs=1e-6
            )
            assert getattr(r, f"{fam}_ci_lo") == pytest.approx(
                max(0.0, mean - z * sd), abs=1e-6
            )
            assert getattr(r, f"{fam}_ci_hi") == pytest.approx(
                min(1.0, mean + z * sd), abs=1e-6
            )


def test_curation_fail_closed_consistency(spark):
    s = Q["training_curation_summary"](spark, SF).collect()[0]
    n_trades = Q["training_curation_trades"](spark, SF).count()
    n_audits = Q["training_curation_audits"](spark, SF).count()
    if s.fail_closed:
        assert s.eligibility_mode == "explicit_zero_healthy"
        assert n_trades == 0 and n_audits == 0
        assert s.trades_output == "skipped (fail-closed)"
        assert s.status == "WARN"
    else:
        assert s.trades_n_filtered == n_trades
        assert s.audits_n_filtered == n_audits


def test_finetune_redaction_and_dedupe(spark):
    df = Q["llm_finetune_dataset"](spark, SF)
    rows = df.collect()
    assert rows
    secret_pats = [
        re.compile(r"\bsk-[A-Za-z0-9_-]{16,}\b"),
        re.compile(r"\bBearer\s+[A-Za-z0-9\-\._~\+/=]{16,}\b", re.I),
        re.compile(r"\b[A-Za-z0-9+/]{32,}={0,2}\b"),
    ]
    keys = set()
    for r in rows:
        for pat in secret_pats:
            assert not pat.search(r.instruction), r.instruction
            assert not pat.search(r.output), r.output
        assert r.record_key not in keys  # dedupe kept keys unique
        keys.add(r.record_key)
        assert r.instruction and r.output
    assert len(rows) <= 500
    # redaction has real support upstream (census column)
    summ = Q["llm_finetune_summary"](spark, SF).collect()[0]
    assert summ.n_redacted > 0
    assert summ.records_after_dedupe <= summ.records_before_dedupe


def test_universe_positions_and_blocklist(spark):
    rows = sorted(
        Q["ticker_universe_resolution"](spark, SF).collect(),
        key=lambda r: r.position,
    )
    assert [r.position for r in rows] == list(range(1, len(rows) + 1))
    # base block strictly precedes frontier block
    origins = [r.origin for r in rows]
    if "frontier" in origins:
        first_f = origins.index("frontier")
        assert all(o == "frontier" for o in origins[first_f:])
    # region-2 frontier symbols (the blocklist) are absent
    blocked = {
        f"F{k}_{i}" for k in range(2, 25, 5) for i in (1, 2)
    }
    assert not blocked & {r.ticker for r in rows}


def test_validator_verdict_replica(spark):
    rows = sorted(
        Q["ticker_validator_census"](spark, SF).collect(),
        key=lambda r: r.ord,
    )
    tick_re = re.compile(r"^[A-Z0-9\.\-]{1,10}$")
    seen = set()
    for r in rows:
        norm = r.raw.strip().upper()
        assert r.normalized == norm
        if norm == "":
            expect = "empty"
        elif (
            tick_re.match(norm)
            and not norm.startswith("ZZ")
            and norm in seen
        ):
            expect = "duplicate"
        elif not tick_re.match(norm):
            expect = "invalid_format"
        elif norm.startswith("ZZ"):
            expect = "prefix_blocked"
        else:
            expect = "kept"
            seen.add(norm)
        assert r.verdict == expect, (r.ord, r.raw, r.verdict, expect)


def test_snapshot_file_diff_buckets(spark):
    for r in Q["baseline_snapshot_file_diff"](spark, SF).collect():
        if r.bucket == "added":
            assert r.sha_a is None and r.sha_b is not None
        elif r.bucket == "removed":
            assert r.sha_a is not None and r.sha_b is None
        else:
            assert r.bucket == "changed"
            assert r.sha_a is not None and r.sha_b is not None
            assert r.sha_a != r.sha_b


def test_bundle_rescaling_shift(spark):
    rows = Q["forecast_bundle_rescaling"](spark, SF).collect()
    assert rows
    flagged = [r for r in rows if r.needs_rescaling]
    for r in rows:
        if r.needs_rescaling:
            assert r.display_value == pytest.approx(
                r.forecast_value + r.latest_close, abs=1e-6
            )
        else:
            assert r.display_value == pytest.approx(
                r.forecast_value, abs=1e-9
            )
    # per-(ticker, model) flag is uniform across horizons
    by_g = {}
    for r in rows:
        by_g.setdefault((r.ticker, r.model_type), set()).add(
            r.needs_rescaling
        )
    assert all(len(v) == 1 for v in by_g.values())


def test_dataset_profiles_sanity(spark):
    prof = {
        r.column_name: r
        for r in Q["dataset_missing_profile"](spark, SF).collect()
    }
    assert set(prof) == {"value", "score", "latency", "count"}
    assert prof["count"].n_missing == 0
    any_row = prof["value"]
    assert any_row.total_missing_values == sum(
        r.n_missing for r in prof.values()
    )
    rate = any_row.overall_missing_rate
    assert 0 <= rate <= 100
    expected_sev = (
        "excellent" if rate < 1 else "acceptable" if rate < 5 else "concerning"
    )
    assert any_row.severity == expected_sev
    if rate >= 5:
        assert any_row.missing_category.startswith("Substantial")
    t = Q["dataset_temporal_profile"](spark, SF).collect()[0]
    assert t.is_time_series
    assert t.sampling_period_days > 0
    assert t.temporal_gaps_detected >= 0
    assert t.gap_rate <= 1.0
