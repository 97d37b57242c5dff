"""CLI driver surface (SURVEY §3 entry points)."""

from __future__ import annotations

from portofolio_maximizer_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list", "q1*"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out
    assert "q19_disjunctive_revenue\toracle" in out


def test_cli_unknown_query(capsys):
    assert main(["run", "no_such_query"]) == 2
