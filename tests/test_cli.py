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


def test_pipeline_runner_deterministic(spark, tmp_path):
    import json

    from portofolio_maximizer_spark.pipeline import run_pipeline

    cfg = {
        "sf_dir": "/root/testdata/sf0.001",
        "checkpoint_root": str(tmp_path / "pipe"),
        "stages": [
            {"name": "quality", "query": "text_quality_by_source"},
            {"name": "deciles", "query": "customer_spend_deciles"},
        ],
    }
    m1 = run_pipeline(spark, cfg, run_id="r1")
    m2 = run_pipeline(spark, cfg, run_id="r2")
    assert [m["fingerprint"] for m in m1] == [m["fingerprint"] for m in m2]
    manifest = json.load(open(str(tmp_path / "pipe" / "pipeline_manifest.json")))
    assert [s["stage"] for s in manifest["stages"]] == ["quality", "deciles"]
    import os

    for m in m1:
        assert os.path.exists(os.path.join(m["path"], "_checkpoint.json"))


def test_pipeline_unknown_query_raises(spark, tmp_path):
    import pytest

    from portofolio_maximizer_spark.pipeline import run_pipeline

    with pytest.raises(KeyError):
        run_pipeline(
            spark,
            {
                "sf_dir": "/root/testdata/sf0.001",
                "checkpoint_root": str(tmp_path),
                "stages": [{"name": "x", "query": "nope"}],
            },
        )


def test_example_pipeline_configs_name_real_queries():
    """Every shipped pipeline config must reference registered queries —
    the configs are the documented §3 entry-point examples."""
    import glob
    import json

    from portofolio_maximizer_spark.plans import QUERIES

    configs = glob.glob("pipelines/*.json")
    assert len(configs) >= 3
    for path in configs:
        cfg = json.load(open(path))
        assert cfg["stages"], path
        for stage in cfg["stages"]:
            assert stage["query"] in QUERIES, (path, stage["query"])
