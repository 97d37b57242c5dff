"""Config-driven pipeline runner — SURVEY §3.1's entry point, Spark-side.

The reference's `scripts/run_etl_pipeline.py:642-751` topologically orders
7 config-declared stages (`config/pipeline_config.yml:9-80`) and runs them
in one process. Here a pipeline is a JSON list of stages, each naming a
registered query; every stage output is materialized through
``sources.io.checkpoint_stage`` (atomic parquet + sidecar metadata with a
content fingerprint), so

- a re-run with unchanged inputs produces byte-stable fingerprints
  (deterministic queries — pinned in tests), and
- any downstream consumer (or a resumed run) reads the landed parquet
  instead of recomputing, which is the reference's checkpoint-manager
  behavior (`etl/checkpoint_manager.py`) without the pickles.

Config shape::

    {"sf_dir": "/root/testdata/sf0.01",
     "checkpoint_root": "/tmp/pipe",
     "stages": [
       {"name": "quality", "query": "text_quality_by_source"},
       {"name": "dedup",   "query": "exact_dup_groups"}
     ]}

Stages run in declared order (the reference's DAG is linear in practice;
explicit dependencies would slot in here if stages ever fed each other
through the catalog).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession

from .sources.io import checkpoint_stage


def run_pipeline(
    spark: SparkSession, config: dict[str, Any], run_id: str | None = None
) -> list[dict]:
    """Run every stage; return the list of stage manifests."""
    from portofolio_maximizer_spark.plans import QUERIES

    sf_dir = config["sf_dir"]
    root = config["checkpoint_root"]
    manifests: list[dict] = []
    for stage in config["stages"]:
        name, qname = stage["name"], stage["query"]
        if qname not in QUERIES:
            raise KeyError(f"stage {name!r} names unknown query {qname!r}")
        df = QUERIES[qname](spark, sf_dir)
        meta = checkpoint_stage(df, root, name, run_id=run_id)
        meta["query"] = qname
        manifests.append(meta)
    manifest_path = f"{root}/pipeline_manifest.json"
    with open(manifest_path, "w") as fh:
        json.dump({"run_id": run_id, "stages": manifests}, fh, indent=1, default=str)
    return manifests


def run_pipeline_file(
    spark: SparkSession, config_path: str, run_id: str | None = None
) -> list[dict]:
    with open(config_path) as fh:
        return run_pipeline(spark, json.load(fh), run_id=run_id)
