"""Every SQL-expressible query — registered AND demoted — must exactly
match its DuckDB oracle twin at sf0.001: the local replica of the driver's
correctness gate, covering the demoted queries the driver window no longer
sees (plans/__init__.py DEMOTED)."""

from __future__ import annotations

import pytest

from aws_data_pipeline_spark.plans import DEMOTED, load_registry
from tests.oracle import run_compare

REGISTRY = dict(load_registry())
REGISTRY.update(DEMOTED)
SQL_QUERIES = sorted(name for name, q in REGISTRY.items() if q.sql is not None)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.sql is None)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    run_compare(spark, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
