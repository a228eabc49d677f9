"""Primary correctness gate (SURVEY.md §5.2(1)): every registered
query with a SQL oracle must match DuckDB at sf0.01 — the same check
the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duckdb_run

REGISTRY = load_all()
SQL_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    spark_df = spec.builder(spark, SF_ORACLE)
    oracle_pdf = duckdb_run(spec.oracle, SF_ORACLE)
    compare(spark_df, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    """Non-SQL-expressible queries must still run and return rows with
    a stable schema (the driver's weaker check)."""
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_ORACLE)
    assert len(df.columns) > 0
    assert df.count() >= 0
