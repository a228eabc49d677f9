"""Primary correctness gate (SURVEY.md §5.2(1)): every registered
query with a SQL oracle must match DuckDB — the same check the driver
runs for CORRECTNESS_r{N}.json.

Two scale factors run by default: sf0.01 (the driver's SF, fast lane)
and sf0.1 (slow lane, @slow-marked) — a query whose parity holds at
one SF but breaks at 10× (sampling thresholds, rounding drift under
different aggregation orders, window-frame edge counts) is caught
here, not in a one-off session. Deselect the big lane with
``-m "not slow"`` when iterating."""

from __future__ import annotations

import pytest

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE, SF_ORACLE_BIG
from tests.oracle import compare, duckdb_run

REGISTRY = load_all()
SQL_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)

SFS = [
    pytest.param(SF_ORACLE, id="sf0.01"),
    pytest.param(SF_ORACLE_BIG, id="sf0.1", marks=pytest.mark.slow),
]


@pytest.mark.parametrize("sf_dir", SFS)
@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, name, sf_dir):
    spec = REGISTRY[name]
    spark_df = spec.builder(spark, sf_dir)
    oracle_pdf = duckdb_run(spec.oracle, sf_dir)
    compare(spark_df, oracle_pdf, name)


def test_every_query_is_sql_oracled():
    """Since round 5 every registered query carries a SQL oracle
    (q_agg_approx, the last rows-only entry, now oracles a derived
    deterministic projection). Pin that as an inventory invariant: a
    future rows-only registration must either gain an oracle or
    consciously revive the weaker runs-only check this test replaced
    (parametrize its builder over ROWS_ONLY, assert columns + count)."""
    assert ROWS_ONLY == [], (
        f"queries without oracles appeared: {ROWS_ONLY} — oracle them or "
        "restore the rows-only runs-check for them"
    )
