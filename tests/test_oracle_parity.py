"""Primary correctness gate (SURVEY.md §5.2(1)): every registered
query with a SQL oracle must match DuckDB — the same check the driver
runs for CORRECTNESS_r{N}.json.

Lanes (r13, VERDICT r12 #2 — the 38-minute default suite outran the
driver's verification budget):

- DEFAULT (fast) lane: the driver's 50-query window at sf0.01 — the
  exact queries and SF the external driver re-checks, so the default
  ``pytest tests/ -q`` stays a faithful pre-flight of the driver's
  own correctness gate and completes in single-digit minutes.
- SLOW (opt-in) lane, ``-m slow``: the full registry at sf0.01 plus
  EVERYTHING at sf0.1 — a query whose parity holds at one SF but
  breaks at 10× (sampling thresholds, rounding drift under different
  aggregation orders, window-frame edge counts) is caught there. The
  committed PARITY_r{N}.json artifacts (scripts/gen_parity, pinned to
  the registry by tests/test_artifact_freshness.py) keep full-grid
  evidence per round regardless of which lane ran.

Run the whole grid with ``pytest tests/test_oracle_parity.py -m ""``."""

from __future__ import annotations

import pytest

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE, SF_ORACLE_BIG
from tests.oracle import compare, duckdb_run

REGISTRY = load_all()
SQL_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)

# The driver's correctness window: the first 50 registry entries in
# iteration order (frozen by tests/test_registry_order.py).
DRIVER_WINDOW = frozenset(list(REGISTRY)[:50])


def _parity_params():
    for name in SQL_QUERIES:
        yield pytest.param(
            name,
            SF_ORACLE,
            id=f"{name}-sf0.01",
            marks=() if name in DRIVER_WINDOW else (pytest.mark.slow,),
        )
        yield pytest.param(
            name, SF_ORACLE_BIG, id=f"{name}-sf0.1", marks=pytest.mark.slow
        )


@pytest.mark.parametrize("name,sf_dir", list(_parity_params()))
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
