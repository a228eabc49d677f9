"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are derived from the engine's query
registry (batchprocessor_spark/plans/registry.py) so the two surfaces
stay in sync by construction. See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batchprocessor_spark.plans.registry import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_agg_basic, TPC-H Q1-shaped pricing summary)
    on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q_agg_basic"].builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
