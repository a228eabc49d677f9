"""Scan / projection / filter operators (SURVEY.md §2.2).

These are the base of the engine's relational surface. They are
expressed declaratively so Catalyst pushes predicates and prunes
columns into the parquet scan — at 100 TB the scan reads only the
referenced columns and row groups (`PushedFilters` / `ReadSchema`
visible in `.explain("formatted")`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
    category="scan",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan: reads exactly 4 of lineitem's 11 columns
    (column pruning reaches the parquet footer)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 30
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus IS NOT NULL
      AND (l_discount < 0.05 OR l_tax > 0.03)
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    """,
    category="scan",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (AND/OR/IN/BETWEEN/IS NOT NULL + timestamp
    comparison); the conjunctive parts push down to the parquet reader."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").isNotNull()
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") > 0.03))
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
