"""Set operators (SURVEY.md §2.2): UNION ALL / UNION / INTERSECT /
EXCEPT, plus the ALL variants where both engines agree on semantics.

Scale: UNION ALL is a zero-shuffle concatenation; the distinct
variants are one hash-aggregate shuffle on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import register
from batchprocessor_spark.sources.catalog import load_table


def _cust_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))


def _order_cust_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))


@register(
    "q_set_union_all",
    oracle="""
    SELECT c_custkey AS key FROM customer
    UNION ALL
    SELECT o_custkey AS key FROM orders
    """,
    category="setop",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup, no shuffle)."""
    return _cust_keys(spark, sf_dir).unionAll(_order_cust_keys(spark, sf_dir))


@register(
    "q_set_union",
    oracle="""
    SELECT c_custkey AS key FROM customer
    UNION
    SELECT o_custkey AS key FROM orders
    """,
    category="setop",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (distinct)."""
    return _cust_keys(spark, sf_dir).union(_order_cust_keys(spark, sf_dir)).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_custkey AS key FROM customer
    INTERSECT
    SELECT o_custkey AS key FROM orders
    """,
    category="setop",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (customers that placed orders)."""
    return _cust_keys(spark, sf_dir).intersect(_order_cust_keys(spark, sf_dir))


@register(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders
    """,
    category="setop",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (customers with no orders)."""
    return _cust_keys(spark, sf_dir).subtract(_order_cust_keys(spark, sf_dir))
