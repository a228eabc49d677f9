"""Skew-salted join and bucketed co-located join tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batchprocessor_spark.operators.skew import salted_join
from batchprocessor_spark.sources.bucketing import bucketed_join, save_bucketed


def test_salted_join_equals_plain_join(spark):
    """Salting must not change the result set — heavy-hitter key 0
    carries 5k of 6k rows."""
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k").select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("p"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    plain = big.join(small, "k", "left").select("k", "p", "d")
    salted = salted_join(big, small, "k", how="left").select("k", "p", "d")
    assert sorted(map(tuple, salted.collect(), )) == sorted(map(tuple, plain.collect()))


@pytest.fixture()
def warehouse(spark, tmp_path):
    # saveAsTable writes into the session warehouse; isolate per test.
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Identically-bucketed tables must sort-merge join with NO
    shuffle on either side — the co-located join that saves the
    dominant cost at 100 TB."""
    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "key"
    )
    lineitem = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "key"
    )
    save_bucketed(orders, "b_orders", "key", buckets=8)
    save_bucketed(lineitem.select("key", "l_quantity"), "b_lineitem", "key", buckets=8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # And it returns the same count as the plain join.
        plain = orders.join(lineitem.select("key", "l_quantity"), "key")
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
