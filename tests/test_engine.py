"""Engine facade + format IO tests."""

from __future__ import annotations

import os

import pytest

from batchprocessor_spark.engine import Engine
from batchprocessor_spark.sources import io
from tests.conftest import SF_SMALL


@pytest.fixture()
def engine(spark):
    return Engine(spark=spark, sf_dir=SF_SMALL)


def test_table_and_sql(engine):
    assert engine.table("region").count() == 5
    row = engine.sql(
        "SELECT count(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0]
    assert row.n > 0


def test_query_and_explain(engine):
    df = engine.query("q_agg_basic")
    assert df.count() > 0
    plan = engine.explain("q_join_inner_broadcast")
    assert "BroadcastHashJoin" in plan


def test_io_roundtrip(engine, spark, tmp_path):
    df = engine.table("nation")
    for fmt in ("parquet", "csv", "json", "orc"):
        path = os.path.join(str(tmp_path), fmt)
        io.write(df, path, fmt)
        back = io.read(
            spark,
            path,
            fmt,
            schema=df.schema if fmt in ("csv", "json") else None,
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_requires_schema(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        io.read(spark, "/nonexistent", "csv")


def test_partitioned_write_prunes(engine, spark, tmp_path):
    """Partitioned layout must enable partition pruning downstream."""
    path = str(tmp_path / "orders_by_status")
    io.write(engine.table("orders"), path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).where("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split("PartitionFilters:")[1].splitlines()[0]
