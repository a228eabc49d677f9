"""engine.sql() lifecycle proof for the SURVEY §2.2 contract set
(VERDICT r4 #8): every contract query's Spark-SQL twin, run through a
real ``spark.sql()`` over the registered catalog views, must be
value-identical to the DataFrame builder's result — same check the
oracle parity lane applies, but with Spark's OWN SQL front-end as the
second engine instead of DuckDB."""

from __future__ import annotations

import pytest

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.plans.sql_twins import spark_sql_for
from batchprocessor_spark.sources.catalog import register_views
from tests.conftest import SF_ORACLE
from tests.oracle import compare
from tests.test_registry_order import SEC_2_2

REGISTRY = load_all()


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_ORACLE)
    return spark


@pytest.mark.parametrize("name", sorted(SEC_2_2))
def test_sql_twin_matches_builder(views, name):
    spark = views
    twin_pdf = spark.sql(spark_sql_for(name)).toPandas()
    builder_df = REGISTRY[name].builder(spark, SF_ORACLE)
    compare(builder_df, twin_pdf, f"{name} (sql twin)")


@pytest.mark.parametrize("name", sorted(__import__(
    "batchprocessor_spark.plans.sql_twins", fromlist=["EXTENDED_TWIN_NAMES"]
).EXTENDED_TWIN_NAMES))
def test_extended_twin_matches_builder(views, name):
    """The extended analytics twins (VERDICT r7 #6: funnels, rolling
    WAU, cohort LTV/retention, sessionization, stickiness, snapshot
    diff, A/B stats) run through a real spark.sql() and must be
    value-identical to the DataFrame builders."""
    spark = views
    twin_pdf = spark.sql(spark_sql_for(name)).toPandas()
    builder_df = REGISTRY[name].builder(spark, SF_ORACLE)
    compare(builder_df, twin_pdf, f"{name} (extended sql twin)")


def test_verified_set_matches_contract():
    from batchprocessor_spark.plans.sql_twins import (
        EXTENDED_TWIN_NAMES,
        SPARK_SQL_TWINS,
        VERIFIED_TWINS,
        _extended_twins,
    )

    assert VERIFIED_TWINS == SEC_2_2
    assert set(SPARK_SQL_TWINS) <= VERIFIED_TWINS
    assert set(_extended_twins()) == EXTENDED_TWIN_NAMES
    assert EXTENDED_TWIN_NAMES <= set(REGISTRY)
    assert not (EXTENDED_TWIN_NAMES & VERIFIED_TWINS)


def test_unverified_name_raises():
    """Names whose SQL is neither hand-verified nor measured
    value-identical (TWINS.json) must raise, not return unvalidated
    DuckDB-dialect text (runtime trap). Pick the probe name from the
    artifact so the pin tracks the measurement instead of hardcoding
    a query the dialect map may later learn to serve."""
    import json
    from pathlib import Path

    twins = json.loads(
        (Path(__file__).resolve().parent.parent / "TWINS.json").read_text()
    )
    from batchprocessor_spark.plans import sql_twins as tw

    curated = (
        set(tw.SPARK_SQL_TWINS) | set(tw.EXTENDED_TWIN_NAMES) | tw.VERIFIED_TWINS
    )
    unserved = sorted(
        n
        for n, rec in twins["queries"].items()
        if rec["status"] != "pass" and n not in curated
    )
    assert unserved, "every query measured pass — retire this pin"
    with pytest.raises(KeyError, match="no verified Spark-SQL twin"):
        spark_sql_for(unserved[0])
