"""applyInPandasWithState custom operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE
from batchprocessor_spark.sources.catalog import load_table

REGISTRY = load_all()


def test_stream_stream_join_equals_batch_join(spark):
    """The watermarked stream-stream join over a fully-drained replay
    must equal the batch join with the same predicate."""
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in REGISTRY["q_stream_stream_join"].builder(spark, SF_ORACLE).collect()
    )
    e = load_table(spark, SF_ORACLE, "events")
    clicks = e.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    expected = sorted(
        (r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    )
    assert got == expected
    assert len(got) > 0


def test_custom_state_equals_batch_aggregate(spark):
    """After a full drain, the stateful per-user counters must equal
    the plain batch groupBy over the same data — in the same exact
    cents lane the state accumulates (streaming/stateful.py), so the
    doubles are bit-identical, not approximately close."""
    got = {
        (r.user_id): (r.event_count, r.value_sum)
        for r in REGISTRY["q_stream_custom_state"].builder(spark, SF_ORACLE).collect()
    }
    cents = F.sum(F.round(F.col("value") * 100).cast("long"))
    expected = {
        r.user_id: (r.cnt, r.vs)
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (cents / F.lit(100.0)).alias("vs"),
        )
        .collect()
    }
    assert len(got) == len(expected)
    mismatched = {
        k: (got[k], expected[k]) for k in expected if got.get(k) != expected[k]
    }
    assert not mismatched, dict(list(mismatched.items())[:5])
