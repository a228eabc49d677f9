"""Z-order layout guarantees (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_zorder_buckets_bound_both_dimensions(spark):
    """zbucket = zkey >> 16 pins bits 8..15 of BOTH interleaved
    dimensions, so inside any bucket each dimension can vary only in
    its low 8 bits: span <= 255 — for every bucket, by construction,
    not on average. This is the two-sided locality a single-column
    sort cannot give and the reason a z-laid-out table prunes on
    either filter column."""
    rows = REGISTRY["q_layout_zorder"].builder(spark, SF_ORACLE).collect()
    assert rows, "zorder report should be non-empty"
    for r in rows:
        assert r.cust_hi - r.cust_lo <= 255, r
        assert r.day_hi - r.day_lo <= 255, r


def test_zorder_key_is_bijective_interleave(spark):
    """Distinct (custkey, day) pairs must map to distinct z-keys
    (Morton interleave is a bijection on 16-bit pairs)."""
    from batchprocessor_spark.operators.layout import zorder_key
    from batchprocessor_spark.sources.catalog import load_table

    t = load_table(spark, SF_ORACLE, "orders").select(
        F.col("o_custkey").cast("int").alias("a"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("int")
        .alias("b"),
    )
    keyed = t.distinct().withColumn("z", zorder_key(F.col("a"), F.col("b")))
    n_pairs = keyed.count()
    n_keys = keyed.select("z").distinct().count()
    assert n_pairs == n_keys
