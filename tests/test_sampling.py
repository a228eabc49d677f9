"""Sampling-operator guarantees beyond oracle parity: split
assignments are a pure function of the key (stable across scale
factors — the train/test-hygiene property), sampling is plan-level
shuffle-free, and the per-group sampler gets the group-limit plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.operators.sampling import hash_bucket
from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE, SF_SMALL

REGISTRY = load_all()


def _splits(spark, sf_dir):
    from batchprocessor_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split:", 100)
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return {r.doc_id: r.split for r in d.select("doc_id", split.alias("split")).collect()}


def test_split_assignment_stable_across_growth(spark):
    """A doc keeps its split when the corpus grows 10× — hash-gating's
    core guarantee (random sampling breaks this)."""
    small, big = _splits(spark, SF_SMALL), _splits(spark, SF_ORACLE)
    shared = set(small) & set(big)
    assert shared, "fixtures should overlap in doc_id space"
    assert all(small[d] == big[d] for d in shared)


def test_split_proportions_roughly_80_10_10(spark):
    big = _splits(spark, SF_ORACLE)
    n = len(big)
    train = sum(1 for s in big.values() if s == "train") / n
    val = sum(1 for s in big.values() if s == "val") / n
    assert 0.70 <= train <= 0.90, train
    assert 0.04 <= val <= 0.16, val


def test_stratified_sample_is_shuffle_free(spark):
    df = REGISTRY["q_sample_stratified"].builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_reservoir_uses_window_group_limit(spark):
    df = REGISTRY["q_sample_reservoir_pergroup"].builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_pack_sequences_single_exchange(spark):
    """The two-phase prefix sum materializes the range partition ONCE
    (pinned via localCheckpoint so both phases see identical partition
    assignment); the downstream plan must then add ZERO further
    exchanges — mapInPandas consumes the pinned partitions as-is. A
    Window over the partition id would add a hash Exchange — the
    regression this pins."""
    df = REGISTRY["q_llm_pack_sequences"].builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert "Scan ExistingRDD" in plan, plan  # the pinned checkpoint
    assert "MapInPandas" in plan, plan
    assert "Window" not in plan, plan


def test_pack_sequences_partition_count_invariant(spark):
    """The packing result is a pure function of the data: running the
    two-phase prefix sum with different partition counts (different
    cluster sizes) must produce identical bins — the property that
    makes the op safe to re-run on any cluster."""
    from batchprocessor_spark.operators.sampling import pack_by_cumsum
    from batchprocessor_spark.sources.catalog import load_table

    d = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "n_chars",
        hash_bucket(F.col("doc_id"), "pack:", 1000000).alias("rk"),
    )
    results = [
        {(r.doc_id): (r.bin, r.crosses) for r in pack_by_cumsum(d, n).collect()}
        for n in (2, 3, 8)
    ]
    assert results[0] == results[1] == results[2]
