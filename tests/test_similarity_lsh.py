"""Mechanism pins for q_llm_simsearch_neardup_lsh: perfect recall vs
the brute-force baseline on the fixture (which justifies the exact
SQL oracle), real candidate pruning, and a bucket-join plan — never a
cross product."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.operators.similarity import (
    as_double,
    l2_norm,
    lsh_candidate_pairs,
)
from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.sources.catalog import load_table, spread
from tests.conftest import SF_ORACLE, SF_SMALL

REGISTRY = load_all()


def _pairs(spark, name, sf_dir):
    return {
        (r.v1, r.v2): r.sim
        for r in REGISTRY[name].builder(spark, sf_dir).collect()
    }


def test_lsh_equals_brute_force(spark):
    """Verified-LSH output must equal the exact baseline pair-for-pair
    (this is the claim behind giving it the exact all-pairs oracle).
    sf0.01 holds the fixture's one borderline pair at sim=0.513."""
    for sf in (SF_SMALL, SF_ORACLE):
        brute = _pairs(spark, "q_llm_simsearch_neardup", sf)
        lsh = _pairs(spark, "q_llm_simsearch_neardup_lsh", sf)
        assert brute == lsh, (
            f"{sf}: missed={set(brute) - set(lsh)} extra={set(lsh) - set(brute)}"
        )


def test_lsh_candidates_prune_pair_space(spark):
    emb = spread(
        load_table(spark, SF_ORACLE, "embeddings").select(
            "vec_id", as_double("embedding").alias("v")
        )
    ).withColumn("nrm", l2_norm(F.col("v")))
    n = emb.count()
    ncand = lsh_candidate_pairs(emb).count()
    # Structure-free data at a 0.5 threshold is LSH's worst case; the
    # 480×13 banding must still keep the candidate space under 10% of
    # all pairs (measured ≈ 0.084·n²/2 with the pinned seed), so the
    # verify stage costs ~1/12th of brute force.
    assert ncand < 0.10 * n * (n - 1) / 2, (ncand, n)


def test_lsh_pairgen_is_bucket_groupby(spark):
    """Candidate generation must group rows by (band, key) bucket —
    ONE shuffle, never a data×data product — and signatures must come
    from the Arrow-batched numpy map (closure-carried planes), not a
    planes join (see skew.capped_bucket_pairs for why the bucket
    groupBy replaced the two-sided bucket self-join)."""
    df = REGISTRY["q_llm_simsearch_neardup_lsh"].builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    import re

    assert re.search(r"HashAggregate\(keys=\[band", plan), plan
    assert "MapInPandas" in plan, plan
