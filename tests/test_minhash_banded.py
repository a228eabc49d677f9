"""r=4 banded MinHash-LSH (q_llm_dedup_minhash_banded): the verified
output must EQUAL the r=1 query's (both share the exact-Jaccard
oracle, checked in test_oracle_parity), while the candidate pair
space must be strictly smaller — banding exists to prune buckets,
not just to pass.
"""

from __future__ import annotations

from batchprocessor_spark.operators.dedup import (
    _BAND_ROWS,
    _NUM_BANDS,
    _NUM_HASHES,
    minhash_candidates,
    shingle_sets,
)
from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_banded_prunes_candidates(spark):
    """r=4×20 banding must produce strictly fewer candidate pairs than
    r=1×16 on the fixture (same corpus, same verification), because a
    candidate now needs 4 simultaneous minhash agreements."""
    sets = shingle_sets(load_table(spark, SF_ORACLE, "documents")).cache()
    n_r1 = minhash_candidates(sets, 1, _NUM_HASHES).count()
    n_r4 = minhash_candidates(sets, _BAND_ROWS, _NUM_BANDS).count()
    sets.unpersist()
    assert n_r4 < n_r1, (n_r4, n_r1)
    # The true near-dup pairs (j≈0.98 in the fixture) must all survive.
    n_true = REGISTRY["q_llm_dedup_ngram_jaccard"].builder(spark, SF_ORACLE).count()
    assert n_r4 >= n_true, (n_r4, n_true)


def test_banded_equals_r1_output(spark):
    """Verified outputs are identical pair sets: banding changes the
    candidate funnel, never the answer (at the fixture's similarity
    profile)."""
    r1 = REGISTRY["q_llm_dedup_minhash"].builder(spark, SF_ORACLE)
    r4 = REGISTRY["q_llm_dedup_minhash_banded"].builder(spark, SF_ORACLE)
    sym_diff = r1.select("d1", "d2").exceptAll(r4.select("d1", "d2")).count() + r4.select(
        "d1", "d2"
    ).exceptAll(r1.select("d1", "d2")).count()
    assert sym_diff == 0


def test_banded_no_cartesian(spark):
    """The banded bucket join must stay an equi-join on (band, key)."""
    plan = (
        REGISTRY["q_llm_dedup_minhash_banded"]
        .builder(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
