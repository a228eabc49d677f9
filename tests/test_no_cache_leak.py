"""Engine-hygiene gate (VERDICT r2 item 3): query builders must not
pin plans in the session CacheManager. ``DataFrame.cache()`` entries
live until an explicit unpersist — executor memory leaks across a
long-lived Engine session running many queries — so the multi-consumer
intermediates use ``localCheckpoint`` instead, whose blocks the
ContextCleaner reclaims once the plan is garbage-collected."""

from __future__ import annotations

from batchprocessor_spark.plans.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()

# Every query that materializes a multi-consumer intermediate.
_CACHING_QUERIES = (
    "q_llm_dedup_minhash",
    "q_llm_dedup_minhash_banded",
    "q_llm_simsearch_neardup_lsh",
    "q_ml_kmeans",
)


def test_queries_leave_no_cached_plans(spark):
    spark.catalog.clearCache()
    for name in _CACHING_QUERIES:
        REGISTRY[name].builder(spark, SF_ORACLE).collect()
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
            f"{name} left a plan pinned in the CacheManager"
        )
