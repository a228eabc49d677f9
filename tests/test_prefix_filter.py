"""Prefix-filtered set-similarity join (q_llm_dedup_jaccard_prefix):
the prune must be LOSSLESS (candidates ⊇ all true pairs — the parity
test already pins output equality with the exact oracle) and must
actually PRUNE (strictly fewer candidates than the share-any-shingle
inverted index generates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.operators.dedup import (
    _JACCARD_THRESHOLD,
    _jaccard_pairs,
    prefix_filter_candidates,
    shingles,
)
from batchprocessor_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE


def test_prefix_candidates_lossless_and_pruning(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    cand = prefix_filter_candidates(docs)
    n_cand = cand.count()

    # Share-any-shingle candidate count (what the plain inverted index joins).
    sh = shingles(docs)
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    n_any = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .count()
    )
    assert n_cand < n_any, f"prefix filter did not prune: {n_cand} vs {n_any}"

    # Lossless: every true pair above threshold is a candidate.
    true_pairs = (
        _jaccard_pairs(docs)
        .where(F.col("jaccard") > _JACCARD_THRESHOLD)
        .select("d1", "d2")
    )
    missed = true_pairs.join(cand, ["d1", "d2"], "left_anti").count()
    assert missed == 0, f"{missed} true pairs missed by the prefix filter"
