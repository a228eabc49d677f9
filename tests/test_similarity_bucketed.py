"""Mechanism pin for q_llm_simsearch_neardup_bucketed: within-bucket
pairs are EXACT (identical to the global all-pairs computation
restricted to same-label pairs), and the only loss vs the global
baseline is cross-bucket pairs — quantified here as recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.operators.similarity import (
    _BUCKET_THRESHOLD,
    as_double,
    cosine_prenorm,
    l2_norm,
    q_llm_simsearch_neardup_bucketed,
)
from batchprocessor_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def _global_pairs(spark, sf_dir, threshold):
    """All-pairs cosine above threshold, carrying both labels."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("label").alias("l1"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("label").alias("l2"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim = cosine_prenorm(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("v1") < F.col("v2"))
        .select("v1", "v2", "l1", "l2", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") > threshold)
    )


def test_bucketed_exact_within_bucket_and_recall(spark):
    global_pairs = {
        (r.v1, r.v2): (r.l1, r.l2, r.sim)
        for r in _global_pairs(spark, SF_SMALL, _BUCKET_THRESHOLD).collect()
    }
    bucketed = {
        (r.v1, r.v2): (r.label, r.sim)
        for r in q_llm_simsearch_neardup_bucketed(spark, SF_SMALL).collect()
    }

    # 1) No false positives, and sims are bitwise-identical: every
    #    bucketed pair appears globally with the same score.
    for pair, (label, sim) in bucketed.items():
        assert pair in global_pairs, f"bucketed-only pair {pair}"
        l1, l2, gsim = global_pairs[pair]
        assert l1 == l2 == label
        assert gsim == sim, f"{pair}: bucketed sim {sim} != global {gsim}"

    # 2) Exactness within buckets: every same-label global pair is found.
    same_label = {p for p, (l1, l2, _) in global_pairs.items() if l1 == l2}
    assert same_label == set(bucketed), (
        f"missed within-bucket pairs: {same_label - set(bucketed)}"
    )

    # 3) Recall vs the global baseline is exactly the same-label share —
    #    the designed trade-off. The fixture's labels are random wrt
    #    similarity, so recall ≈ 1/#labels; pin that it is non-trivial
    #    and that the accounting closes.
    assert global_pairs, "threshold too high: no global pairs to measure recall on"
    recall = len(bucketed) / len(global_pairs)
    assert recall == len(same_label) / len(global_pairs)
    assert recall > 0
