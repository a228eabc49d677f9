"""Accuracy/recall checks for the approximate operators — the
companion assertions promised in their docstrings. These are the
checks a rows-only oracle can't do: sketch accuracy, LSH recall,
ANN recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batchprocessor_spark.plans.registry import load_all
from batchprocessor_spark.sources.catalog import load_table
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def test_approx_count_distinct_within_5pct(spark):
    rows = REGISTRY["q_agg_approx"].builder(spark, SF_ORACLE).collect()
    # The query itself now oracles derived columns (exact counts +
    # in-bounds flags); re-assert the flags and the percentile order.
    for r in rows:
        assert r.approx_ok and r.pct_ok, (r.l_returnflag, r.approx_ok, r.pct_ok)
        assert r.p50_price <= r.p95_price, (r.l_returnflag, r.p50_price, r.p95_price)
    # And pin the RAW HLL estimate within 5% of exact (the flag only
    # guarantees 6% = 2×rsd): recompute both directly.
    both = {
        r.l_returnflag: (r.est, r.d)
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.03).alias("est"),
            F.countDistinct("l_partkey").alias("d"),
        )
        .collect()
    }
    for flag, (est, exact) in both.items():
        assert abs(est - exact) / exact < 0.05, (flag, est, exact)


def test_approx_percentiles_within_1pct(spark):
    """q_agg_approx_pct's GK sketches vs exact per-group percentiles:
    at accuracy 10000 the relative error budget is 1%."""
    rows = {
        r.l_returnflag: r
        for r in REGISTRY["q_agg_approx_pct"].builder(spark, SF_ORACLE).collect()
    }
    from batchprocessor_spark.functions.exactmath import to_units

    exact = {
        r.l_returnflag: r
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .select(
            "l_returnflag",
            to_units(F.col("l_extendedprice"), 100).alias("cents"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.percentile("cents", F.lit(0.5)).alias("p50"),
            F.percentile("cents", F.lit(0.95)).alias("p95"),
            F.percentile("cents", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        e = exact[flag]
        # The query now self-reports the bound check (oracled ok
        # flags); independently re-derive the exact values here so the
        # flag logic itself is cross-checked.
        assert r.p50_ok and r.p95_ok and r.p99_ok, (flag, r)
        for est, true in (
            (r.p50_exact_c, e.p50),
            (r.p95_exact_c, e.p95),
            (r.p99_exact_c, e.p99),
        ):
            assert abs(est - true) / max(abs(true), 1) < 1e-4, (flag, est, true)


def test_simhash_separates_near_dups(spark):
    """Near-dup pairs (exact Jaccard > 0.5) must have dramatically
    smaller SimHash Hamming distance than the average random pair."""
    sim = {
        r.doc_id: r.simhash
        for r in REGISTRY["q_llm_dedup_simhash"].builder(spark, SF_ORACLE).collect()
    }
    pairs = [
        (r.d1, r.d2)
        for r in REGISTRY["q_llm_dedup_ngram_jaccard"].builder(spark, SF_ORACLE).collect()
    ]
    assert pairs, "expected known near-dup pairs in the fixture data"

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    dup_dists = [hamming(sim[a], sim[b]) for a, b in pairs]
    ids = sorted(sim)[:80]
    rand_dists = [
        hamming(sim[ids[i]], sim[ids[j]])
        for i in range(0, 60, 3)
        for j in range(i + 7, 70, 13)
    ]
    avg_dup = sum(dup_dists) / len(dup_dists)
    avg_rand = sum(rand_dists) / len(rand_dists)
    assert avg_dup < avg_rand / 2, (avg_dup, avg_rand)
    # Every true near-dup within a conservative Hamming radius.
    assert max(dup_dists) <= 16, dup_dists


def _topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_ivf_mechanism_and_recall(spark):
    """Probing ALL cells must reproduce brute force exactly (the IVF
    machinery invariant); nprobe=3 must beat the nprobe/k random-
    partition floor on this structure-free fixture data."""
    from batchprocessor_spark.operators.similarity import ivf_topk

    truth = _topk_sets(REGISTRY["q_llm_simsearch_topk"].builder(spark, SF_ORACLE).collect())
    full = _topk_sets(ivf_topk(spark, SF_ORACLE, nprobe=10).collect())
    assert full == truth, "nprobe=k must equal brute force"

    probed = _topk_sets(REGISTRY["q_llm_simsearch_ivf"].builder(spark, SF_ORACLE).collect())
    recalls = [len(truth[q] & probed.get(q, set())) / len(truth[q]) for q in truth]
    # Near-uniform embeddings: expected recall ≈ nprobe/k = 0.3.
    assert sum(recalls) / len(recalls) >= 0.2, recalls
